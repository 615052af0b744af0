"""utils/roofline.py must reproduce BASELINE.md's hand-derived floors —
the calculators are the executable form of that arithmetic, so drift
between them and the doc is a bug in one or the other."""

from gcm_tpu.utils import roofline


class TestRooflineMatchesBaselineDoc:
    def test_spmm_floor(self):
        # BASELINE.md:96-98: B=64 N=512 E=8192 F=128 f32 -> ~46 MB,
        # 2.7e8 useful FLOP/batch-el... HBM-bound at ~56 us = 9.4e9 edges/s
        # (the doc's 46 MB assumed int64 edge indices; the calculator uses
        # the actual on-device dtypes — f32/int32 — hence ~40 MB)
        r = roofline.spmm(B=64, N=512, E=8192, F=128)
        assert r["bound"] == "hbm"
        assert 35e6 < r["hbm_bytes"] < 52e6
        assert 45e-6 < r["floor_s"] < 65e-6
        assert 8e9 < r["edges_per_s"] < 12e9

    def test_dense_scan_floor(self):
        # BASELINE.md:153-156: B=32 N=128 F=32 -> ~2.3 MB/step, ~2.9 us
        # HBM floor, ~11M timesteps/s
        r = roofline.dense_scan_step(B=32, N=128, F=32)
        assert r["bound"] == "hbm"
        assert 2.0e6 < r["hbm_bytes"] < 3.0e6
        assert 8e6 < r["timesteps_per_s"] < 13e6

    def test_banded_scan_floor(self):
        # BASELINE.md:157-159: node traffic only -> ~0.6 us/step,
        # ~55M timesteps/s
        r = roofline.banded_scan_step(B=32, N=128, F=32)
        assert r["bound"] == "hbm"
        assert 40e6 < r["timesteps_per_s"] < 65e6

    def test_nav_floor_and_incremental_ratio(self):
        # BASELINE.md nav section: ~2.1 MB, floor ~24M timesteps/s at
        # B=8 tau=8 V=128 F=16; incremental removes ~V/tau = 16x of the
        # adjacency work
        full = roofline.nav_window(B=8, V=128, tau=8, F=16)
        inc = roofline.nav_incremental_window(B=8, V=128, tau=8, F=16)
        assert full["bound"] == "hbm"
        assert 1.6e6 < full["hbm_bytes"] < 2.6e6
        assert 18e6 < full["timesteps_per_s"] < 32e6
        # incremental's floor should be several-x higher (approaching
        # the V/tau=16 factor on the adjacency term)
        ratio = inc["timesteps_per_s"] / full["timesteps_per_s"]
        assert 4 < ratio < 20

    def test_every_floor_is_bandwidth_bound(self):
        # the doc's recurring point: none of these workloads can be
        # MXU-bound at practical shapes — MFU is the wrong lens
        for r in [
            roofline.spmm(B=64, N=512, E=8192, F=128),
            roofline.dense_scan_step(B=32, N=128, F=32),
            roofline.banded_scan_step(B=32, N=512, F=64, hops=2),
            roofline.nav_window(B=8, V=128, tau=8, F=16),
        ]:
            assert r["bound"] == "hbm"
            assert r["flop_floor_s"] < r["hbm_floor_s"]
