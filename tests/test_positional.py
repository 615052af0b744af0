"""Positional-encoder tests: exact sin/cos values and valid-row masking,
mirroring reference tests/test_gcm.py:14-86."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.models.positional import (
    PositionalEncoding,
    RelativePositionalEncoding,
    sincos_table,
)


class TestSinCosTable:
    def test_row_zero(self):
        pe = np.array(sincos_table(10, 5))
        assert np.allclose(pe[0, 0::2], 0.0, atol=1e-6)  # sin(0)
        assert np.allclose(pe[0, 1::2], 1.0, atol=1e-6)  # cos(0)

    def test_row_one_exact(self):
        """Pinned values from tests/test_gcm.py:76-86 (feats=5 → d_model=6)."""
        pe = np.array(sincos_table(10, 5))
        want = [
            math.sin((1 / 10000) ** (0 / 6)),
            math.cos((1 / 10000) ** (0 / 6)),
            math.sin((1 / 10000) ** (2 / 6)),
            math.cos((1 / 10000) ** (2 / 6)),
            math.sin((1 / 10000) ** (4 / 6)),
        ]
        assert np.allclose(pe[1, :5], want, atol=1e-4)


class TestPositionalEncodingAdd:
    def setup_method(self):
        self.B, self.N, self.F = 2, 10, 5
        self.pe = PositionalEncoding(max_len=self.N, mode="add",
                                     feat_dim=self.F)
        self.params = self.pe.init(jax.random.PRNGKey(0))
        self.nodes = jnp.zeros((self.B, self.N, self.F))

    def test_masks_future_rows(self):
        """Rows beyond num_nodes (inclusive boundary) stay untouched."""
        num_nodes = jnp.array([0, 7], jnp.int32)
        enc = np.array(self.pe(self.params, self.nodes, num_nodes))
        assert np.allclose(enc[0, 1, :], 0.0)  # beyond num_nodes[0]=0
        assert not np.allclose(enc[0, 0, :], 0.0)  # row 0 encoded
        assert not np.allclose(enc[1, 7, :], 0.0)  # inclusive boundary
        assert np.allclose(enc[1, 8, :], 0.0)

    def test_add_values(self):
        num_nodes = jnp.array([1, 8], jnp.int32)
        enc = np.array(self.pe(self.params, self.nodes, num_nodes))
        want = [
            math.sin((1 / 10000) ** (0 / 6)),
            math.cos((1 / 10000) ** (0 / 6)),
            math.sin((1 / 10000) ** (2 / 6)),
            math.cos((1 / 10000) ** (2 / 6)),
            math.sin((1 / 10000) ** (4 / 6)),
        ]
        assert np.allclose(enc[0, 1], want, atol=1e-4)


class TestPositionalEncodingCat:
    def test_cat_layout(self):
        B, N, F, cat = 1, 6, 8, 4
        pe = PositionalEncoding(max_len=N, mode="cat", cat_dim=cat, feat_dim=F)
        params = pe.init(jax.random.PRNGKey(0))
        nodes = jnp.ones((B, N, F))
        enc = np.array(pe(params, nodes, jnp.array([2], jnp.int32)))
        table = np.array(params["pe"])
        # valid rows: first cat dims are the PE table
        for i in range(3):
            assert np.allclose(enc[0, i, :cat], table[i, :cat], atol=1e-6)
        # invalid rows untouched
        assert np.allclose(enc[0, 3], 1.0)


class TestRelativePE:
    def test_current_node_gets_position_zero(self):
        B, N, F = 1, 6, 4
        rpe = RelativePositionalEncoding(max_len=100, feat_dim=F)
        params = rpe.init(jax.random.PRNGKey(0))
        nodes = jnp.zeros((B, N, F))
        num_nodes = jnp.array([3], jnp.int32)
        enc = np.array(rpe(params, nodes, num_nodes))
        table = np.array(params["pe"])
        # reference rolls so row `center` holds pe[0] (gcm.py:82-89)
        assert np.allclose(enc[0, 3], table[0, :F], atol=1e-6)
        assert np.allclose(enc[0, 4], 0.0)  # beyond center untouched
