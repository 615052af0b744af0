"""Native host trajectory store tests (C++ via ctypes)."""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from gcm_tpu.data.host_buffer import HostReplayBuffer, pack_edges_host


class TestReplayBuffer:
    def test_append_and_counts(self):
        rb = HostReplayBuffer(capacity_steps=100, obs_dim=3)
        for t in (4, 6):
            rb.append(np.ones((t, 3)), np.zeros(t, np.int32), np.ones(t))
        assert rb.num_episodes == 2
        assert rb.total_steps == 10

    def test_eviction_at_capacity(self):
        rb = HostReplayBuffer(capacity_steps=10, obs_dim=2)
        for _ in range(5):
            rb.append(np.ones((4, 2)), np.zeros(4, np.int32), np.ones(4))
        assert rb.total_steps <= 10 + 4  # at most one episode over
        assert rb.num_episodes <= 3

    def test_sample_padded_batch(self):
        rb = HostReplayBuffer(capacity_steps=1000, obs_dim=2)
        rb.append(np.full((3, 2), 1.0), np.full(3, 1, np.int32),
                  np.full(3, 0.5))
        rb.append(np.full((7, 2), 2.0), np.full(7, 2, np.int32),
                  np.full(7, 0.25))
        obs, acts, rews, taus = rb.sample(B=8, T_max=5, seed=42)
        assert obs.shape == (8, 5, 2) and taus.shape == (8,)
        for b in range(8):
            tau = taus[b]
            assert tau in (3, 5)  # episode 1 full, episode 2 truncated to 5
            val = obs[b, 0, 0]
            assert val in (1.0, 2.0)
            # padding beyond tau is zero
            assert np.all(obs[b, tau:] == 0)
            assert np.all(rews[b, tau:] == 0)
            # valid region consistent
            assert np.all(obs[b, :tau, 0] == val)

    def test_sample_deterministic_per_seed(self):
        rb = HostReplayBuffer(capacity_steps=100, obs_dim=1)
        for i in range(5):
            rb.append(np.full((2, 1), float(i)), np.zeros(2, np.int32),
                      np.zeros(2))
        a = rb.sample(4, 3, seed=7)
        b = rb.sample(4, 3, seed=7)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)
        c = rb.sample(4, 3, seed=8)
        assert not all(np.array_equal(x, y) for x, y in zip(a, c))

    def test_empty_sample_is_zeros(self):
        rb = HostReplayBuffer(capacity_steps=10, obs_dim=2)
        obs, acts, rews, taus = rb.sample(2, 4)
        assert np.all(obs == 0) and np.all(taus == 0)


class TestPackEdges:
    def test_pack(self):
        sinks = np.array([1, 2, 5], np.int64)
        sources = np.array([0, 1, 4], np.int64)
        lengths = np.array([2, 1], np.int64)
        out, overflow = pack_edges_host(sinks, sources, lengths, max_edges=4)
        assert overflow == 0
        assert out[0, 0].tolist() == [1, 2, -1, -1]
        assert out[0, 1].tolist() == [0, 1, -1, -1]
        assert out[1, 0].tolist() == [5, -1, -1, -1]

    def test_overflow_truncates(self):
        sinks = np.arange(5, dtype=np.int64)
        sources = np.arange(5, dtype=np.int64)
        lengths = np.array([5], np.int64)
        out, overflow = pack_edges_host(sinks, sources, lengths, max_edges=3)
        assert overflow == 1
        assert out[0, 0].tolist() == [0, 1, 2]
