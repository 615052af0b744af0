"""Distributional invariants for the stochastic edge paths (VERDICT r2
missing #4).

The reference pins stochastic selector behavior only at the degenerate
±1e15-logit points (tests/test_sparse_gcm.py:794-819, reproduced here by
test_ste.py::test_extreme_logits_deterministic); these tests pin the
FINITE-logit behavior:

- hard-gumbel sample frequencies match the softmax probabilities within a
  multiple-sigma CI over ~10^4 keys (the gumbel-max property the sampler's
  correctness rests on),
- tempered-softmax entropy is strictly monotone in temperature (tau down =>
  kept-edge distribution sharpens),
- the learned selector's cutoff keeps at most num_edge_samples entries per
  sink at ANY finite logits (the structural bound slot_k derivation uses),
- learned TemporalBackedge edge counts scale with num_samples exactly as
  k draws-with-replacement predict (reference temporal.py:51-70 semantics:
  num_samples gumbel draws OR-ed together).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.utils.ste import (
    masked_gumbel_softmax,
    masked_softmax,
    masked_tempered_softmax,
)


class TestGumbelFrequencies:
    def test_hard_gumbel_matches_softmax_probs(self):
        """argmax(logits + gumbel) ~ Categorical(softmax(logits)): over 10^4
        keys the empirical pick frequencies sit within 5 sigma of softmax."""
        logits = jnp.array([1.0, 0.0, -1.0])
        mask = jnp.ones((3,), bool)
        n = 10_000
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        picks = jax.vmap(
            lambda k: masked_gumbel_softmax(k, logits, mask, hard=True))(keys)
        freq = np.array(picks.mean(axis=0))
        want = np.array(jax.nn.softmax(logits))
        sigma = np.sqrt(want * (1 - want) / n)
        assert (np.abs(freq - want) < 5 * sigma + 1e-3).all(), (freq, want)

    def test_hard_gumbel_never_picks_masked(self):
        logits = jnp.array([0.0, 10.0, 0.0])  # the dominant entry is masked
        mask = jnp.array([True, False, True])
        n = 4_000
        keys = jax.random.split(jax.random.PRNGKey(1), n)
        picks = jax.vmap(
            lambda k: masked_gumbel_softmax(k, logits, mask, hard=True))(keys)
        freq = np.array(picks.mean(axis=0))
        assert freq[1] == 0.0
        # remaining mass splits ~50/50 between the two valid entries
        assert abs(freq[0] - 0.5) < 0.03 and abs(freq[2] - 0.5) < 0.03

    def test_temperature_does_not_change_hard_law(self):
        """argmax((logits+g)/tau) is tau-invariant — the hard sample law is
        softmax(logits) at EVERY temperature (only the soft values change)."""
        logits = jnp.array([0.5, -0.5, 0.0, 1.5])
        mask = jnp.ones((4,), bool)
        n = 8_000
        keys = jax.random.split(jax.random.PRNGKey(2), n)
        freqs = []
        for tau in (0.25, 4.0):
            picks = jax.vmap(lambda k: masked_gumbel_softmax(
                k, logits, mask, tau=tau, hard=True))(keys)
            freqs.append(np.array(picks.mean(axis=0)))
        want = np.array(jax.nn.softmax(logits))
        for f in freqs:
            assert (np.abs(f - want) < 0.03).all(), (f, want)


def entropy(p, eps=1e-12):
    p = np.asarray(p, np.float64)
    p = p[p > eps]
    return float(-(p * np.log(p)).sum())


class TestTemperatureMonotonicity:
    def test_tempered_softmax_entropy_monotone_in_tau(self):
        """Lower temperature => sharper kept-edge distribution: entropy of
        the tempered softmax is strictly increasing in tau."""
        logits = jax.random.normal(jax.random.PRNGKey(0), (12,))
        mask = jnp.arange(12) < 9  # a few masked-out candidates
        hs = [entropy(masked_tempered_softmax(logits, mask, tau=t))
              for t in (0.2, 0.5, 1.0, 2.0, 5.0)]
        assert all(a < b for a, b in zip(hs, hs[1:])), hs

    def test_gumbel_soft_mean_entropy_monotone_in_tau(self):
        """Same monotonicity for the stochastic path, in expectation over
        keys: mean per-sample entropy of the soft gumbel output rises with
        tau."""
        logits = jax.random.normal(jax.random.PRNGKey(1), (8,))
        mask = jnp.ones((8,), bool)
        keys = jax.random.split(jax.random.PRNGKey(2), 512)

        def mean_entropy(tau):
            soft = jax.vmap(lambda k: masked_gumbel_softmax(
                k, logits, mask, tau=tau))(keys)
            p = np.asarray(soft, np.float64)
            return float(-(np.where(p > 1e-12, p * np.log(p), 0.0)
                           ).sum(axis=1).mean())

        hs = [mean_entropy(t) for t in (0.3, 1.0, 3.0)]
        assert hs[0] < hs[1] < hs[2], hs


class TestLearnedSelectorBounds:
    def test_cutoff_bounds_kept_edges_per_sink(self):
        """soft > 1/(1+S) can hold for at most S entries of a distribution
        summing to 1 — the structural per-sink bound that slot_k derivation
        relies on (rl/wrappers._derive_slot_k), at ANY finite logits."""
        from gcm_tpu.edges.sparse_learned import LearnedEdge

        F, B, N, t, S = 4, 3, 16, 4, 3
        sel = LearnedEdge(input_size=F, num_edge_samples=S)
        params = sel.init(jax.random.PRNGKey(0))
        nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F)) * 3.0
        T = jnp.array([5, 8, 11], jnp.int32)
        taus = jnp.full((B,), t, jnp.int32)
        for seed in range(5):
            grid, _ = sel(params, nodes, T, taus, t,
                          key=jax.random.PRNGKey(10 + seed))
            per_sink = np.array((grid > 0).sum(axis=2))  # [B, t]
            assert (per_sink <= S).all(), per_sink.max()

    def test_deterministic_kept_count_rises_as_tau_drops(self):
        """At high tau the tempered softmax flattens toward uniform over
        n_cand >> S candidates and NOTHING clears the 1/(1+S) cutoff; at low
        tau the winners concentrate and clear it. Pins the direction the
        learnable temperature steers edge density."""
        from gcm_tpu.edges.sparse_learned import LearnedEdge

        F, B, N, t = 4, 2, 24, 4

        def kept(tau):
            sel = LearnedEdge(input_size=F, deterministic=True,
                              num_edge_samples=2, softmax_temp=tau,
                              learn_softmax_temp=False)
            params = sel.init(jax.random.PRNGKey(0))
            nodes = jax.random.normal(jax.random.PRNGKey(1), (B, N, F)) * 2.0
            T = jnp.array([16, 20], jnp.int32)
            taus = jnp.full((B,), t, jnp.int32)
            grid, _ = sel(params, nodes, T, taus, t)
            return int(np.array((grid > 0).sum()))

        assert kept(0.05) > kept(50.0)
        assert kept(50.0) == 0  # uniform over >3 candidates is under cutoff


class TestLearnedTemporalSampling:
    def _mean_edges(self, num_samples, W=10, n_keys=800):
        """Mean number of window slots the learned TemporalBackedge selects
        with uniform logits (reference temporal.py:51-70: num_samples hard
        gumbel draws OR-ed via diff_or)."""
        from gcm_tpu.edges.temporal import TemporalBackedge

        sel = TemporalBackedge(learned=True, learning_window=W,
                               num_samples=num_samples)
        params = sel.init(jax.random.PRNGKey(0))
        B, N = 4, 16
        adj = jnp.zeros((B, N, N))
        num_nodes = jnp.full((B,), W, jnp.int32)

        def count(key):
            a, _ = sel(params, None, adj, jnp.zeros((0,)), num_nodes, key=key)
            return (a > 0).sum()

        keys = jax.random.split(jax.random.PRNGKey(3), n_keys)
        total = np.array(jax.vmap(count)(keys)).mean()
        return total / B

    def test_num_samples_scaling_matches_replacement_law(self):
        """k uniform draws with replacement over W slots select
        W(1-(1-1/W)^k) distinct slots in expectation — the exact law of the
        OR-of-gumbel-samples construction; and the count is monotone in k."""
        W = 10
        got1 = self._mean_edges(1, W)
        got5 = self._mean_edges(5, W)
        want1 = W * (1 - (1 - 1 / W) ** 1)  # = 1.0
        want5 = W * (1 - (1 - 1 / W) ** 5)  # ~ 4.095
        assert abs(got1 - want1) < 0.05, got1
        assert abs(got5 - want5) < 0.2, got5
        assert got5 > got1
