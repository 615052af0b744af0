"""Straight-through / sparse-softmax machinery tests.

Mirrors the reference's STE and Spardmax behavior (src/gcm/util.py:9-56) plus
numpy oracles for sparsemax (which the reference takes from the pip
`sparsemax` package)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.utils.ste import (
    diff_or,
    grad_preserving_ones,
    gumbel_softmax,
    hardmax,
    masked_gumbel_softmax,
    masked_softmax,
    masked_tempered_softmax,
    sparsemax,
    spardmax,
    ste,
)


def numpy_sparsemax(z):
    """Oracle: Martins & Astudillo (2016) Alg. 1, per-row."""
    z = np.asarray(z, np.float64)
    out = np.zeros_like(z)
    for i, row in enumerate(z):
        srt = np.sort(row)[::-1]
        cs = np.cumsum(srt)
        k = np.arange(1, len(row) + 1)
        support = 1 + k * srt > cs
        k_z = k[support][-1]
        tau = (cs[support][-1] - 1) / k_z
        out[i] = np.maximum(row - tau, 0)
    return out


class TestSTE:
    def test_forward(self):
        x = jnp.array([-1.0, 0.0, 0.5, 2.0])
        assert (ste(x) == jnp.array([0.0, 0.0, 1.0, 1.0])).all()

    def test_backward_identity(self):
        g = jax.grad(lambda x: jnp.sum(ste(x) * jnp.arange(4.0)))(
            jnp.array([-1.0, 0.0, 0.5, 2.0])
        )
        assert np.allclose(g, np.arange(4.0))


class TestSparsemax:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        z = rng.normal(size=(16, 9)).astype(np.float32)
        got = np.array(sparsemax(jnp.asarray(z)))
        want = numpy_sparsemax(z)
        assert np.allclose(got, want, atol=1e-5)

    def test_rows_sum_to_one(self):
        z = jax.random.normal(jax.random.PRNGKey(1), (8, 13))
        p = sparsemax(z)
        assert np.allclose(np.array(p.sum(-1)), 1.0, atol=1e-5)
        assert (np.array(p) >= 0).all()

    def test_padding_invariance(self):
        """-1e10 padding entries must not change the distribution — the
        property DenseGCM's LearnedEdge relies on (learned.py:81-84)."""
        z = jax.random.normal(jax.random.PRNGKey(2), (4, 6))
        pad = jnp.full((4, 5), -1e10)
        p1 = sparsemax(z)
        p2 = sparsemax(jnp.concatenate([z, pad], axis=-1))[:, :6]
        assert np.allclose(np.array(p1), np.array(p2), atol=1e-5)

    def test_spardmax_hard_and_grad(self):
        z = jnp.array([[2.0, 1.0, -3.0]])
        y = spardmax(z)
        assert set(np.unique(np.array(y))) <= {0.0, 1.0}
        g = jax.grad(lambda x: spardmax(x).sum())(z)
        assert np.isfinite(np.array(g)).all()
        assert np.abs(np.array(g)).sum() > 0  # soft grads flow

    def test_hardmax(self):
        z = jnp.array([[5.0, 0.0, 0.0]])
        y = hardmax(z)
        assert np.array(y)[0, 0] == 1.0


class TestMaskedSoftmax:
    def test_equals_dense_when_unmasked(self):
        z = jax.random.normal(jax.random.PRNGKey(3), (5, 7))
        p = masked_softmax(z, jnp.ones_like(z, bool))
        assert np.allclose(np.array(p), np.array(jax.nn.softmax(z, -1)), atol=1e-6)

    def test_masked_entries_zero(self):
        z = jnp.ones((2, 4))
        mask = jnp.array([[True, True, False, False], [False, False, False, False]])
        p = masked_softmax(z, mask)
        assert np.allclose(np.array(p[0]), [0.5, 0.5, 0, 0], atol=1e-6)
        assert np.allclose(np.array(p[1]), 0.0)  # empty row -> all zeros, no NaN

    def test_tempered_hard(self):
        z = jnp.array([[1.0, 3.0, 2.0, 10.0]])
        mask = jnp.array([[True, True, True, False]])
        y = masked_tempered_softmax(z, mask, hard=True)
        assert np.allclose(np.array(y), [[0.0, 1.0, 0.0, 0.0]])

    def test_gumbel_respects_mask(self):
        key = jax.random.PRNGKey(4)
        z = jnp.zeros((8, 6))
        mask = jnp.arange(6)[None, :] < 3
        mask = jnp.broadcast_to(mask, z.shape)
        p = masked_gumbel_softmax(key, z, mask)
        assert np.allclose(np.array(p[:, 3:]), 0.0)
        assert np.allclose(np.array(p.sum(-1)), 1.0, atol=1e-5)


class TestGumbelSoftmax:
    def test_soft_sums_to_one(self):
        p = gumbel_softmax(jax.random.PRNGKey(0), jnp.zeros((4, 5)))
        assert np.allclose(np.array(p.sum(-1)), 1.0, atol=1e-5)

    def test_hard_is_onehot_with_grads(self):
        f = lambda z: gumbel_softmax(jax.random.PRNGKey(1), z, hard=True).sum()
        z = jnp.array([[0.5, 1.5, -0.5]])
        y = gumbel_softmax(jax.random.PRNGKey(1), z, hard=True)
        assert np.array(y.sum()) == 1.0
        assert set(np.unique(np.array(y))) <= {0.0, 1.0}
        g = jax.grad(f)(z)
        assert np.isfinite(np.array(g)).all()

    def test_extreme_logits_deterministic(self):
        """±1e15 logits force the sample, the reference's trick for making
        stochastic tests deterministic (tests/test_sparse_gcm.py:616-622)."""
        z = jnp.array([[1e15, -1e15, -1e15]])
        for seed in range(5):
            y = gumbel_softmax(jax.random.PRNGKey(seed), z, hard=True)
            assert np.array(y)[0, 0] == 1.0


class TestMisc:
    def test_diff_or(self):
        a = jnp.array([0.0, 1.0, 0.0, 1.0])
        b = jnp.array([0.0, 0.0, 1.0, 1.0])
        assert np.allclose(np.array(diff_or([a, b])), [0, 1, 1, 1])

    def test_grad_preserving_ones(self):
        v = jnp.array([0.3, 2.0, 5.0])
        ones = grad_preserving_ones(v)
        assert np.allclose(np.array(ones), 1.0)
        g = jax.grad(lambda x: grad_preserving_ones(x).sum())(v)
        assert np.allclose(np.array(g), 1.0 / np.array(v), atol=1e-6)
