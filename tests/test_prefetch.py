"""prefetch_to_device — content/order parity, exhaustion, error paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcm_tpu.data.prefetch import prefetch_to_device


class TestPrefetch:
    def test_content_and_order_parity(self):
        batches = [{"x": np.full((3, 2), i, np.float32), "i": np.int32(i)}
                   for i in range(7)]
        out = list(prefetch_to_device(iter(batches), size=3))
        assert len(out) == 7
        for i, b in enumerate(out):
            assert isinstance(b["x"], jax.Array)
            np.testing.assert_array_equal(np.asarray(b["x"]),
                                          batches[i]["x"])
            assert int(b["i"]) == i

    def test_empty_iterator(self):
        assert list(prefetch_to_device(iter([]), size=2)) == []

    def test_producer_exception_propagates(self):
        def gen():
            yield np.zeros(2)
            raise ValueError("boom")

        it = prefetch_to_device(gen(), size=2)
        next(it)
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_overlaps_with_compute(self):
        """Consumer can run jitted compute between pulls; values survive."""
        f = jax.jit(lambda x: jnp.sum(x * 2))
        acc = 0.0
        gen = (np.full((4,), i, np.float32) for i in range(5))
        for b in prefetch_to_device(gen, size=2):
            acc += float(f(b))
        assert acc == sum(8.0 * i for i in range(5))
