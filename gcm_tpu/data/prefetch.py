"""Device-prefetch iterator — overlap host→device transfer with compute.

A TPU training loop that calls `device_put` (or lets jit do it) inline
serializes the PCIe/tunnel transfer with the step computation. This wraps
any host-batch iterator with a background thread that stages up to `size`
batches on device ahead of the consumer, so the next batch's transfer
rides under the current step's compute — the standard input-pipeline
overlap (the role flax.jax_utils.prefetch_to_device plays; rebuilt here
without flax, for arbitrary pytrees, with exception propagation and
clean shutdown).

Works with the native `HostReplayBuffer` sampler or any generator of
numpy/array pytrees.
"""

from __future__ import annotations

import queue
import threading

import jax


class _Stop:
    pass


class _Raise:
    def __init__(self, exc):
        self.exc = exc


def prefetch_to_device(iterator, size: int = 2, device=None):
    """Yields the items of `iterator` as device-resident pytrees, staging
    up to `size` items ahead from a background thread.

    iterator: any iterable of pytrees of array-likes.
    size: prefetch depth (2 is enough to overlap one transfer with one
        step; more only helps jittery producers).
    device: target jax.Device (default: jax.devices()[0]).
    """
    assert size >= 1
    dev = device or jax.devices()[0]
    q: queue.Queue = queue.Queue(maxsize=size)

    def producer():
        try:
            for item in iterator:
                q.put(jax.device_put(item, dev))
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(_Raise(e))
            return
        q.put(_Stop())

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    while True:
        item = q.get()
        if isinstance(item, _Stop):
            return
        if isinstance(item, _Raise):
            raise item.exc
        yield item
