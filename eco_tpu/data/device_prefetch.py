"""Host->device batch prefetch: overlap the H2D DMA with the running step.

The reference overlaps host work with the GPU via InternalThread double
buffering (base_data_layer.cpp:42-91) -- but its device copy still rides the
forward's critical path.  On TPU the transfer engine is independent of the
TensorCore, and ``jax.device_put`` is asynchronous: issuing the put for batch
i+1 while step i executes hides the entire host->device leg.  This iterator
is the missing third stage of the feed pipeline:

    decode/augment threads (VideoPipeline) -> prefetch_to_device -> step

``size`` is the number of batches in flight ahead of the consumer.  The
default is 1, which already achieves FULL overlap: ``device_put`` is async,
so while batch i's DMA runs the generator decodes batch i+1 and the chip
executes step i-1 -- decode, transfer and compute pipeline three-deep with
a single queue slot.  Deeper queues add no bandwidth (one transfer engine)
but DO add contention: on a thin host<->device link the round-5 A/B
measured, per step on the same run, 984 ms at size=1 vs 1087 ms at size=2
vs 1154 ms at size=3 (serial loop: 2005 ms) -- concurrent 33 MB DMAs
interleave and all finish later.  That contention is exactly why round 4's
size=2 feed benched 32% SLOWER than the serial loop on a degraded relay
(BENCH_r04; see docs/PERF_NOTES.md).  Each in-flight batch also pins a host
staging copy and an HBM destination buffer.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    it: Iterable,
    size: int = 1,
    *,
    put_fn: Optional[Callable[[Any], Any]] = None,
) -> Iterator:
    """Yield batches from ``it`` already resident on device, ``size`` ahead.

    ``put_fn`` maps a host batch (pytree of numpy arrays) to device arrays;
    defaults to ``jax.device_put`` (default device).  For a sharded feed pass
    e.g. ``lambda b: shard_batch(mesh, b, batch_axis=1)`` so each prefetched
    batch lands pre-sharded and pjit never reshards on the step's critical
    path.

    The put is dispatched eagerly when the batch enters the queue -- on TPU
    this starts the DMA immediately and ``next()`` returns handles without
    blocking; the step that consumes them orders itself after the transfer
    on-device.  StopIteration from ``it`` drains the queue cleanly.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    put = put_fn if put_fn is not None else jax.device_put
    queue: collections.deque = collections.deque()
    src = iter(it)

    def fill():
        while len(queue) < size:
            try:
                batch = next(src)
            except StopIteration:
                return False
            queue.append(put(batch))
        return True

    fill()
    while queue:
        out = queue.popleft()
        fill()
        yield out
