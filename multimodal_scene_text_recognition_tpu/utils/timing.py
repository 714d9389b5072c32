"""Slope timing — the one trustworthy device-timing methodology here.

Per-call timings over the axon development tunnel include 10-30 ms of
dispatch (pytree flatten + tunnel round trip), and back-to-back identical
enqueues can be deduped by the runtime.  Every bench therefore times ONE
jit program that runs the body K times inside ``lax.fori_loop`` with a
data dependence, at two trip counts; the fixed per-call cost cancels in
the slope ``(t2 - t1) / (k2 - k1)``.  Shared by bench.py and the
scripts/ benches so the methodology cannot silently diverge.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def slope_ms(make_fn: Callable[[int], Callable], k1: int, k2: int,
             reps: int = 3, pairs: int = 5,
             retries: int = 2) -> "float | None":
    """ms per loop iteration via the two-trip-count slope, robustly.

    ``make_fn(k)`` returns a zero-arg callable running the body k times and
    returning a device value (drained with np.asarray).

    A measurement harness must never emit a rate <= 0 or a burst artifact
    (round-3 postmortem: tunnel variance at small trip counts produced a
    negative published beam throughput; round-4 testing showed a shared
    device can also produce slopes 10x high OR low when one of the two
    timings lands in an interference burst).  So the estimate is the
    MEDIAN of ``pairs`` interleaved (t1, t2) pair-slopes — adjacent pairs
    cancel slow drift, the median rejects bursts — each timing best-of-
    ``reps``.  If fewer than half the pairs come out monotone, the same
    two compiled programs are re-timed with doubled reps up to ``retries``
    times (no recompile, so retries are cheap); after that the function
    returns ``None`` so the caller reports a null with a reason instead of
    garbage.
    """
    f1, f2 = make_fn(k1), make_fn(k2)
    np.asarray(f1())  # compile + warm
    np.asarray(f2())

    def time_best(f, r):
        best = float("inf")
        for _ in range(r):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        return best

    r = reps
    for _ in range(retries + 1):
        slopes = []
        for _ in range(pairs):
            t1, t2 = time_best(f1, r), time_best(f2, r)
            if t2 > t1:
                slopes.append((t2 - t1) / (k2 - k1))
        if len(slopes) >= (pairs + 1) // 2:
            return float(np.median(slopes)) * 1e3
        r *= 2
    return None


def roundrobin(step_out: Callable, stacked, n_batches: int, consts=(),
               ) -> Callable[[int], Callable]:
    """``make_fn`` factory for :func:`slope_ms` over varied real batches.

    ``stacked`` is a device-resident pytree whose leaves are [n_batches,
    ...] stacks; the loop body gathers batch ``i % n_batches`` with
    ``dynamic_index_in_dim`` and folds ``jnp.sum(step_out(batch,
    *consts))`` into a scalar accumulator (the data dependence that
    defeats DCE and dedup).

    ``consts`` carries every large pytree the step needs (params,
    quantized weights, the corpus itself rides ``stacked``) as jit
    ARGUMENTS.  Closure-capturing them instead embeds each concrete array
    as a literal constant in the lowered HLO — ~300 MB of trained params
    per program — which the axon tunnel's remote-compile endpoint rejects
    with HTTP 413 (and which bloats compile time everywhere else).
    """

    def make_fn(k):
        @jax.jit
        def loop(stacked, consts):
            def body(i, acc):
                b = jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, i % n_batches, keepdims=False), stacked)
                return acc + jnp.sum(step_out(b, *consts)).astype(
                    jnp.float32)

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return lambda: loop(stacked, consts)

    return make_fn
