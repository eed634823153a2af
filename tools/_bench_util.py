"""Shared timing helper for the bench tools.

THE timing rule on this repo's tunneled TPU runtime: `block_until_ready`
can RETURN EARLY (a 400 ms loop "measured" 0.1 ms — see
tools/bench_solver.py and BENCHMARKS.md), so benchmarks must time
through `jax.device_get` of a result element — fetching a value cannot
complete before the computation does.  One helper so the rule lives in
ONE place (two of the six hand-rolled copies had silently drifted back
to block_until_ready).
"""

from __future__ import annotations

import time


def timed_best(run, fetch, reps: int = 2) -> float:
    """Best-of-``reps`` wall seconds of ``run()``, timed through
    ``fetch(result)`` — which must ``jax.device_get`` (an element of)
    the result inside the timed region.  ``run`` is called once first to
    compile/warm."""
    import jax

    jax.device_get(fetch(run()))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fetch(run()))
        best = min(best, time.perf_counter() - t0)
    return best
