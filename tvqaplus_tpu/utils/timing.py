"""Trustworthy device timing.

``jax.block_until_ready`` returns before execution completes on the
experimental axon TPU platform (round-1 verdict: a timing loop "measured"
72 PFLOPS on a chip whose true bf16 peak is ~200 TFLOPS).  The only sync
this repo trusts is a **host fetch** of a value that data-depends on the
full computation chain: ``jax.device_get`` cannot return until the buffer
is defined, and defining it requires every producing step to have run.

Every timed region in the repo must end with :func:`host_sync`.
"""
from __future__ import annotations

import time

import jax
import numpy as np


def host_sync(x):
    """Block until ``x`` (any pytree of device arrays) is computed, by
    fetching one leaf to the host.  Returns the fetched leaf as numpy.

    Pass a value that depends on the whole chain you want to time (e.g. the
    last step's loss when steps chain through the train state)."""
    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        return None
    return np.asarray(jax.device_get(leaves[0]))


def timeit_host_synced(fn, n=20, warmup=2, trials=3):
    """Best-of-``trials`` mean milliseconds per call of ``fn``.

    ``fn`` must return a device value that data-depends on everything the
    call computed; each timed region ends with a host fetch of the last
    call's result (never ``block_until_ready`` — see module docstring)."""
    r = None
    for _ in range(max(1, warmup)):
        r = fn()
    host_sync(r)
    best = float("inf")
    for _ in range(max(1, trials)):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        host_sync(r)
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def compiled_flops(jitted, *args, **kwargs):
    """FLOP count of one call from XLA's compiled cost analysis, or None if
    the backend doesn't expose it.

    CAUTION: XLA's cost analysis counts a ``lax.scan`` body ONCE, no matter
    the trip count — analyzing a K-step scanned dispatch under-reports by
    ~K.  Analyze the single-step program and multiply by K instead (the
    round-1 bench divided a once-counted scan by K and reported 10x-low
    FLOPs/MFU)."""
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", -1.0))
        return flops if flops > 0 else None
    except Exception:
        return None
