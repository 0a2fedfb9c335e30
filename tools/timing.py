"""Trustworthy on-chip timing for the tunneled TPU.

`block_until_ready()` on the axon-tunneled device is NOT a reliable
completion barrier: measured, a 60 ms 64-deep Pallas mul chain "completed"
in 0.1 ms under load.  The only sync that provably waits for the result is
a device->host copy of (part of) the output buffer.  The download link
runs at ~2 MB/s, so the fetch must be tiny: we slice the first element of
the first output leaf ON DEVICE (a dispatch) and np.asarray that.

Usage:
    t = measure(lambda: fn(*args))          # median wall s of REPS calls
"""

import time

import numpy as np

REPS = 3


def _sync(out):
    import jax
    leaf = jax.tree.leaves(out)[0]
    idx = tuple(0 for _ in leaf.shape)
    return np.asarray(leaf[idx] if idx else leaf)


def measure(fn, reps: int = REPS, warmup: int = 1):
    """Min wall seconds over `reps` fetch-synced calls of fn() -> device out."""
    for _ in range(warmup):
        _sync(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def measure_host(fn, reps: int = REPS, warmup: int = 1):
    """Same protocol for host-side (already synchronous) functions."""
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best
