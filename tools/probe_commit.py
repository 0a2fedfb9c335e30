"""Instrumented breakdown of the commit-path startup + steady state on TPU.

Times each stage separately so bench-budget overruns can be attributed:
tunnel dispatch latency, transfer bandwidth, Context init, table build,
first (cache-hit) compile+exec, steady-state reps.
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


import numpy as np  # noqa: E402

log("numpy imported")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"jax imported; devices={jax.devices()}")

# --- dispatch latency: tiny jit round trips ---------------------------------
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((8,), jnp.uint32)
f(x).block_until_ready()
log("tiny jit compiled")
t = time.perf_counter()
for _ in range(20):
    f(x).block_until_ready()
log(f"tiny jit round-trip: {(time.perf_counter() - t) / 20 * 1e3:.1f} ms avg")

# --- transfer bandwidth ------------------------------------------------------
big = np.zeros((64, 4096, 16), dtype=np.uint32)  # 67 MB, the commit upload
t = time.perf_counter()
d = jax.device_put(big)
d.block_until_ready()
dt = time.perf_counter() - t
log(f"67MB upload: {dt:.2f}s ({big.nbytes / dt / 1e6:.0f} MB/s)")
t = time.perf_counter()
_ = np.asarray(d)
dt = time.perf_counter() - t
log(f"67MB download: {dt:.2f}s ({big.nbytes / dt / 1e6:.0f} MB/s)")

# --- Context ------------------------------------------------------------------
from goethkzg_tpu.api import Context  # noqa: E402

log("api imported")
ctx = Context()
log("Context() built")

# --- table build --------------------------------------------------------------
t = time.perf_counter()
tx, ty = ctx.commit_table
tx.block_until_ready()
log(f"commit_table built: {time.perf_counter() - t:.1f}s "
    f"(shape {tx.shape}, {tx.nbytes / 1e6:.0f} MB x2)")

# --- commit -------------------------------------------------------------------
rng = np.random.default_rng(0)
polys = rng.integers(0, 1 << 16, size=(64, 4096, 16), dtype=np.uint32)
polys[..., -1] &= 0x7FFF

t = time.perf_counter()
commit = ctx._jit("commit", ctx._commit_fn)
out = commit(tx, ty, jnp.asarray(polys))
jax.block_until_ready(out)
log(f"first commit call (compile+exec): {time.perf_counter() - t:.1f}s")

for i in range(3):
    t = time.perf_counter()
    out = commit(tx, ty, jnp.asarray(polys))
    jax.block_until_ready(out)
    log(f"steady commit rep {i}: {time.perf_counter() - t:.3f}s "
        f"({64 / (time.perf_counter() - t):.1f} blobs/s)")

# kernel-only: polys pre-uploaded
dp = jax.device_put(polys)
for i in range(3):
    t = time.perf_counter()
    out = commit(tx, ty, dp)
    jax.block_until_ready(out)
    log(f"steady commit (pre-uploaded) rep {i}: "
        f"{time.perf_counter() - t:.3f}s "
        f"({64 / (time.perf_counter() - t):.1f} blobs/s)")
