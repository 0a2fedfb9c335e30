"""On-chip perf triage of the Pallas RNS mul kernel variants.

First chip run measured 3.4 Mmul/s (40x SLOWER than the positional
kernel) — something in the kernel serializes.  This times, on identical
shapes [2^17 lanes, depth-16 dependent chains]:

  pos    positional pallas_field.mont_mul chain (reference, ~139 Mmul/s)
  mxu    RNS kernel with bf16 MXU base-extension matmuls
  vpu    RNS kernel with the static-loop u32 VPU base extension

and cross-checks one block of each RNS variant against the golden
RNSSpec chain.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.timing import measure as _time


def main():
    import jax
    import jax.numpy as jnp
    from goethkzg_tpu.ops import pallas_field
    from goethkzg_tpu.ops.field import fp_spec
    from goethkzg_tpu.ops.pallas_rns import mont_mul_rns
    from goethkzg_tpu.ops.rns import fp_rns

    print(f"devices: {jax.devices()}", flush=True)
    spec = fp_rns()
    F = fp_spec()
    rng = np.random.default_rng(3)
    LANES = 1 << 17
    DEPTH = 16

    # ---- positional reference ------------------------------------------
    a = jnp.asarray(rng.integers(0, 1 << 16, (LANES, F.n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (LANES, F.n), dtype=np.uint32))

    @jax.jit
    def chain_pos(a, b):
        x = a
        for _ in range(DEPTH):
            x = pallas_field.mont_mul(F, x, b)
        return x

    t = _time(lambda: chain_pos(a, b))
    print(f"pos: {DEPTH * LANES / t / 1e6:.1f} Mmul/s  ({t*1e3:.1f} ms)",
          flush=True)

    # ---- RNS variants ---------------------------------------------------
    m_all = np.array(spec.A.m + spec.B.m, dtype=np.uint32)
    xr = (rng.integers(0, 1 << 30, (LANES, 2 * spec.k)) % m_all).astype(
        np.uint32)
    yr = (rng.integers(0, 1 << 30, (LANES, 2 * spec.k)) % m_all).astype(
        np.uint32)
    xj, yj = jnp.asarray(xr), jnp.asarray(yr)

    for name, mxu in (("mxu", True), ("vpu", False)):
        fn = jax.jit(lambda a, b, mxu=mxu: mont_mul_rns(
            spec, a, b, depth=DEPTH, mxu=mxu))
        try:
            out = np.asarray(fn(xj, yj))
            # golden check on 2 lanes
            for lane in (0, LANES - 1):
                want = [int(v) for v in xr[lane]]
                for _ in range(DEPTH):
                    want = spec.mul(want, [int(v) for v in yr[lane]])
                assert out[lane].tolist() == [int(w) for w in want], \
                    f"{name}: lane {lane} mismatch"
            t = _time(lambda: fn(xj, yj))
            print(f"{name}: {DEPTH * LANES / t / 1e6:.1f} Mmul/s  "
                  f"({t*1e3:.1f} ms, exact)", flush=True)
        except Exception as e:          # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
