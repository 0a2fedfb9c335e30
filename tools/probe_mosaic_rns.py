"""Mosaic capability probe for the RNS Pallas kernel (round 5).

The RNS mont-mul kernel needs, inside a Pallas TPU kernel body:
  1. u32 -> bf16 byte-split casts (possibly via i32)  [pallas_mxu.py died
     on u32 -> f32 casts in round 3 — find the lowering path that works]
  2. jnp.dot(bf16 [k,k], bf16 [k,B]) with preferred_element_type=f32
  3. f32 -> u32 (or i32) casts of the exact dot results
  4. u16 table loads cast up to i32/u32 (halves VMEM tile size)

Runs each variant standalone on the real chip and prints ok/error so the
kernel uses only proven constructs.
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, B = 32, 256


def run(name, kern, args, want=None):
    try:
        specs = [pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                              memory_space=pltpu.VMEM) for a in args]
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K, B), jnp.uint32),
            in_specs=specs,
            out_specs=pl.BlockSpec((K, B), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(*args)
        out = np.asarray(jax.device_get(out))
        if want is not None and not (out == want).all():
            print(f"{name}: WRONG (max diff {np.abs(out.astype(np.int64) - want).max()})")
        else:
            print(f"{name}: ok")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.default_rng(0)
    sig = rng.integers(0, 1 << 15, size=(K, B)).astype(np.uint32)
    mat = rng.integers(0, 1 << 15, size=(K, K)).astype(np.int64)
    want_dot = (mat @ sig.astype(np.int64)).astype(np.uint64)

    sig_j = jnp.asarray(sig)
    mat_lo = jnp.asarray((mat & 0xFF).astype(np.float32), dtype=jnp.bfloat16)
    mat_hi = jnp.asarray((mat >> 8).astype(np.float32), dtype=jnp.bfloat16)

    # 1. u32 -> bf16 direct
    def k_cast_direct(s_ref, o_ref):
        s = s_ref[:]
        lo = (s & 0xFF).astype(jnp.bfloat16)
        o_ref[:] = lo.astype(jnp.uint32)
    run("u32->bf16 direct", k_cast_direct, [sig_j], want=sig & 0xFF)

    # 2. u32 -> i32 -> bf16
    def k_cast_i32(s_ref, o_ref):
        s = s_ref[:]
        lo = (s & 0xFF).astype(jnp.int32).astype(jnp.bfloat16)
        o_ref[:] = lo.astype(jnp.int32).astype(jnp.uint32)
    run("u32->i32->bf16", k_cast_i32, [sig_j], want=sig & 0xFF)

    # 3. full dot: split sig into bytes, 4 bf16 matmuls, recombine u32
    def k_dot(s_ref, ml_ref, mh_ref, o_ref):
        s = s_ref[:]
        f = jnp.float32
        lo = (s & 0xFF).astype(jnp.int32).astype(jnp.bfloat16)
        hi = (s >> 8).astype(jnp.int32).astype(jnp.bfloat16)
        ll = jnp.dot(ml_ref[:], lo, preferred_element_type=f)
        lh = jnp.dot(mh_ref[:], lo, preferred_element_type=f)
        hl = jnp.dot(ml_ref[:], hi, preferred_element_type=f)
        hh = jnp.dot(mh_ref[:], hi, preferred_element_type=f)
        # true = ll + 2^8(lh+hl) + 2^16 hh; K=32 terms * 2^16 < 2^21 exact
        tot = (ll.astype(jnp.uint32) + ((lh + hl).astype(jnp.uint32) << 8)
               + (hh.astype(jnp.uint32) << 16))
        o_ref[:] = tot
    run("bf16 dot4 recombine (mod 2^32)", k_dot, [sig_j, mat_lo, mat_hi],
        want=(want_dot & 0xFFFFFFFF).astype(np.uint32))

    # 4. u16 loads -> i32
    tbl16 = rng.integers(0, 1 << 15, size=(K, B)).astype(np.uint16)
    def k_u16(t_ref, o_ref):
        o_ref[:] = t_ref[:].astype(jnp.int32).astype(jnp.uint32)
    run("u16 load -> i32", k_u16, [jnp.asarray(tbl16)],
        want=tbl16.astype(np.uint32))

    # 5. one-hot masked sum over a u16 [D, K, B] tile (select digit row)
    D = 16
    tbl = rng.integers(0, 1 << 15, size=(D, K, B)).astype(np.uint16)
    idx = rng.integers(0, D, size=(B,)).astype(np.uint32)
    want_sel = np.take_along_axis(
        tbl.astype(np.uint32), idx[None, None, :].astype(np.int64)
        .repeat(K, 1), axis=0)[0]
    def k_onehot(t_ref, i_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1, B), 0)
        m = (iota == i_ref[:][None, 0].astype(jnp.int32))
        rows = t_ref[:].astype(jnp.int32)
        o_ref[:] = jnp.where(m, rows, 0).sum(axis=0).astype(jnp.uint32)
    try:
        out = pl.pallas_call(
            functools.partial(k_onehot),
            out_shape=jax.ShapeDtypeStruct((K, B), jnp.uint32),
            in_specs=[pl.BlockSpec((D, K, B), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, B), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((K, B), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(tbl), jnp.asarray(idx[None]))
        out = np.asarray(jax.device_get(out))
        print("u16 one-hot select:", "ok" if (out == want_sel).all()
              else "WRONG")
    except Exception as e:
        print(f"u16 one-hot select: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
