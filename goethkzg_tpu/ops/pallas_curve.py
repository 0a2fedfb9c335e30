"""Pallas TPU kernels for complete G1 point operations over Fp.

One kernel call per *point operation* (complete Jacobian add, complete
mixed add, double) instead of ~20 separate field-multiply kernels: at MSM
granularity (~4k lanes) the per-call dispatch + limb-major transposes of
a field-level kernel dominate, so the whole group-law formula runs inside
a single VMEM-resident kernel.  Formulas and exceptional-case handling are
line-for-line the ones in ops/curve.py (dbl-2009-l, complete adds with
masked doubling/infinity blending) — results are bit-identical.

Layout: [*, n] coordinates are transposed once per call to limb-major
[n, N] blocks (lane axis = point index), exactly like ops/pallas_field.py,
whose conv/carry helpers this module reuses.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import BLOCK, _conv, _ks_carry, _propagate, _shift_up

# ---------------------------------------------------------------------------
# limb-major modular helpers ([n, B] operands, constants [n, 1])
# ---------------------------------------------------------------------------


def _mont_mul_lm(a, b, modc, npc, n):
    """Montgomery product, limb-major; mirrors pallas_field._mont_mul_kernel."""
    t_cols, t_top = _conv(a, b, n, 2 * n)
    t_low, _ = _propagate(t_cols[:n])
    m_cols, _ = _conv(t_low, npc, n, n)
    m, _ = _propagate(m_cols)
    mn_cols, mn_top = _conv(m, modc, n, 2 * n)
    total = t_cols + mn_cols
    _, low_carry = _propagate(total[:n])
    high = total[n:]
    high = jnp.concatenate([(high[0] + low_carry)[None, :], high[1:]], axis=0)
    limbs, carry = _propagate(high)
    carry = carry + t_top + mn_top
    return _cond_sub_mod(limbs, carry, modc)


def _cond_sub_mod(limbs, extra, modc):
    comp = 0xFFFF - modc
    s = limbs + comp
    s = jnp.concatenate([(s[0] + 1)[None, :], s[1:]], axis=0)
    d, ks_carry = _ks_carry(s)
    use_sub = (extra > 0) | (ks_carry == 1)
    return jnp.where(use_sub[None, :], d, limbs)


def _mod_add_lm(a, b, modc):
    limbs, carry = _ks_carry(a + b)
    return _cond_sub_mod(limbs, carry, modc)


def _sub_raw_lm(a, b):
    """a - b (vector - vector); returns (limbs, borrow [B])."""
    s = a + (0xFFFF - b)
    s = jnp.concatenate([(s[0] + 1)[None, :], s[1:]], axis=0)
    limbs, carry = _ks_carry(s)
    return limbs, 1 - carry


def _mod_sub_lm(a, b, modc):
    d, borrow = _sub_raw_lm(a, b)
    fix = jnp.where(borrow[None, :] == 1, jnp.broadcast_to(modc, d.shape),
                    jnp.zeros_like(d))
    limbs, _ = _ks_carry(d + fix)
    return limbs


def _is_zero_lm(a):
    """[n, B] -> [B] u32 0/1 mask.

    (signed max: Mosaic lacks unsigned reductions; limbs are < 2^16 so the
    int32 view is safe)
    """
    nz = jnp.max(a.astype(jnp.int32), axis=0)
    return jnp.where(nz == 0, np.uint32(1), np.uint32(0))


def _sel(mask, a, b):
    """mask [B] u32 0/1: pick a where mask==1."""
    return jnp.where(mask[None, :] == 1, a, b)


def _double_lm(X, Y, Z, modc, npc, n):
    """dbl-2009-l, limb-major (mirrors curve.py double)."""
    mul = lambda u, v: _mont_mul_lm(u, v, modc, npc, n)
    add = lambda u, v: _mod_add_lm(u, v, modc)
    sub = lambda u, v: _mod_sub_lm(u, v, modc)
    A = mul(X, X)
    B_ = mul(Y, Y)
    C = mul(B_, B_)
    t = add(X, B_)
    t = mul(t, t)
    D = sub(sub(t, A), C)
    D = add(D, D)
    E = add(add(A, A), A)
    G = mul(E, E)
    X3 = sub(G, add(D, D))
    C2 = add(C, C)
    C8 = add(add(C2, C2), add(C2, C2))
    Y3 = sub(mul(E, sub(D, X3)), C8)
    Z3 = mul(add(Y, Y), Z)
    return X3, Y3, Z3


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _add_affine_kernel(x1r, y1r, z1r, x2r, y2r, inf2r, modr, npr, oner,
                       ox, oy, oz, *, n):
    X1, Y1, Z1 = x1r[:], y1r[:], z1r[:]
    x2, y2 = x2r[:], y2r[:]
    inf2 = inf2r[:][0]                    # [B] u32 0/1
    modc, npc, onec = modr[:], npr[:], oner[:]
    mul = lambda u, v: _mont_mul_lm(u, v, modc, npc, n)
    add = lambda u, v: _mod_add_lm(u, v, modc)
    sub = lambda u, v: _mod_sub_lm(u, v, modc)

    inf1 = _is_zero_lm(Z1)
    Z1Z1 = mul(Z1, Z1)
    U2 = mul(x2, Z1Z1)
    S2 = mul(mul(y2, Z1), Z1Z1)
    H = sub(U2, X1)
    rr = sub(S2, Y1)
    rr = add(rr, rr)
    x_eq = _is_zero_lm(H)
    y_eq = _is_zero_lm(rr)
    H2 = add(H, H)
    I = mul(H2, H2)
    J = mul(H, I)
    V = mul(X1, I)
    X3 = sub(sub(mul(rr, rr), J), add(V, V))
    SJ = mul(Y1, J)
    Y3 = sub(mul(rr, sub(V, X3)), add(SJ, SJ))
    Z3 = mul(Z1, H2)

    dX, dY, dZ = _double_lm(X1, Y1, Z1, modc, npc, n)
    is_double = x_eq * y_eq * (1 - inf1)
    X3 = _sel(is_double, dX, X3)
    Y3 = _sel(is_double, dY, Y3)
    Z3 = _sel(is_double, dZ, Z3)
    # p1 at infinity -> promote a2
    one_b = jnp.broadcast_to(onec, Z3.shape)
    X3 = _sel(inf1, x2, X3)
    Y3 = _sel(inf1, y2, Y3)
    Z3 = _sel(inf1, one_b, Z3)
    # a2 at infinity -> p1 unchanged
    X3 = _sel(inf2, X1, X3)
    Y3 = _sel(inf2, Y1, Y3)
    Z3 = _sel(inf2, Z1, Z3)
    ox[:], oy[:], oz[:] = X3, Y3, Z3


def _add_kernel(x1r, y1r, z1r, x2r, y2r, z2r, modr, npr, ox, oy, oz, *, n):
    X1, Y1, Z1 = x1r[:], y1r[:], z1r[:]
    X2, Y2, Z2 = x2r[:], y2r[:], z2r[:]
    modc, npc = modr[:], npr[:]
    mul = lambda u, v: _mont_mul_lm(u, v, modc, npc, n)
    add = lambda u, v: _mod_add_lm(u, v, modc)
    sub = lambda u, v: _mod_sub_lm(u, v, modc)

    inf1 = _is_zero_lm(Z1)
    inf2 = _is_zero_lm(Z2)
    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, U1)
    rr = sub(S2, S1)
    rr = add(rr, rr)
    x_eq = _is_zero_lm(H)
    y_eq = _is_zero_lm(rr)
    H2 = add(H, H)
    I = mul(H2, H2)
    J = mul(H, I)
    V = mul(U1, I)
    X3 = sub(sub(mul(rr, rr), J), add(V, V))
    SJ = mul(S1, J)
    Y3 = sub(mul(rr, sub(V, X3)), add(SJ, SJ))
    Z3 = mul(mul(Z1, Z2), H2)

    dX, dY, dZ = _double_lm(X1, Y1, Z1, modc, npc, n)
    is_double = x_eq * y_eq * (1 - inf1) * (1 - inf2)
    X3 = _sel(is_double, dX, X3)
    Y3 = _sel(is_double, dY, Y3)
    Z3 = _sel(is_double, dZ, Z3)
    not1 = 1 - inf1
    X3 = _sel(inf1, X2, _sel(inf2 * not1, X1, X3))
    Y3 = _sel(inf1, Y2, _sel(inf2 * not1, Y1, Y3))
    Z3 = _sel(inf1, Z2, _sel(inf2 * not1, Z1, Z3))
    ox[:], oy[:], oz[:] = X3, Y3, Z3


def _double_kernel(x1r, y1r, z1r, modr, npr, ox, oy, oz, *, n):
    modc, npc = modr[:], npr[:]
    X3, Y3, Z3 = _double_lm(x1r[:], y1r[:], z1r[:], modc, npc, n)
    ox[:], oy[:], oz[:] = X3, Y3, Z3


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


@functools.cache
def _consts(n: int, modulus: int, n_prime: int, r_mod: int):
    enc = lambda v: np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)],
                             dtype=np.uint32).reshape(n, 1)
    return enc(modulus), enc(n_prime), enc(r_mod)


def _specs(n, n_vec, n_mask, n_const):
    vec = pl.BlockSpec((n, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    const = pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return [vec] * n_vec + [mask] * n_mask + [const] * n_const, vec


def _flatten(arrs, n):
    """[..., n] arrays -> ([n, Npad] limb-major), plus (lead, N)."""
    lead = arrs[0].shape[:-1]
    N = 1
    for d in lead:
        N *= d
    Np = max(BLOCK, ((N + BLOCK - 1) // BLOCK) * BLOCK)
    out = []
    for a in arrs:
        f = a.reshape(N, n)
        if Np != N:
            f = jnp.concatenate(
                [f, jnp.zeros((Np - N, n), dtype=jnp.uint32)], axis=0)
        out.append(f.T)
    return out, lead, N, Np


def _unflatten(outs, lead, N, n):
    return tuple(o.T[:N].reshape(lead + (n,)) for o in outs)


@functools.cache
def _build(kind: str, n: int, modulus: int, n_prime: int, r_mod: int):
    if kind == "add_affine":
        kern = functools.partial(_add_affine_kernel, n=n)
        n_vec, n_mask, n_const = 5, 1, 3
    elif kind == "add":
        kern = functools.partial(_add_kernel, n=n)
        n_vec, n_mask, n_const = 6, 0, 2
    else:
        kern = functools.partial(_double_kernel, n=n)
        n_vec, n_mask, n_const = 3, 0, 2

    def call(*args):
        Np = args[0].shape[1]
        in_specs, vec = _specs(n, n_vec, n_mask, n_const)
        out_shape = [jax.ShapeDtypeStruct((n, Np), jnp.uint32)] * 3
        return pl.pallas_call(
            kern,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=[vec] * 3,
            grid=(Np // BLOCK,),
        )(*args)

    return call


def add_affine(spec, p1, a2, a2_inf, one_mont_int: int):
    """Complete mixed add; mirrors curve.add_affine. All inputs [..., n]."""
    n = spec.n
    X1, Y1, Z1 = p1
    x2, y2 = a2
    (x1t, y1t, z1t, x2t, y2t), lead, N, Np = _flatten(
        [X1, Y1, Z1, x2, y2], n)
    inf_flat = a2_inf.astype(jnp.uint32).reshape(-1)
    if Np != N:
        inf_flat = jnp.concatenate(
            [inf_flat, jnp.zeros((Np - N,), dtype=jnp.uint32)])
    inf_t = inf_flat.reshape(1, Np)
    modc, npc, onec = _consts(n, spec.modulus, spec.n_prime, one_mont_int)
    call = _build("add_affine", n, spec.modulus, spec.n_prime, one_mont_int)
    outs = call(x1t, y1t, z1t, x2t, y2t, inf_t, modc, npc, onec)
    return _unflatten(outs, lead, N, n)


def add(spec, p1, p2):
    """Complete Jacobian add; mirrors curve.add."""
    n = spec.n
    flat, lead, N, Np = _flatten(list(p1) + list(p2), n)
    modc, npc, _ = _consts(n, spec.modulus, spec.n_prime, 0)
    call = _build("add", n, spec.modulus, spec.n_prime, 0)
    outs = call(*flat, modc, npc)
    return _unflatten(outs, lead, N, n)


def double(spec, p):
    n = spec.n
    flat, lead, N, Np = _flatten(list(p), n)
    modc, npc, _ = _consts(n, spec.modulus, spec.n_prime, 0)
    call = _build("double", n, spec.modulus, spec.n_prime, 0)
    outs = call(*flat, modc, npc)
    return _unflatten(outs, lead, N, n)
