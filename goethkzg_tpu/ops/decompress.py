"""Batched G1 wire-point decompression ON DEVICE.

The verify hot paths deserialize up to 256 compressed 48-byte points per
batch (reference: serialization.go:102-115 — gnark SetBytes: sqrt +
on-curve + subgroup check, one point at a time on the CPU).  Measured on
this host the native C++ codec costs ~230 us/point (~29 ms per 128
points) — the single largest host-side share of both north-star verify
metrics.  Here the whole batch decodes as ONE device dispatch:

* wire-format checks (flags, canonical x < p) stay on the host — they are
  vectorized numpy bit-ops over the [B, 48] byte matrix and must raise
  the exact reference error taxonomy;
* y = (x^3 + 4)^((p+1)/4) runs as a windowed-exponent scan (lane = point)
  — the quadratic-residue test of the result IS the on-curve check;
* the sign bit picks y or p - y (lexicographic-largest convention,
  serialization.go flag 0x20);
* the subgroup check is the GLV-endomorphism criterion used by the
  native codec (native/bls_native.cpp g1_in_subgroup, after Scott 2021):

      P in G1  <=>  phi(P) + [z^2] P == infinity,
      phi(x, y) = (beta x, y),  z = -0xd201000000010000 (BLS parameter)

  with [z^2] P computed as two [|z|] chains — |z| has Hamming weight 6,
  so each chain is 63 complete doublings + 5 adds, STATICALLY unrolled
  (the bit pattern is a compile-time constant; no scan, no selects).
  beta (which of the two nontrivial cube roots of 1 matches lambda) is
  calibrated once on the host against the generator, exactly like the
  C++ tier does.

Returns Montgomery-form limb arrays ready to feed the fold-MSM graphs
directly — decoded points never round-trip through host big-ints.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import G1_B, P_MOD
from .field import int_to_limbs

Z_ABS = 0xD201000000010000          # |z|, the BLS12-381 parameter

_P_WORDS_BE = np.array(
    [(P_MOD >> (16 * (23 - i))) & 0xFFFF for i in range(24)], dtype=np.uint32)


class G1DecompressError(Exception):
    """Raised by the host-side parser; wrapped by the caller into the
    library's DeserializationError (the caller owns the error taxonomy)."""

    def __init__(self, index: int, msg: str):
        self.index = index
        super().__init__(f"point {index}: {msg}")


def parse_g1_compressed_batch(datas):
    """List of 48-byte encodings -> (x_limbs [B,24] u32 LE16 normal form,
    sign [B] bool, inf [B] bool).  Raises G1DecompressError on the first
    wire-format violation (flag rules, canonical x), mirroring
    golden.curve.g1_decompress / reference serialization.go:102-115.
    All checks are vectorized over the byte matrix."""
    B = len(datas)
    for i, d in enumerate(datas):
        if d is None:
            raise G1DecompressError(i, "nil input")
        if len(d) != 48:
            raise G1DecompressError(i, "G1 point must be 48 bytes")
    arr = np.frombuffer(b"".join(bytes(d) for d in datas),
                        dtype=np.uint8).reshape(B, 48)
    flags = arr[:, 0]
    inf = (flags & 0x40) != 0
    sign = (flags & 0x20) != 0
    body = arr.copy()
    body[:, 0] = flags & 0x1F
    # x as 24 BE 16-bit words; canonical = x < p
    words_be = (body[:, 0::2].astype(np.uint32) << 8) | body[:, 1::2]
    lt = np.zeros(B, dtype=bool)
    eq = np.ones(B, dtype=bool)
    for k in range(24):
        lt |= eq & (words_be[:, k] < _P_WORDS_BE[k])
        eq &= words_be[:, k] == _P_WORDS_BE[k]
    # rule masks in per-point check order; report the LOWEST bad index
    # (the reference decodes sequentially and stops at the first bad point)
    not_comp = (flags & 0x80) == 0
    bad_inf = ~not_comp & inf & ((flags != 0xC0) | (body != 0).any(axis=1))
    noncanon = ~not_comp & ~inf & ~lt
    bad = not_comp | bad_inf | noncanon
    if bad.any():
        i = int(np.argmax(bad))
        if not_comp[i]:
            raise G1DecompressError(i, "expected compressed encoding")
        if bad_inf[i]:
            raise G1DecompressError(i, "malformed infinity encoding")
        raise G1DecompressError(i, "x coordinate not canonical")
    x_limbs = np.ascontiguousarray(words_be[:, ::-1])
    x_limbs[inf] = 0
    return x_limbs, sign, inf


@functools.cache
def _calibrated_beta() -> int:
    """The cube root of unity for which phi(G) + [z^2]G == infinity on the
    standard generator (same calibration as native/bls_native.cpp:948)."""
    from ..golden import curve as gc
    from ..golden import field as gf

    s = gf.fp_sqrt((P_MOD - 3) % P_MOD)
    assert s is not None
    inv2 = pow(2, -1, P_MOD)
    g = gc.g1_generator()
    z2g = gc.g1_scalar_mul(gc.g1_scalar_mul(g, Z_ABS), Z_ABS)
    for beta in ((-1 + s) * inv2 % P_MOD, (-1 - s) * inv2 % P_MOD):
        phi = (beta * g[0] % P_MOD, g[1])
        if gc.g1_add(phi, z2g) is None:
            return beta
    raise AssertionError("no cube root satisfies the subgroup criterion")


def _mul_z_abs(curve, p):
    """[|z|] p via a double-and-add lax.scan (MSB first, 63 steps).

    A statically unrolled chain (|z| has Hamming weight 6: 63 doublings +
    5 adds, no selects) is ~2.5x cheaper at runtime but its ~100k-op HLO
    graph takes >15 min to compile per batch-bucket shape — the scan body
    is traced once, keeping the decode graph compile-friendly on the
    remote TPU compiler."""
    bits = np.asarray([(Z_ABS >> i) & 1 for i in range(62, -1, -1)],
                      dtype=np.uint32)

    def body(acc, bit):
        acc2 = curve.double(acc)
        acc3 = curve.add(acc2, p)
        return curve.select(bit == 1, acc3, acc2), None

    out, _ = jax.lax.scan(body, p, bits)
    return out


def decode_g1_graph(curve, x_normal, sign, inf, subgroup_check: bool = True):
    """The decode computation, traceable inside any caller graph (the
    fused verify graphs inline it so decode + fold-MSMs are ONE dispatch).

    x_normal [B, 24] u32, sign/inf [B] bool (from
    parse_g1_compressed_batch).  Returns (x_mont, y_mont, inf, ok)."""
    F = curve.F
    b_mont = F.from_int(G1_B)
    half_plus = int_to_limbs((P_MOD + 1) // 2, F.n)
    sqrt_exp = (P_MOD + 1) // 4

    x = F.to_mont(x_normal)
    y2 = F.add(F.mul(F.sqr(x), x), b_mont)
    y = F.pow_const_windowed(y2, sqrt_exp)
    on_curve = F.eq(F.mul(y, y), y2) | inf
    # lexicographic sign: flag set -> pick the larger root
    y_norm = F.from_mont(y)
    _, borrow = F._sub_raw(y_norm, jnp.broadcast_to(
        half_plus, y_norm.shape))
    is_larger = borrow == 0          # y >= (p+1)/2
    y = F.select(is_larger ^ sign, F.neg(y), y)
    ok = on_curve
    if subgroup_check:
        beta_mont = F.from_int(_calibrated_beta())
        pj = curve.from_affine(x, y, inf)
        z2p = _mul_z_abs(curve, _mul_z_abs(curve, pj))
        phi = curve.from_affine(F.mul(beta_mont, x), y, inf)
        ok = ok & (curve.is_infinity(curve.add(phi, z2p)) | inf)
    zero = jnp.zeros_like(x)
    x_out = jnp.where(inf[..., None], zero, x)
    y_out = jnp.where(inf[..., None], zero, y)
    return x_out, y_out, inf, ok


class DeviceG1Decoder:
    """Batched device decode graphs, cached per (batch, subgroup_check)."""

    def __init__(self, curve):
        self.curve = curve
        self.F = curve.F
        self._jits = {}

    def _build(self, subgroup_check: bool):
        curve = self.curve

        def run(x_normal, sign, inf):
            return decode_g1_graph(curve, x_normal, sign, inf,
                                   subgroup_check)

        return jax.jit(run)

    def decode(self, datas, subgroup_check: bool = True):
        """48-byte encodings -> (x_mont, y_mont, inf) device arrays [B, ...]
        + host ok mask [B] (False = not on curve / not in subgroup).  Wire
        format violations raise G1DecompressError immediately."""
        x_limbs, sign, inf = parse_g1_compressed_batch(datas)
        fn = self._jits.get(subgroup_check)
        if fn is None:
            fn = self._jits[subgroup_check] = self._build(subgroup_check)
        x, y, inf_d, ok = fn(jnp.asarray(x_limbs), jnp.asarray(sign),
                             jnp.asarray(inf))
        return x, y, inf_d, np.asarray(ok)
