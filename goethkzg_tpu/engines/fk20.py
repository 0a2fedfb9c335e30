"""FK20 multi-proof engine: all 128 coset proofs in O(n log n).

TPU-native rebuild of the reference FK20
(reference: internal/kzg_multi/fk20/fk20.go, toeplitz.go):

* SRS preprocessing (reverse / truncate / stride-split / pad / G1-FFT /
  transpose, fk20.go:28-35) runs once on device and is cached on disk
  alongside the trusted-setup cache;
* the Toeplitz->circulant embedding and stride splits are precomputed
  static gather indices (one jnp.take instead of host reshuffling);
* the 128 per-frequency MSMs of size 64 (toeplitz.go:114) run as one
  batched bucket-MSM with a 4-bit window (right-sized for N=64);
* the G1 FFT/IFFT butterflies use fixed-twiddle bit-scan kernels
  (ops/g1fft.py).

All Fr data in Montgomery form on device.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (CELLS_PER_EXT_BLOB, SCALARS_PER_BLOB,
                         SCALARS_PER_CELL, SCALARS_PER_EXT_BLOB)
from ..ops import msm as msm_mod
from ..ops.field import fr_spec
from ..ops.g1fft import get_g1_fft
from ..ops.ntt import bit_reverse, bitrev_indices, get_domain


class FK20:
    COSET_SIZE = SCALARS_PER_CELL          # 64
    NUM_COSETS = CELLS_PER_EXT_BLOB        # 128

    def __init__(self, curve, monomial_key, cache_path: str | None = None):
        """monomial_key: (x, y, inf) limb arrays of the 4096 monomial G1 points."""
        self.curve = curve
        self.fr = fr_spec()
        self.domain_ext = get_domain(SCALARS_PER_EXT_BLOB)
        self.circulant_domain = get_domain(2 * self.COSET_SIZE)  # 128

        self.table = self._build_srs_table(monomial_key, cache_path)

        # Toeplitz gather: reversed poly, stride-64 split -> rows [64, 64];
        # circulant row c = col ++ [0, row[63..1]]  (toeplitz.go:17-31) where
        # col = [row[0], 0...]:
        #   c[0] = row[0]; c[1..63] = 0; c[64] = 0; c[64+i] = row[64-i].
        n = SCALARS_PER_BLOB
        cs = self.COSET_SIZE
        rows = np.zeros((cs, cs), dtype=np.int64)  # rows[v][j] = index into poly
        for v in range(cs):
            for j in range(cs):
                rows[v, j] = (n - 1) - (v + cs * j)  # reversed poly, every cs-th
        circ_idx = np.zeros((cs, 2 * cs), dtype=np.int64)
        circ_msk = np.zeros((cs, 2 * cs), dtype=np.uint32)
        for v in range(cs):
            circ_idx[v, 0] = rows[v, 0]
            circ_msk[v, 0] = 1
            for i in range(1, cs):
                circ_idx[v, cs + i] = rows[v, cs - i]
                circ_msk[v, cs + i] = 1
        self._circ_idx = jnp.asarray(circ_idx)
        self._circ_msk = jnp.asarray(circ_msk[..., None].astype(bool))

    def _build_srs_table(self, monomial_key, cache_path):
        """FFT'd SRS vectors, transposed: point arrays [128, 64]."""
        if cache_path and os.path.exists(cache_path):
            z = np.load(cache_path)
            return (jnp.asarray(z["tx"]), jnp.asarray(z["ty"]),
                    jnp.asarray(z["tinf"]))

        mx, my, minf = (np.asarray(a) for a in monomial_key)
        cs = self.COSET_SIZE
        n = mx.shape[0]
        # reverse, drop first cs, stride-cs -> [cs, n/cs - 1], pad to [cs, 2cs]
        idx = np.zeros((cs, 2 * cs), dtype=np.int64)
        msk = np.zeros((cs, 2 * cs), dtype=bool)
        for v in range(cs):
            col = 0
            for j in range(v, n - cs, cs):
                # reversed srs index: rev[i] = n-1-i ; truncated drops rev 0..cs-1
                idx[v, col] = (n - 1) - (cs + j)
                msk[v, col] = True
                col += 1
        vx = np.where(msk[..., None], mx[idx], 0).astype(np.uint32)
        vy = np.where(msk[..., None], my[idx], 0).astype(np.uint32)
        vinf = np.where(msk, minf[idx], True)

        fftg1 = get_g1_fft(2 * cs)
        curve = self.curve

        @jax.jit
        def run(x, y, inf):
            jac = curve.from_affine(x, y, inf)
            out = fftg1.fft(jac)
            return curve.to_affine(out)

        tx, ty, tinf = run(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vinf))
        # transpose to [2cs frequencies, cs vectors]
        tx, ty, tinf = (np.swapaxes(np.asarray(a), 0, 1) for a in (tx, ty, tinf))
        if cache_path:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            np.savez_compressed(cache_path, tx=tx, ty=ty, tinf=tinf)
        return (jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tinf))

    # ------------------------------------------------------------------ device
    def extended_evaluations(self, poly_coeff_mont):
        """Evaluate on all cosets: [..., 4096, 16] -> [..., 128, 64, 16].

        reference: fk20.go:58-70 (pad, ext FFT, brp, partition).
        """
        fr = self.fr
        lead = poly_coeff_mont.shape[:-2]
        pad = jnp.zeros(lead + (SCALARS_PER_EXT_BLOB - SCALARS_PER_BLOB, fr.n),
                        dtype=jnp.uint32)
        padded = jnp.concatenate([poly_coeff_mont, pad], axis=-2)
        evals = self.domain_ext.fft(padded)
        evals = bit_reverse(evals, axis=-2)
        return evals.reshape(lead + (self.NUM_COSETS, self.COSET_SIZE, fr.n))

    def multi_open_proofs(self, poly_coeff_mont):
        """All 128 coset proofs (Jacobian tuple with lane axis 128).

        reference: fk20.go:76-124, toeplitz.go:95-125.
        """
        fr, curve = self.fr, self.curve
        cs, nc = self.COSET_SIZE, self.NUM_COSETS

        # circulant rows via static gather: [..., 64 rows, 128, 16]
        circ = jnp.take(poly_coeff_mont, self._circ_idx, axis=-2)
        circ = jnp.where(self._circ_msk, circ, jnp.zeros_like(circ))
        # FFT over the circulant axis (128), batched over rows
        fft_rows = self.circulant_domain.fft(circ)  # [..., 64, 128, 16]
        # transpose -> per-frequency scalars [..., 128, 64, 16]
        scalars = jnp.swapaxes(fft_rows, -3, -2)
        scalars_normal = fr.from_mont(scalars)

        # batched MSM over the 128 frequencies (window=4 for N=64);
        # explicit batch axes so the field layer sees 128*64 lanes
        tx, ty, tinf = self.table
        lead = scalars_normal.shape[:-3]
        flat = scalars_normal.reshape((-1, cs, fr.n))   # [L*128, 64, 16]
        reps = flat.shape[0] // nc
        pts = tuple(jnp.tile(c, (reps,) + (1,) * (c.ndim - 1))
                    for c in (tx, ty, tinf))
        res = msm_mod.msm_core(curve, pts, flat, window=4)
        res = tuple(c.reshape(lead + (nc,) + c.shape[1:]) for c in res)
        # res: Jacobian tuple, lane axis (= 128 frequencies) is the last
        # batch dimension — exactly what the G1 FFT kernels expect.
        ifft = get_g1_fft(2 * cs)
        h_ext = ifft.ifft(res)          # [..., 128] points
        # keep first 64 (the h-poly commitments), zero the rest (pad)
        td = curve.F.trailing_dims
        lane_ax = h_ext[2].ndim - td - 1
        keep = (np.arange(2 * cs) < cs)
        keep_b = jnp.asarray(keep.reshape((2 * cs,) + (1,) * td))
        h_padded = tuple(
            jnp.where(keep_b, c, jnp.zeros_like(c)) if i == 2 else c
            for i, c in enumerate(h_ext))
        # (zeroing Z makes the tail the point at infinity)

        proof_fft = get_g1_fft(nc)
        proofs = proof_fft.fft(h_padded)
        # bit-reverse the proofs (fk20.go:90)
        rev = jnp.asarray(bitrev_indices(nc))
        proofs = tuple(jnp.take(c, rev, axis=lane_ax) for c in proofs)
        return proofs
