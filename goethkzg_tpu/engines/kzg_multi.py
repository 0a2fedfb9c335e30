"""Multi-point (coset) KZG batch verification for PeerDAS cells.

TPU-native rebuild of verify_cell_kzg_proof_batch
(reference: internal/kzg_multi/kzg_verify.go:16-105, srs.go:60-110):

* the per-cell brp + 64-point coset-IFFT + random-linear-combination fold
  into the interpolation polynomial runs as one batched device kernel over
  all cells (the reference loops cell by cell);
* the three folding MSMs run on device;
* the final 2-pairing check runs on the host golden pairing (one per batch).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (CELLS_PER_EXT_BLOB, R_MOD, SCALARS_PER_CELL,
                         SCALARS_PER_EXT_BLOB)
from ..ops import msm as msm_mod
from ..ops.field import fr_spec
from ..ops.ntt import bitrev_indices, get_domain, root_of_unity


class MultiPointOpeningKey:
    """Coset shifts & scale tables (reference: srs.go:60-110)."""

    def __init__(self, curve, monomial_key_65, g2_points):
        self.curve = curve
        self.fr = fr_spec()
        self.g1_points = monomial_key_65   # (x, y, inf) arrays, >= 64 points
        self.g2_points = g2_points        # golden affine ints
        cs = SCALARS_PER_CELL
        nc = CELLS_PER_EXT_BLOB

        ext = get_domain(SCALARS_PER_EXT_BLOB)
        rev = bitrev_indices(SCALARS_PER_EXT_BLOB)
        roots_brp = [ext.roots_int[i] for i in rev]
        self.coset_shifts = [roots_brp[k * cs] for k in range(nc)]
        self.coset_shifts_pow_cs = [pow(s, cs, R_MOD) for s in self.coset_shifts]

        # per-coset inverse-scale tables for the coset IFFT: inv_shift^i
        fr = self.fr
        tables = np.zeros((nc, cs, fr.n), dtype=np.uint32)
        for k, s in enumerate(self.coset_shifts):
            inv = pow(s, -1, R_MOD)
            v = 1
            for i in range(cs):
                tables[k, i] = fr.from_int(v)
                v = v * inv % R_MOD
        # host numpy constants (device constants stall lowering — field.py)
        self.inv_scale_tables = tables
        self.domain_cs = get_domain(cs)
        self._rev_cs = bitrev_indices(cs)
        self._interp_jit = None

    def _build_interp(self):
        fr = self.fr
        dom = self.domain_cs
        tables = self.inv_scale_tables
        rev = self._rev_cs

        def interp(coset_evals_mont, coset_indices, r_powers_mont):
            """[B, 64, 16] evals (Montgomery), [B] indices, [B, 16] r-powers
            -> folded interpolation poly [64, 16] Montgomery."""
            x = jnp.take(coset_evals_mont, rev, axis=-2)   # brp per cell
            x = dom.ifft(x)
            scale = jnp.take(tables, coset_indices, axis=0)  # [B, 64, 16]
            x = fr.mul(x, scale)
            x = fr.mul(x, r_powers_mont[..., None, :])
            # sum over the batch axis (tree reduction over axis 0)
            x = jnp.moveaxis(x, 0, -3)  # [..., B, 64, 16] -> reduce via loop
            while x.shape[-3] > 1:
                m = x.shape[-3]
                if m % 2 == 1:
                    x = jnp.concatenate(
                        [x, jnp.zeros_like(x[..., :1, :, :])], axis=-3)
                x = fr.add(x[..., 0::2, :, :], x[..., 1::2, :, :])
            return x[..., 0, :, :]

        return jax.jit(interp)

    def fold_interpolation_poly(self, coset_evals_mont, coset_indices,
                                r_powers_mont):
        if self._interp_jit is None:
            self._interp_jit = self._build_interp()
        return self._interp_jit(coset_evals_mont, coset_indices, r_powers_mont)
