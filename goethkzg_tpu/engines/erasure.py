"""Reed-Solomon block-erasure recovery for PeerDAS cells.

TPU-native rebuild of the reference recovery pipeline
(reference: internal/erasure_code/erasure_code.go): the vanishing-polynomial
construction is a tiny host-side big-int product (<= 64 linear factors,
erasure_code.go:151-164); the five 8192-point transforms (forward, inverse,
two coset-forward, one coset-inverse) and the pointwise divide run as one
fused device kernel over the extended domain.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (CELLS_PER_EXT_BLOB, R_MOD, RECOVERY_COSET_GEN,
                         SCALARS_PER_BLOB, SCALARS_PER_CELL,
                         SCALARS_PER_EXT_BLOB)
from ..ops.field import fr_spec
from ..ops.ntt import CosetDomain, get_domain


class DataRecovery:
    """reference: erasure_code.go:20-73.

    Production shape is (64, 128) -> 8192-point codeword; the size params
    exist for the small-N CPU differential tests (tests/test_erasure.py).
    """

    def __init__(self, block_size: int = SCALARS_PER_CELL,
                 num_blocks: int = CELLS_PER_EXT_BLOB,
                 coset_gen: int = RECOVERY_COSET_GEN):
        self.fr = fr_spec()
        self.block_size = block_size                 # 64
        self.num_blocks = num_blocks                 # 128
        self.ext_size = block_size * num_blocks      # 8192
        self.poly_size = self.ext_size // 2          # 4096
        self.domain_blocks = get_domain(self.num_blocks)
        self.domain_ext = get_domain(self.ext_size)
        self.coset = CosetDomain(self.domain_ext, coset_gen)
        self._recover_jit = None

    def blocks_needed(self) -> int:
        return self.poly_size // self.block_size     # 64

    def vanishing_poly_coeffs(self, missing_block_indices) -> np.ndarray:
        """Z(X) vanishing on the roots of the missing blocks, expanded to the
        full codeword length (host big-int; <= 64 factors).

        reference: erasure_code.go:75-102.
        """
        fr = self.fr
        roots = [self.domain_blocks.roots_int[i] for i in missing_block_indices]
        poly = [1]
        for x in roots:
            nx = (-x) % R_MOD
            new = [0] * (len(poly) + 1)
            for i, c in enumerate(poly):
                new[i] = (new[i] + c * nx) % R_MOD
                new[i + 1] = (new[i + 1] + c) % R_MOD
            poly = new
        z = np.zeros((self.ext_size, fr.n), dtype=np.uint32)
        for i, c in enumerate(poly):
            z[i * self.block_size] = fr.from_int(c)  # Montgomery
        return z

    def _build_recover(self):
        fr = self.fr
        dext, coset = self.domain_ext, self.coset

        def recover(data_mont, zx_mont):
            """data: [8192, 16] evals with missing slots zeroed (Montgomery);
            zx: vanishing poly coeffs. Returns poly coeffs [4096, 16] Mont."""
            zx_eval = dext.fft(zx_mont)
            ez_eval = fr.mul(data_mont, zx_eval)
            dz_poly = dext.ifft(ez_eval)
            coset_zx = coset.coset_fft(zx_mont)
            coset_dz = coset.coset_fft(dz_poly)
            inv_zx = fr.batch_inv(coset_zx)
            quotient = fr.mul(coset_dz, inv_zx)
            coeffs = coset.coset_ifft(quotient)
            return coeffs[..., :self.poly_size, :]

        return jax.jit(recover)

    def recover_poly_coeffs(self, data_mont, missing_block_indices):
        """Full recovery; returns monomial coefficients [4096, 16] Montgomery.

        reference: erasure_code.go:110-148.
        """
        if self._recover_jit is None:
            self._recover_jit = self._build_recover()
        zx = self.vanishing_poly_coeffs(missing_block_indices)
        return self._recover_jit(data_mont, zx)
