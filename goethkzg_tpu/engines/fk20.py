"""FK20 multi-proof engine: all 128 coset proofs, zero runtime G1 FFTs.

TPU-native rebuild of the reference FK20
(reference: internal/kzg_multi/fk20/fk20.go, toeplitz.go).  Round 2
replaces the round-1 runtime G1 FFT/IFFT pipeline — whose 256-step
double-and-add twiddle scalar-muls dominated the cells path — with two
batched MSM stages built on the fused Pallas kernels:

* **stage 1 (Toeplitz h-commitments)**: the 128 per-frequency MSMs of
  size 64 against the FFT'd SRS vectors (toeplitz.go:114) have FIXED
  bases, so they run as ONE fixed-base table-MSM kernel call
  (ops/pallas_tablemsm.py, 4-bit signed digits, lane = frequency): each
  lane streams selected precomputed multiples d * 2^(4w) * T[k, v] into
  a VMEM-resident accumulator — no buckets, no reduction;

* **stage 2 (proof map)**: the reference's IfftG1 -> truncate -> pad ->
  FftG1 -> BitReverse chain (fk20.go:76-90, toeplitz.go:121) is an
  Fr-LINEAR map L of the 128 stage-1 results:

      proofs[i] = sum_k c[i,k] * h_ext[k],
      c[i,k] = (1/128) * S(brp(i) - k),   S(t) = sum_{j<64} w^{tj}

  with w the order-128 root of unity.  S(t) telescopes: S(0) = 64,
  S(even != 0) = 0, S(odd) = -2/(w^t - 1) — so each proof depends on
  only 65 of the 128 points.  The compacted 65-column matrix is
  precomputed at setup and the map runs as a batched variable-point MSM
  on the generalized bucket kernel (ops/pallas_msm2.py).

Both stages fall back to the XLA scan MSM (ops/msm.py msm_core) off-TPU,
which is also the path the small-N differential tests drive.

All Fr data in Montgomery form on device.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_MOD
from .. import constants as C
from ..ops import msm as msm_mod
from ..ops import proj
from ..ops.field import fr_spec, int_to_limbs
from ..ops.g1fft import get_g1_fft
from ..ops.ntt import bit_reverse, bitrev_indices, get_domain, root_of_unity

STAGE2_PAD = 72          # 65 nonzero columns padded for the kernel layout


def composite_proof_matrix(num_cosets: int):
    """The compacted stage-2 matrix: (k_idx [nc, P], coeffs [nc, P] ints).

    Row i: proofs[i] = sum_p coeffs[i, p] * h_ext[k_idx[i, p]], the closed
    form of brp o FFT o pad o trunc o IFFT (reference fk20.go:76-90); padded
    to P columns with zero coefficients.  Verified against the transform
    oracle in tests/test_fk20.py.
    """
    nc = num_cosets
    half = nc // 2
    w = root_of_unity(nc)
    n_inv = pow(nc, -1, R_MOD)
    rev = bitrev_indices(nc)
    pad_to = STAGE2_PAD if nc == C.CELLS_PER_EXT_BLOB else half + 1
    k_idx = np.zeros((nc, pad_to), dtype=np.int64)
    coeffs = np.zeros((nc, pad_to), dtype=object)
    coeffs[:] = 0
    for i in range(nc):
        m = int(rev[i])
        cols = []
        # S(0) = half  (k == m)
        cols.append((m, half * n_inv % R_MOD))
        for k in range(nc):
            t = (m - k) % nc
            if t % 2 == 1:          # S(odd t) = -2 / (w^t - 1)
                s = (-2) * pow((pow(w, t, R_MOD) - 1) % R_MOD, -1, R_MOD)
                cols.append((k, s % R_MOD * n_inv % R_MOD))
        assert len(cols) == half + 1
        for p, (k, s) in enumerate(cols):
            k_idx[i, p] = k
            coeffs[i, p] = s
    return k_idx, coeffs


class FK20:
    def __init__(self, curve, monomial_key, cache_path: str | None = None,
                 poly_size: int = C.SCALARS_PER_BLOB,
                 coset_size: int = C.SCALARS_PER_CELL):
        """monomial_key: (x, y, inf) limb arrays of the poly_size monomial
        G1 points.  Production sizes (4096/64) ride the Pallas kernels;
        other sizes use the XLA fallback (small-N differential tests)."""
        self.curve = curve
        self.fr = fr_spec()
        self.poly_size = poly_size
        self.coset_size = coset_size
        self.ext_size = 2 * poly_size
        self.num_cosets = self.ext_size // coset_size
        self.domain_ext = get_domain(self.ext_size)
        self.circulant_domain = get_domain(2 * coset_size)

        self.table = self._build_srs_table(monomial_key, cache_path)
        self._s1_table = None        # lazy fixed-base digit table (TPU)
        self._s1_table_rns = None    # u16 RNS form (pallas_rns kernel)
        self._rns_s1 = os.environ.get("GOETHKZG_RNS_FK20", "0") == "1"

        # Toeplitz gather: reversed poly, stride-cs split -> rows [cs, cs];
        # circulant row c = col ++ [0, row[cs-1..1]]  (toeplitz.go:17-31).
        n = poly_size
        cs = coset_size
        rows = np.zeros((cs, cs), dtype=np.int64)  # rows[v][j]: poly index
        for v in range(cs):
            for j in range(cs):
                rows[v, j] = (n - 1) - (v + cs * j)  # reversed, every cs-th
        circ_idx = np.zeros((cs, 2 * cs), dtype=np.int64)
        circ_msk = np.zeros((cs, 2 * cs), dtype=np.uint32)
        for v in range(cs):
            circ_idx[v, 0] = rows[v, 0]
            circ_msk[v, 0] = 1
            for i in range(1, cs):
                circ_idx[v, cs + i] = rows[v, cs - i]
                circ_msk[v, cs + i] = 1
        # host numpy constants (device constants stall lowering — field.py)
        self._circ_idx = circ_idx
        self._circ_msk = circ_msk[..., None].astype(bool)

        # stage-2 compacted composite matrix (host ints -> digit rows)
        k_idx, coeffs = composite_proof_matrix(self.num_cosets)
        self._s2_k_idx = k_idx                              # [nc, P]
        self._s2_scalars = np.stack(
            [np.stack([int_to_limbs(int(c), 16) for c in row])
             for row in coeffs])                            # [nc, P, 16]

    # ------------------------------------------------------------- SRS table
    def _build_srs_table(self, monomial_key, cache_path):
        """FFT'd SRS vectors, transposed: point arrays [2cs, cs].

        reference: toeplitz.go:50-113 (setup-time G1 FFTs — the only place
        a G1 FFT remains, and it is cached on disk).
        """
        if cache_path and os.path.exists(cache_path):
            z = np.load(cache_path)
            return (z["tx"], z["ty"], z["tinf"])

        mx, my, minf = (np.asarray(a) for a in monomial_key)
        cs = self.coset_size
        n = mx.shape[0]
        # reverse, drop first cs, stride-cs -> [cs, n/cs - 1], pad to [cs, 2cs]
        idx = np.zeros((cs, 2 * cs), dtype=np.int64)
        msk = np.zeros((cs, 2 * cs), dtype=bool)
        for v in range(cs):
            col = 0
            for j in range(v, n - cs, cs):
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
        tx, ty, tinf = (np.swapaxes(np.asarray(a), 0, 1) for a in (tx, ty, tinf))
        if cache_path:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            np.savez_compressed(cache_path, tx=tx, ty=ty, tinf=tinf)
        return (tx, ty, tinf)

    def _production_kernel_path(self) -> bool:
        from ..ops.field import _pallas_enabled
        return (_pallas_enabled()
                and self.coset_size == C.SCALARS_PER_CELL
                and self.poly_size == C.SCALARS_PER_BLOB)

    @property
    def s1_table(self):
        """Fixed-base 4-bit digit table of the FFT'd SRS (built on device
        once per process; graphs ride the persistent compile cache)."""
        if self._s1_table is None:
            from ..ops import pallas_tablemsm as ptm
            tx, ty, tinf = self.table         # [2cs, cs] points
            assert not bool(np.asarray(tinf).any()), \
                "FFT'd SRS vectors contain no infinities for the 4096 setup"
            # flatten [k, v] -> i = v*L + k (lane = frequency k)
            fx = np.swapaxes(np.asarray(tx), 0, 1).reshape(-1, tx.shape[-1])
            fy = np.swapaxes(np.asarray(ty), 0, 1).reshape(-1, ty.shape[-1])
            finf = np.swapaxes(np.asarray(tinf), 0, 1).reshape(-1)
            self._s1_table = ptm.build_table_device(
                self.curve, (fx, fy, finf), wbits=4, pair_order="vW")
        return self._s1_table

    @property
    def s1_table_rns(self):
        """u16 RNS residues of the stage-1 digit table (pallas_rns path);
        the positional copy is dropped after conversion."""
        if self._s1_table_rns is None:
            from ..ops import pallas_rns
            from ..ops.rns import fp_rns
            from ..ops.rns_jax import RNSOps
            tx, ty = self.s1_table
            self._s1_table_rns = pallas_rns.build_rns_table(
                RNSOps(fp_rns()), tx, ty)
            self._s1_table = None
        return self._s1_table_rns

    def production_table(self):
        """The stage-1 digit table as eager device arrays, or None off the
        production kernel path.

        Graph builders MUST fetch this outside their jit and thread it
        through as an ARGUMENT: a lazy build during tracing caches TRACERS
        on this object (UnexpectedTracerError on the next shape), building
        eagerly but closing over the arrays embeds ~0.4 GB of table as HLO
        constants (the axon remote-compile service rejects the module with
        HTTP 413), and the pre-round-5 inline build re-executed the whole
        table construction on EVERY call."""
        if not self._production_kernel_path():
            return None
        return self.s1_table_rns if self._rns_s1 else self.s1_table

    # ------------------------------------------------------------------ device
    def extended_evaluations(self, poly_coeff_mont):
        """Evaluate on all cosets: [..., N, 16] -> [..., nc, cs, 16].

        reference: fk20.go:58-70 (pad, ext FFT, brp, partition).
        """
        fr = self.fr
        lead = poly_coeff_mont.shape[:-2]
        pad = jnp.zeros(lead + (self.ext_size - self.poly_size, fr.n),
                        dtype=jnp.uint32)
        padded = jnp.concatenate([poly_coeff_mont, pad], axis=-2)
        evals = self.domain_ext.fft(padded)
        evals = bit_reverse(evals, axis=-2)
        return evals.reshape(lead + (self.num_cosets, self.coset_size, fr.n))

    def _toeplitz_scalars(self, poly_coeff_mont):
        """Per-frequency MSM scalars: [B, N, 16] -> [B, 2cs, cs, 16] normal."""
        fr = self.fr
        circ = jnp.take(poly_coeff_mont, self._circ_idx, axis=-2)
        circ = jnp.where(self._circ_msk, circ, jnp.zeros_like(circ))
        fft_rows = self.circulant_domain.fft(circ)   # [..., cs, 2cs, 16]
        scalars = jnp.swapaxes(fft_rows, -3, -2)     # [..., 2cs, cs, 16]
        return fr.from_mont(scalars)

    def multi_open_proofs(self, poly_coeff_mont, s1_table=None):
        """All nc coset proofs (Jacobian tuple, lane axis nc).

        s1_table: the production_table() arrays threaded through the
        caller's jit boundary (see production_table for why); None falls
        back to the lazy properties (eager callers only).

        reference: fk20.go:76-124, toeplitz.go:95-125 — rebuilt as the two
        MSM stages described in the module docstring.
        """
        fr, curve = self.fr, self.curve
        cs, nc = self.coset_size, self.num_cosets
        F = curve.F

        lead = poly_coeff_mont.shape[:-2]
        flat_in = poly_coeff_mont.reshape((-1, self.poly_size, fr.n))
        B = flat_in.shape[0]
        scalars = self._toeplitz_scalars(flat_in)    # [B, nc, cs, 16]

        if self._production_kernel_path():
            from ..ops import pallas_tablemsm as ptm
            packed = ptm.pack_digits_outputs(scalars, wbits=4)
            if self._rns_s1:
                from ..ops import pallas_rns
                from ..ops.msm import rns_acc_to_proj
                from ..ops.rns import fp_rns
                from ..ops.rns_jax import RNSOps
                spec = fp_rns()
                tbl = (s1_table if s1_table is not None
                       else self.s1_table_rns)
                acc = pallas_rns.rns_table_msm(spec, tbl,
                                               packed)   # [B, nc, 2k]
                hx, hy, hz = rns_acc_to_proj(F, RNSOps(spec), acc)
            else:
                tbl = s1_table if s1_table is not None else self.s1_table
                hx, hy, hz = ptm.table_msm(F, tbl, packed)
            # [B, nc(lane=k), n] projective
        else:
            tx, ty, tinf = self.table
            res = msm_mod.msm_instances(
                curve, (tx, ty, tinf),
                scalars.reshape(B * nc, cs, fr.n),
                points_sel=("mod", nc), wbits=4)
            hx, hy, hz = proj.from_jacobian(F, res)
            hx = hx.reshape(B, nc, F.n)
            hy = hy.reshape(B, nc, F.n)
            hz = hz.reshape(B, nc, F.n)

        # projective -> affine + infinity mask for stage 2
        zinv = F.batch_inv(hz)
        h_inf = F.is_zero(hz)
        hax = F.mul(hx, zinv)
        hay = F.mul(hy, zinv)

        # gather each output's 65 contributing points:  [B, nc, P]
        gx = jnp.take(hax, self._s2_k_idx, axis=1)
        gy = jnp.take(hay, self._s2_k_idx, axis=1)
        ginf = jnp.take(h_inf, self._s2_k_idx, axis=1)
        P = self._s2_k_idx.shape[1]
        pts = (gx.reshape(B * nc, P, F.n), gy.reshape(B * nc, P, F.n),
               ginf.reshape(B * nc, P))
        proofs = msm_mod.msm_instances(
            curve, pts, self._s2_scalars,
            digits_sel=("mod", nc), NI=B * nc, wbits=4)
        return tuple(c.reshape(lead + (nc,) + c.shape[1:]) for c in proofs)
