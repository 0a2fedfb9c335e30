"""Public API: the Context object and the EIP-4844 surface.

TPU-native re-design of the reference public layer (reference: api.go,
prove.go, verify.go).  Byte-level (de)serialization and Fiat-Shamir run on
host; all polynomial/group math runs in jitted device kernels.  Heavy
device graphs are compiled lazily per (operation, padded batch size) and
cached by jit + the persistent compilation cache.

The `numGoRoutines` knob of the reference is intentionally gone — the
parallelism model is the device mesh (see parallel/), per SURVEY.md §7.3.
"""

import secrets

import jax
import jax.numpy as jnp
import numpy as np

from . import fiatshamir, serialization
from .constants import (BYTES_PER_BLOB, R_MOD, SCALARS_PER_BLOB,
                        SCALARS_PER_CELL, SCALARS_PER_EXT_BLOB)
from .engines import kzg as kzg_engine
from .errors import (ErrBatchLengthCheck, ErrVerifyOpeningProof, KZGError)
from .golden import curve as gcurve
from .golden import pairing as gpairing
from .ops import msm as msm_mod
from .ops.curve import CurveOps
from .ops.field import fp_spec, fr_spec, int_to_limbs
from .ops.ntt import bitrev_indices, get_domain
from .trusted_setup import (DEFAULT_SETUP_PATH, load_trusted_setup_json,
                            parse_trusted_setup)
from .utils import jaxcfg  # noqa: F401  (configures the compilation cache)


def _pad_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class Context:
    """Holds all precomputed state (reference: api.go:17-28)."""

    def __init__(self, setup: dict | None = None, use_cache: bool = True):
        if setup is None:
            setup = load_trusted_setup_json(DEFAULT_SETUP_PATH)
        parsed = parse_trusted_setup(setup, cache=use_cache)

        self.fr = fr_spec()
        self.fp = fp_spec()
        self.curve = CurveOps(self.fp)

        # --- domains (brp convention, reference api.go:127-135) -------------
        self.domain = get_domain(SCALARS_PER_BLOB)
        self.domain_ext = get_domain(SCALARS_PER_EXT_BLOB)
        rev = bitrev_indices(SCALARS_PER_BLOB)
        roots = np.asarray(self.domain.roots_natural)
        self.roots_brp = jnp.asarray(roots[rev])
        inv_idx = (-np.arange(SCALARS_PER_BLOB)) % SCALARS_PER_BLOB
        self.roots_brp_inv = jnp.asarray(roots[inv_idx][rev])

        # --- commit keys ------------------------------------------------------
        lx, ly, linf = parsed.g1_lagrange
        self.lagrange_brp = (jnp.asarray(lx[rev]), jnp.asarray(ly[rev]),
                             jnp.asarray(linf[rev]))
        self.monomial_key = tuple(jnp.asarray(a) for a in parsed.g1_monomial)

        # --- opening keys (golden affine ints for the pairing side) ----------
        self.gen_g1 = gcurve.g1_generator()
        self.gen_g2 = parsed.g2_monomial_ints[0]
        self.alpha_g2 = parsed.g2_monomial_ints[1]
        self.g2_points = parsed.g2_monomial_ints

        self._jits = {}

    # ------------------------------------------------------------------ utils
    def _jit(self, key, builder):
        if key not in self._jits:
            self._jits[key] = builder()
        return self._jits[key]

    def _commit_fn(self):
        curve = self.curve

        def commit(points, scalars_normal):
            res = jax.vmap(lambda s: msm_mod.msm(curve, points, s),
                           in_axes=0)(scalars_normal)
            return curve.to_affine(res)

        return jax.jit(commit)

    def _open_fn(self):
        fr, curve = self.fr, self.curve
        roots, roots_inv = self.roots_brp, self.roots_brp_inv
        n_inv = self.domain.n_inv_mont

        def open_(points, poly_normal, z_normal):
            poly = fr.to_mont(poly_normal)
            z = fr.to_mont(z_normal)
            y, q = kzg_engine.quotient_poly(roots, roots_inv, n_inv, poly, z)
            q_normal = fr.from_mont(q)
            res = jax.vmap(lambda s: msm_mod.msm(curve, points, s))(q_normal)
            return fr.from_mont(y), curve.to_affine(res)

        return jax.jit(open_)

    def _eval_fn(self):
        fr = self.fr
        roots, roots_inv = self.roots_brp, self.roots_brp_inv
        n_inv = self.domain.n_inv_mont

        def eval_(poly_normal, z_normal):
            poly = fr.to_mont(poly_normal)
            z = fr.to_mont(z_normal)
            y, _, _, _ = kzg_engine.eval_lagrange(roots, roots_inv, n_inv,
                                                  poly, z)
            return fr.from_mont(y)

        return jax.jit(eval_)

    def _fold_msm_fn(self):
        curve = self.curve

        def fold(px, py, pinf, scalars_normal):
            res = msm_mod.msm(curve, (px, py, pinf), scalars_normal)
            return curve.to_affine(tuple(c[None] for c in res))

        return jax.jit(fold)

    def _affine_to_golden(self, ax, ay, ainf, i=0):
        if bool(ainf[i]):
            return None
        return (self.fp.to_int(np.asarray(ax[i])), self.fp.to_int(np.asarray(ay[i])))

    # ------------------------------------------------------- EIP-4844 provers
    def blob_to_kzg_commitment(self, blob: bytes) -> bytes:
        """reference: prove.go:13."""
        poly = serialization.deserialize_blob(blob)
        commit = self._jit("commit", self._commit_fn)
        ax, ay, ainf = commit(self.lagrange_brp, jnp.asarray(poly[None]))
        return serialization.serialize_g1(self._affine_to_golden(ax, ay, ainf))

    def blob_to_kzg_commitment_batch(self, blobs) -> list:
        polys = np.stack([serialization.deserialize_blob(b) for b in blobs])
        commit = self._jit("commit", self._commit_fn)
        ax, ay, ainf = commit(self.lagrange_brp, jnp.asarray(polys))
        return [serialization.serialize_g1(self._affine_to_golden(ax, ay, ainf, i))
                for i in range(len(blobs))]

    def compute_kzg_proof(self, blob: bytes, z_bytes: bytes):
        """Returns (proof, y) serialized. reference: prove.go:85."""
        poly = serialization.deserialize_blob(blob)
        z = serialization.deserialize_scalar(z_bytes)
        open_ = self._jit("open", self._open_fn)
        y, (ax, ay, ainf) = open_(self.lagrange_brp, jnp.asarray(poly[None]),
                                  jnp.asarray(z[None]))
        proof = serialization.serialize_g1(self._affine_to_golden(ax, ay, ainf))
        y_bytes = serialization.serialize_fr_normal(np.asarray(y[0]))
        return proof, y_bytes

    def compute_blob_kzg_proof(self, blob: bytes, commitment: bytes) -> bytes:
        """reference: prove.go:46."""
        poly = serialization.deserialize_blob(blob)
        # subgroup-check the commitment (validation only)
        serialization.deserialize_g1(commitment, subgroup_check=True)
        challenge = fiatshamir.compute_challenge_limbs(bytes(blob), bytes(commitment))
        open_ = self._jit("open", self._open_fn)
        _, (ax, ay, ainf) = open_(self.lagrange_brp, jnp.asarray(poly[None]),
                                  jnp.asarray(challenge[None]))
        return serialization.serialize_g1(self._affine_to_golden(ax, ay, ainf))

    # ----------------------------------------------------- EIP-4844 verifiers
    def verify_kzg_proof(self, commitment: bytes, z_bytes: bytes,
                         y_bytes: bytes, proof: bytes) -> None:
        """Raises on failure; ErrVerifyOpeningProof iff the pairing fails.

        reference: verify.go:12, internal/kzg/kzg_verify.go:35.
        """
        z = int.from_bytes(self._check_scalar(z_bytes), "big")
        y = int.from_bytes(self._check_scalar(y_bytes), "big")
        comm = serialization.deserialize_g1(commitment)
        quotient = serialization.deserialize_g1(proof)
        self._verify_opening(comm, z, y, quotient)

    def _check_scalar(self, b: bytes) -> bytes:
        serialization.deserialize_scalar(b)  # canonicality
        return bytes(b)

    def _verify_opening(self, comm, z: int, y: int, quotient):
        # [alpha - z]G2 ; [f(alpha) - y]G1 ; e(C - [y]G1, -G2) e(W, [a-z]G2) == 1
        z_g2 = gcurve.g2_scalar_mul(self.gen_g2, z)
        alpha_minus_z = gcurve.g2_add(self.alpha_g2, gcurve.g2_neg(z_g2))
        y_g1 = gcurve.g1_scalar_mul(self.gen_g1, y)
        c_minus_y = gcurve.g1_add(comm, gcurve.g1_neg(y_g1))
        ok = gpairing.pairing_check([
            (c_minus_y, gcurve.g2_neg(self.gen_g2)),
            (quotient, alpha_minus_z),
        ])
        if not ok:
            raise ErrVerifyOpeningProof()

    def verify_blob_kzg_proof(self, blob: bytes, commitment: bytes,
                              proof: bytes) -> None:
        """reference: verify.go:48."""
        self.verify_blob_kzg_proof_batch([blob], [commitment], [proof])

    def verify_blob_kzg_proof_batch(self, blobs, commitments, proofs) -> None:
        """RLC-folded batch verification (reference: verify.go:88,
        internal/kzg/kzg_verify.go:111-202)."""
        if len(blobs) != len(commitments) or len(blobs) != len(proofs):
            raise ErrBatchLengthCheck()
        batch = len(blobs)
        if batch == 0:
            return

        polys = np.stack([serialization.deserialize_blob(b) for b in blobs])
        comms = [serialization.deserialize_g1(c) for c in commitments]
        quotients = [serialization.deserialize_g1(p) for p in proofs]
        challenges = np.stack([
            fiatshamir.compute_challenge_limbs(bytes(b), bytes(c))
            for b, c in zip(blobs, commitments)])

        # evaluate every blob at its challenge (data-parallel device kernel)
        eval_ = self._jit("eval", self._eval_fn)
        pad = _pad_pow2(batch)
        polys_p = np.concatenate([polys] + [polys[:1]] * (pad - batch))
        chal_p = np.concatenate([challenges] + [challenges[:1]] * (pad - batch))
        ys = np.asarray(eval_(jnp.asarray(polys_p), jnp.asarray(chal_p)))[:batch]
        y_ints = [self.fr.to_int(ys[i], mont=False) for i in range(batch)]
        z_ints = [self.fr.to_int(challenges[i], mont=False) for i in range(batch)]

        if batch == 1:
            self._verify_opening(comms[0], z_ints[0], y_ints[0], quotients[0])
            return
        self._batch_verify_multipoints(comms, quotients, z_ints, y_ints)

    # Alias for the reference's goroutine-parallel variant (verify.go:152) —
    # here the batch path is already data-parallel on device.
    verify_blob_kzg_proof_batch_par = verify_blob_kzg_proof_batch

    def _fold_msm_host(self, points, scalar_ints):
        """Device MSM over wire points with host scalars; returns golden affine."""
        pad = _pad_pow2(len(points))
        pts = points + [None] * (pad - len(points))
        sc = scalar_ints + [0] * (pad - len(scalar_ints))
        px, py, pinf = serialization.g1_points_to_device_arrays(pts)
        slimbs = np.stack([int_to_limbs(s, 16) for s in sc])
        fold = self._jit("fold_msm", self._fold_msm_fn)
        ax, ay, ainf = fold(jnp.asarray(px), jnp.asarray(py),
                            jnp.asarray(pinf), jnp.asarray(slimbs))
        return self._affine_to_golden(ax, ay, ainf)

    def _batch_verify_multipoints(self, comms, quotients, z_ints, y_ints):
        """reference: internal/kzg/kzg_verify.go:111-202."""
        batch = len(comms)
        r = secrets.randbelow(R_MOD - 1) + 1
        r_powers = [1]
        for _ in range(batch - 1):
            r_powers.append(r_powers[-1] * r % R_MOD)

        folded_quotients = self._fold_msm_host(quotients, r_powers)
        folded_comms = self._fold_msm_host(comms, r_powers)
        folded_evals = 0
        for ri, yi in zip(r_powers, y_ints):
            folded_evals = (folded_evals + ri * yi) % R_MOD
        folded_evals_commit = gcurve.g1_scalar_mul(self.gen_g1, folded_evals)
        f = gcurve.g1_add(folded_comms, gcurve.g1_neg(folded_evals_commit))
        rz = [ri * zi % R_MOD for ri, zi in zip(r_powers, z_ints)]
        folded_points_quotients = self._fold_msm_host(quotients, rz)
        lhs1 = gcurve.g1_add(f, folded_points_quotients)
        lhs2 = gcurve.g1_neg(folded_quotients)
        ok = gpairing.pairing_check([
            (lhs1, self.gen_g2),
            (lhs2, self.alpha_g2),
        ])
        if not ok:
            raise ErrVerifyOpeningProof()


def new_context_4096_secure(use_cache: bool = True) -> Context:
    """reference: api.go:53."""
    return Context(None, use_cache=use_cache)
