"""Public API: the Context object and the EIP-4844 surface.

TPU-native re-design of the reference public layer (reference: api.go,
prove.go, verify.go).  Byte-level (de)serialization and Fiat-Shamir run on
host; all polynomial/group math runs in jitted device kernels.  Heavy
device graphs are compiled lazily per (operation, padded batch size) and
cached by jit + the persistent compilation cache.

The `numGoRoutines` knob of the reference is intentionally gone — the
parallelism model is the device mesh (see parallel/), per SURVEY.md §7.3.
"""

import os
import secrets

import jax
import jax.numpy as jnp
import numpy as np

from . import fiatshamir, hostcurve as hc, serialization
from .constants import (BYTES_PER_BLOB, CELLS_PER_EXT_BLOB, R_MOD,
                        SCALARS_PER_BLOB, SCALARS_PER_CELL,
                        SCALARS_PER_EXT_BLOB)
from .engines import kzg as kzg_engine
from .errors import (ErrBatchLengthCheck, ErrVerifyOpeningProof, KZGError)
from .golden import curve as gcurve
from .ops import msm as msm_mod
from .ops.curve import CurveOps
from .ops.field import fp_spec, fr_spec, int_to_limbs
from .ops.ntt import bitrev_indices, get_domain
from .trusted_setup import (DEFAULT_SETUP_PATH, load_trusted_setup_json,
                            parse_trusted_setup)
from .utils import jaxcfg  # noqa: F401  (configures the compilation cache)


def _blob_u8_to_limbs(blob_u8):
    """[..., 131072] raw blob bytes -> [..., 4096, 16] u32 LE 16-bit limbs
    (normal form).  BE 32-byte scalars: limb i = bytes (30-2i, 31-2i)."""
    a = blob_u8.reshape(blob_u8.shape[:-1]
                        + (SCALARS_PER_BLOB, 16, 2)).astype(jnp.uint32)
    return ((a[..., 0] << 8) | a[..., 1])[..., ::-1]


def _pad_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pad_bucket(n: int) -> int:
    """Pad batch sizes to a small fixed set of shapes.

    Every distinct padded shape costs a full XLA compile of the batched
    kernels; bucketing to {1, 8, 32, 64, 128, pow2 beyond} keeps the
    compile count (and the persistent-cache size) tiny; the 32 bucket caps
    the padding overhead for mid-size verification batches at 4x, and the
    64 bucket matters because 64 is THE production batch shape (a 64-blob
    batch padded to 128 doubles the eval work and the poly upload —
    measured as the single largest verify-path regression in r4).
    """
    for b in (1, 8, 32, 64, 128):
        if n <= b:
            return b
    return _pad_pow2(n)


class Context:
    """Holds all precomputed state (reference: api.go:17-28)."""

    def __init__(self, setup: dict | None = None, use_cache: bool = True,
                 check_well_formed: bool = False, mesh=None,
                 mesh_axis: str = "data"):
        """check_well_formed subgroup-checks every setup point before use
        (reference: trusted_setup.go:45-87 — opt-in here because the
        embedded mainnet setup ships pre-validated and the check re-runs
        on every construction otherwise).

        mesh: optional jax.sharding.Mesh — the TPU-native analog of the
        reference's numGoRoutines knob (reference: prove.go:9-13 threads
        parallelism through every prover entry point).  When set, the
        batched public ops (`blob_to_kzg_commitment_batch`,
        `verify_blob_kzg_proof_batch`) run data-parallel over the mesh via
        shard_map (parallel/sharded.py patterns): the blob axis is sharded,
        per-blob kernels are device-local, and the RLC evaluation fold is
        a lazy-carry psum.  Results are bit-identical to the single-device
        path for any mesh shape.
        """
        if setup is None:
            setup = load_trusted_setup_json(DEFAULT_SETUP_PATH)
        if check_well_formed:
            from .trusted_setup import check_trusted_setup_is_well_formed
            check_trusted_setup_is_well_formed(setup)
        parsed = parse_trusted_setup(setup, cache=use_cache)

        self.fr = fr_spec()
        self.fp = fp_spec()
        self.curve = CurveOps(self.fp)

        # --- domains (brp convention, reference api.go:127-135) -------------
        self.domain = get_domain(SCALARS_PER_BLOB)
        self.domain_ext = get_domain(SCALARS_PER_EXT_BLOB)
        rev = bitrev_indices(SCALARS_PER_BLOB)
        roots = np.asarray(self.domain.roots_natural)
        # host numpy: these are closed over by the jitted graphs, and a
        # closed-over DEVICE constant costs a device->host fetch per first
        # lowering (seconds to minutes over a remote-TPU tunnel)
        self.roots_brp = roots[rev]
        inv_idx = (-np.arange(SCALARS_PER_BLOB)) % SCALARS_PER_BLOB
        self.roots_brp_inv = roots[inv_idx][rev]

        # --- commit keys ------------------------------------------------------
        lx, ly, linf = parsed.g1_lagrange
        # device-resident (passed as jit ARGS, so they upload once and every
        # call reuses the committed buffers — unlike closed-over constants)
        self.lagrange_brp = (jnp.asarray(lx[rev]), jnp.asarray(ly[rev]),
                             jnp.asarray(linf[rev]))
        self._lagrange_has_inf = bool(linf.any())
        self.monomial_key = tuple(jnp.asarray(a) for a in parsed.g1_monomial)
        self._monomial_np = tuple(np.asarray(a) for a in parsed.g1_monomial)

        # --- opening keys (golden affine ints for the pairing side) ----------
        self.gen_g1 = gcurve.g1_generator()
        self.gen_g2 = parsed.g2_monomial_ints[0]
        self.alpha_g2 = parsed.g2_monomial_ints[1]
        self.g2_points = parsed.g2_monomial_ints

        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # fixed-base table window width: 4 (8 digit rows, 0.4 GB table) or
        # 8 (128 rows, 3.2 GB) — w8 halves the mixed-add count per commit:
        # measured 107 vs 57 blobs/s kernel-only (tools/sweep.py, r4).  The
        # w8 table builds on device in ~2 min per process (not disk-cached:
        # a 3.2 GB npz would upload slower through the 34 MB/s tunnel than
        # the device build).
        self._commit_wbits = int(os.environ.get("GOETHKZG_COMMIT_WBITS",
                                                "8"))
        # RNS commit kernel (ops/pallas_rns.py): residue arithmetic + MXU
        # base extensions instead of the positional limb kernel — ~4x
        # lower lane-op count per Montgomery mul.  Default since round 5:
        # measured 125 vs 107 blobs/s kernel-side (tools/sweep.py ptable)
        # and bit-exact on-chip vs the vendored vectors.
        self._rns_commit = os.environ.get("GOETHKZG_RNS_COMMIT", "1") == "1"
        self._commit_table_rns = None

        self._setup_digest = parsed.digest
        self._fk20 = None
        self._recovery = None
        self._mp_key = None
        self._commit_table = None
        self._g1_decoder = None
        self._gen_arrays = None
        self._jits = {}

    # -------------------------------------------------- lazy EIP-7594 engines
    @property
    def fk20(self):
        if self._fk20 is None:
            from .engines.fk20 import FK20
            from .trusted_setup import _CACHE_DIR
            import os
            cache = (os.path.join(_CACHE_DIR,
                                  f"fk20_{self._setup_digest}_v1.npz")
                     if self._setup_digest else None)
            self._fk20 = FK20(self.curve, self._monomial_np, cache)
        return self._fk20

    @property
    def recovery(self):
        if self._recovery is None:
            from .engines.erasure import DataRecovery
            self._recovery = DataRecovery()
        return self._recovery

    @property
    def mp_key(self):
        if self._mp_key is None:
            from .engines.kzg_multi import MultiPointOpeningKey
            # numpy slices: these 64 points are closed over by the cell
            # verify graph, so they must not be device arrays (see above)
            key64 = tuple(a[:SCALARS_PER_CELL] for a in self._monomial_np)
            self._mp_key = MultiPointOpeningKey(self.curve, key64,
                                                self.g2_points)
        return self._mp_key

    # ------------------------------------------------------------------ utils
    def _jit(self, key, builder):
        if key not in self._jits:
            self._jits[key] = builder()
        return self._jits[key]

    def _affine_normal(self, res):
        """Jacobian -> (normal-form affine x, y, inf): from_mont on device so
        the host serializer is a straight byte repack (no per-point Python)."""
        ax, ay, ainf = self.curve.to_affine(res)
        return self.fp.from_mont(ax), self.fp.from_mont(ay), ainf

    def _use_commit_table(self) -> bool:
        """Fixed-base table path: TPU only, and only for setups whose
        Lagrange key has no infinity points (any real setup)."""
        from .ops.field import _pallas_enabled
        return _pallas_enabled() and not self._lagrange_has_inf

    @property
    def commit_table(self):
        """4-bit signed-digit multiples of the brp Lagrange key — the
        fixed-base table both prover MSMs stream (reference srs.go:56 keeps
        only the raw key; gnark's generic Pippenger cannot pre-expand a
        fixed base, the TPU kernel can).  ~400 MB in HBM.

        Disk-cached per setup digest: the on-device build costs ~2 min of
        sequential doubling/add scans, while loading the finished table
        from disk and uploading it rides the ~260 MB/s host->device link
        (~2 s) — without this cache the bench/driver budget is spent
        rebuilding an immutable table every process."""
        if self._commit_table is None:
            import os
            from .ops import pallas_tablemsm as ptm
            from .trusted_setup import _CACHE_DIR
            w = self._commit_wbits
            path = (os.path.join(
                _CACHE_DIR,
                f"commit_table_w{w}_{self._setup_digest}_v1.npz")
                if self._setup_digest else None)
            if path and os.path.exists(path):
                with np.load(path) as z:
                    self._commit_table = (jnp.asarray(z["tx"]),
                                          jnp.asarray(z["ty"]))
            else:
                self._commit_table = ptm.build_table_device(
                    self.curve, self.lagrange_brp, wbits=w,
                    windows_per_slice=1 if w >= 8 else 4, pair_order="wN")
                if path and w <= 4:
                    tx, ty = (np.asarray(a) for a in self._commit_table)
                    tmp = path + ".tmp"
                    os.makedirs(_CACHE_DIR, exist_ok=True)
                    np.savez(tmp, tx=tx, ty=ty)
                    # np.savez appends .npz to names without it
                    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz")
                               else tmp, path)
        return self._commit_table

    @property
    def commit_table_rns(self):
        """u16 RNS form of the commit table (pallas_rns kernel path):
        positional digit multiples converted chunk-wise to canonical
        RNS-Montgomery residues; same digest-keyed lifetime as
        commit_table.  The positional table is dropped after conversion
        (the RNS kernel replaces it on this path)."""
        if self._commit_table_rns is None:
            from .ops import pallas_rns
            from .ops.rns import fp_rns
            from .ops.rns_jax import RNSOps
            tx, ty = self.commit_table
            self._commit_table_rns = pallas_rns.build_rns_table(
                RNSOps(fp_rns()), tx, ty)
            self._commit_table = None      # free the positional copy
        return self._commit_table_rns

    def _commit_fn(self):
        curve = self.curve
        if self._use_commit_table():
            w = self._commit_wbits
            use_rns = self._rns_commit

            def commit_t(tx, ty, blob_u8):
                # raw-byte input: the limb unpack runs on device (halves
                # the dominant host->device transfer, see validate_blob_bytes)
                scalars_normal = _blob_u8_to_limbs(blob_u8)
                fixed = (msm_mod.msm_fixed_base_rns if use_rns
                         else msm_mod.msm_fixed_base)
                res = fixed(curve, (tx, ty), scalars_normal, wbits=w)
                return self._affine_normal(res)
            return jax.jit(commit_t)

        def commit(points, scalars_normal):
            res = msm_mod.msm_batched(curve, points, scalars_normal,
                                      shared_points=True)
            return self._affine_normal(res)

        return jax.jit(commit)

    def _commit(self, scalars_normal):
        """Batched commit against the Lagrange brp key ([B, 4096, 16] normal
        scalars -> normal-form affine arrays).  (Non-table paths only —
        the table path goes through _commit_blobs with raw bytes.)"""
        if self.mesh is not None:
            return self._commit_mesh(scalars_normal)
        commit = self._jit("commit", self._commit_fn)
        if self._use_commit_table():
            raise AssertionError("table path takes bytes; use _commit_blobs")
        return commit(self.lagrange_brp, scalars_normal)

    def _commit_blobs(self, blobs):
        """Commit a list of blob byte strings (validates canonicality on
        host; uploads raw bytes on the table path)."""
        if self.mesh is None and self._use_commit_table():
            u8 = np.stack([serialization.validate_blob_bytes(b)
                           for b in blobs])
            commit = self._jit("commit", self._commit_fn)
            tx, ty = (self.commit_table_rns if self._rns_commit
                      else self.commit_table)
            B = u8.shape[0]
            ch = int(os.environ.get("GOETHKZG_COMMIT_CHUNK", "16"))
            if ch and B > ch and B % ch == 0:
                # chunked dispatch: the (async) upload of chunk k+1 rides
                # the tunnel while chunk k's kernel runs — the 8.4 MB/64
                # blob raw-byte upload is the measured e2e floor (PERF.md
                # r4); overlap hides it behind compute.  Bit-identical
                # (blobs are independent).
                parts = [commit(tx, ty, jnp.asarray(u8[s:s + ch]))
                         for s in range(0, B, ch)]
                return tuple(jnp.concatenate([p[i] for p in parts])
                             for i in range(3))
            return commit(tx, ty, jnp.asarray(u8))
        polys = np.stack([serialization.deserialize_blob(b) for b in blobs])
        return self._commit(jnp.asarray(polys))

    # ------------------------------------------------------------- mesh paths
    def _mesh_pad(self, batch: int) -> int:
        """Batch padded so the mesh axis divides it (and to the compile
        buckets, so mesh and non-mesh paths share shape discipline)."""
        D = self.mesh.devices.size
        p = _pad_bucket(batch)
        return p if p % D == 0 else -(-p // D) * D

    def _commit_mesh_fn(self):
        """Data-parallel batched commit over the Context mesh: blob axis
        sharded, per-blob MSM device-local, zero communication (the
        shard_map analog of reference prove.go:13 + P2, SURVEY §2.5)."""
        from jax.sharding import PartitionSpec as P
        mesh, ax = self.mesh, self.mesh_axis
        curve, fp = self.curve, self.fp

        def local(px, py, pinf, polys):
            B = polys.shape[0]
            bpts = tuple(jnp.broadcast_to(c[None], (B,) + c.shape)
                         for c in (px, py, pinf))
            res = msm_mod.msm_core(curve, bpts, polys, window=8,
                                   vary_axes=(ax,))
            gx, gy, ginf = curve.to_affine(res)
            return fp.from_mont(gx), fp.from_mont(gy), ginf

        return jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(ax)),
            out_specs=(P(ax), P(ax), P(ax)), check_vma=False))

    def _commit_mesh(self, scalars_normal):
        from .parallel.sharded import _pallas_ctx
        B = scalars_normal.shape[0]
        pad = self._mesh_pad(B)
        if pad != B:
            fill = jnp.zeros((pad - B,) + scalars_normal.shape[1:],
                             dtype=scalars_normal.dtype)
            scalars_normal = jnp.concatenate([scalars_normal, fill])
        fn = self._jit("commit_mesh", self._commit_mesh_fn)
        with _pallas_ctx(self.mesh):
            gx, gy, ginf = fn(*self.lagrange_brp, scalars_normal)
        return gx[:B], gy[:B], ginf[:B]

    def _batch_verify_mesh_fn(self):
        """_batch_verify_fn over the Context mesh: the per-blob barycentric
        evals shard on the blob axis; the evaluation fold Σ rᵢ yᵢ is a
        lazy-carry psum (bit-identical to the tree fold: both end
        canonically reduced); the small fold MSMs and the affine tail run
        replicated.  reference: verify.go:152-169 (BatchPar) — here the
        parallel axis is the mesh, and results are mesh-invariant."""
        from jax.sharding import PartitionSpec as P
        from .parallel.sharded import lazy_carry_fr_sum
        fr, curve = self.fr, self.curve
        mesh, axn = self.mesh, self.mesh_axis
        roots, roots_inv = self.roots_brp, self.roots_brp_inv
        n_inv = self.domain.n_inv_mont

        def local(polys_normal, chal_normal, rp_mont, px, py, pinf, scl,
                  fe_mask):
            poly = fr.to_mont(polys_normal)          # local blob shard
            z = fr.to_mont(chal_normal)
            y, _, _, _ = kzg_engine.eval_lagrange(roots, roots_inv, n_inv,
                                                  poly, z)
            fe = lazy_carry_fr_sum(fr, fr.mul(rp_mont, y), axn)
            fe_neg = fr.from_mont(fr.neg(fe))
            scl = jnp.where(fe_mask[..., None], fe_neg[None, None, :], scl)
            res = msm_mod.msm_batched(curve, (px, py, pinf), scl,
                                      shared_points=False, window=4,
                                      chunks=8 if scl.shape[1] % 8 == 0
                                      else None)

            def inst(i):
                return tuple(c[i] for c in res)

            lhs1 = curve.add(inst(0), inst(1))
            lhs2 = curve.neg(inst(2))
            return tuple(jnp.stack([a, b]) for a, b in zip(lhs1, lhs2))

        sh = P(axn)
        return jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(sh, sh, sh, P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()), check_vma=False))

    def _open_fn(self):
        fr, curve = self.fr, self.curve
        roots, roots_inv = self.roots_brp, self.roots_brp_inv
        n_inv = self.domain.n_inv_mont
        use_table = self._use_commit_table()

        use_rns = self._rns_commit

        def open_(points, poly_normal, z_normal):
            poly = fr.to_mont(poly_normal)
            z = fr.to_mont(z_normal)
            y, q = kzg_engine.quotient_poly(roots, roots_inv, n_inv, poly, z)
            q_normal = fr.from_mont(q)
            if use_table:
                fixed = (msm_mod.msm_fixed_base_rns if use_rns
                         else msm_mod.msm_fixed_base)
                res = fixed(curve, points, q_normal,
                            wbits=self._commit_wbits)
            else:
                res = msm_mod.msm_batched(curve, points, q_normal,
                                          shared_points=True)
            return fr.from_mont(y), self._affine_normal(res)

        return jax.jit(open_)

    def _open(self, poly_normal, z_normal):
        """Evaluate + quotient-commit against the Lagrange brp key (the
        same fixed-base table as the commit path — RNS form when the RNS
        kernel is the default, so the positional table is never rebuilt
        after its one-way conversion)."""
        open_ = self._jit("open", self._open_fn)
        if self._use_commit_table():
            table = (self.commit_table_rns if self._rns_commit
                     else self.commit_table)
            return open_(table, poly_normal, z_normal)
        return open_(self.lagrange_brp, poly_normal, z_normal)

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

    def _pairing_fn(self):
        from .ops import pairing as dpair
        tw = dpair.get_tower()

        def check(p1x, p1y, v1, q1x, q1y, p2x, p2y, v2, q2x, q2y):
            return dpair.pairing_check_2(tw, (p1x, p1y), (q1x, q1y), v1,
                                         (p2x, p2y), (q2x, q2y), v2)

        return jax.jit(check)

    def _pairing_check(self, pairs) -> bool:
        """Product-of-two-pairings == 1, on device (reference:
        internal/kzg/kzg_verify.go:88,190, kzg_multi/kzg_verify.go:94).

        pairs: two (g1_affine_ints_or_None, g2_affine_ints_or_None) tuples.
        A pair with an infinity member contributes the identity (gnark
        PairingCheck semantics).

        Default is the native host pairing (~3 ms in C++: shared-squaring
        multi-pair Jacobian Miller loop + Granger-Scott cyclotomic
        squarings in the final exp, hostcurve.py; pure-Python golden
        fallback ~330 ms).
        The pairing is ONE per batch, so its latency is off the throughput
        path; the device pairing (ops/pairing.py, bit-correct) stays as a
        GOETHKZG_DEVICE_PAIRING=1 opt-in for chips-only deployments.
        """
        if os.environ.get("GOETHKZG_DEVICE_PAIRING") != "1":
            return hc.pairing_check(pairs)
        from .ops.field2 import fp2_field
        fp, f2 = self.fp, fp2_field()
        args = []
        for p, q in pairs:
            valid = p is not None and q is not None
            args.append(jnp.asarray(fp.from_int(p[0] if p else 0)))
            args.append(jnp.asarray(fp.from_int(p[1] if p else 0)))
            args.append(jnp.asarray(np.bool_(valid)))
            args.append(jnp.asarray(f2.from_ints(q[0] if q else (0, 0))))
            args.append(jnp.asarray(f2.from_ints(q[1] if q else (0, 0))))
        check = self._jit("pairing", self._pairing_fn)
        return bool(check(*args))

    def _batch_verify_fn(self):
        """The WHOLE RLC batch verification as one device graph (reference:
        internal/kzg/kzg_verify.go:111-202 runs eval + three folds + scalar
        muls as separate CPU steps; here they fuse into a single dispatch).

        Inputs: padded blob polynomials + challenges (for the batched
        barycentric evals), three MSM instances over wire points
        ((comms ∪ {G1}, r ‖ fe-slot), (quotients, r·z), (quotients, r)),
        Montgomery r-powers (zero beyond the live batch), and a mask
        marking the generator slot of instance 0.  The folded evaluation
        scalar  -(Σ rᵢ yᵢ)  is computed on device and injected into the
        generator slot, so no evaluation ever crosses to the host.
        Returns affine (lhs1, lhs2) for the host pairing check.
        """
        fr, curve = self.fr, self.curve
        roots, roots_inv = self.roots_brp, self.roots_brp_inv
        n_inv = self.domain.n_inv_mont

        def run(polys_normal, chal_normal, rp_mont, px, py, pinf, scl,
                fe_mask):
            poly = fr.to_mont(polys_normal)
            z = fr.to_mont(chal_normal)
            y, _, _, _ = kzg_engine.eval_lagrange(roots, roots_inv, n_inv,
                                                  poly, z)
            fe = fr.sum(fr.mul(rp_mont, y), axis=-2)         # Σ rᵢ yᵢ
            fe_neg = fr.from_mont(fr.neg(fe))                # (R - fe) normal
            scl = jnp.where(fe_mask[..., None], fe_neg[None, None, :], scl)
            # window=4 for the small fold MSMs: the one-hot bucket state the
            # scan streams per point is C*W*2^w rows — 8x less HBM traffic
            # than window=8 at N <= a few hundred points, where the bucket
            # stream (not the adds) is the measured cost
            res = msm_mod.msm_batched(curve, (px, py, pinf), scl,
                                      shared_points=False, window=4,
                                      chunks=8 if scl.shape[1] % 8 == 0
                                      else None)

            def inst(i):
                return tuple(c[i] for c in res)

            lhs1 = curve.add(inst(0), inst(1))
            lhs2 = curve.neg(inst(2))
            # Jacobian out: the 2-point affine normalization is a ~29 ms
            # Fermat-inversion scan at 2 lanes (measured, tools/probe_verify);
            # the host converts 2 points in ~0.1 ms (python modinv)
            return tuple(jnp.stack([a, b]) for a, b in zip(lhs1, lhs2))

        return jax.jit(run)

    def _batch_verify_fused_fn(self):
        """Like _batch_verify_fn, but the G1 wire decode (sqrt, sign,
        on-curve + subgroup checks — ops/decompress.py) AND the instance
        assembly run inside the same graph: the whole batch verification
        is ONE device dispatch from wire bytes to the two pairing inputs.

        The decode block holds H = P/2 comms rows then H quotient rows
        (padded on the host with the generator's encoding, zero scalars);
        `batch` never appears in the graph, so distinct live batch sizes
        share one compiled executable per (pad, Q) bucket pair.
        """
        from .ops import decompress as dec_mod
        fr, curve = self.fr, self.curve
        roots, roots_inv = self.roots_brp, self.roots_brp_inv
        n_inv = self.domain.n_inv_mont

        def run(blob_u8, aux):
            # blob_u8 [P, 131072] raw bytes; aux = ONE packed u32 vector
            # (chal, rp, scl, fe, x_limbs, sign, inf) — the tunnel charges
            # ~30-50 ms latency PER transfer, so the eight uploads of the
            # round-3 signature collapse into two
            P = blob_u8.shape[0]
            aux_len = aux.shape[0]
            # M solves: 2*P*16 + 3*M*17 + 2H*26 = aux_len with H = max(M, 128)
            M = next(m for m in (8, 32, 64, 128, 256, 512)
                     if 2 * P * 16 + 3 * m * 17
                     + 2 * max(m, 128) * 26 == aux_len)
            H = max(M, 128)
            o = [0]

            def take(n, shape, dtype=None):
                v = jax.lax.dynamic_slice_in_dim(aux, o[0], n).reshape(shape)
                o[0] += n
                return v

            chal_normal = take(P * 16, (P, 16))
            rp_mont = take(P * 16, (P, 16))
            scl = take(3 * M * 16, (3, M, 16))
            fe_mask = take(3 * M, (3, M)) != 0
            x_limbs = take(2 * H * 24, (2 * H, 24))
            sign = take(2 * H, (2 * H,)) != 0
            infm = take(2 * H, (2 * H,)) != 0
            wx, wy, winf, ok = dec_mod.decode_g1_graph(
                curve, x_limbs, sign, infm, True)
            Q = M
            poly = fr.to_mont(_blob_u8_to_limbs(blob_u8))
            z = fr.to_mont(chal_normal)
            y, _, _, _ = kzg_engine.eval_lagrange(roots, roots_inv, n_inv,
                                                  poly, z)
            fe = fr.sum(fr.mul(rp_mont, y), axis=-2)         # Σ rᵢ yᵢ
            fe_neg = fr.from_mont(fr.neg(fe))                # (R - fe) normal
            scl = jnp.where(fe_mask[..., None], fe_neg[None, None, :], scl)
            px = jnp.stack([wx[:Q], wx[H:H + Q], wx[H:H + Q]])
            py = jnp.stack([wy[:Q], wy[H:H + Q], wy[H:H + Q]])
            pinf = jnp.stack([winf[:Q], winf[H:H + Q], winf[H:H + Q]])
            res = msm_mod.msm_batched(curve, (px, py, pinf), scl,
                                      shared_points=False, window=4,
                                      chunks=8 if scl.shape[1] % 8 == 0
                                      else None)

            def inst(i):
                return tuple(c[i] for c in res)

            lhs1 = curve.add(inst(0), inst(1))
            lhs2 = curve.neg(inst(2))
            both = tuple(jnp.stack([a, b]) for a, b in zip(lhs1, lhs2))
            return both + (ok,)                  # Jacobian out (see above)

        return jax.jit(run)

    def _cell_verify_fn(self):
        """Device graph for verify_cell_kzg_proof_batch (reference:
        internal/kzg_multi/kzg_verify.go:16-105): three folding MSMs over
        the wire points, the batched coset-IFFT interpolation fold, its
        64-point commitment, and the RL combine — one dispatch; only the
        2-pairing check stays on host."""
        fr, curve = self.fr, self.curve
        mp = self.mp_key

        def run(px, py, pinf, scl, evals_normal, idx, rp_mont):
            res = msm_mod.msm_batched(curve, (px, py, pinf), scl,
                                      shared_points=False, window=4,
                                      chunks=8 if scl.shape[1] % 8 == 0
                                      else None)

            def inst(i):
                return tuple(c[i] for c in res)

            interp = mp.fold_interpolation_poly(fr.to_mont(evals_normal),
                                                idx, rp_mont)
            ic = msm_mod.msm(curve, mp.g1_points, fr.from_mont(interp),
                             window=4, chunks=4)
            rl = curve.add(curve.add(inst(1), curve.neg(ic)), inst(2))
            # Jacobian out (host converts 2 points; see _batch_verify_fn)
            return tuple(jnp.stack([a, b]) for a, b in zip(inst(0), rl))

        return jax.jit(run)

    def _cell_verify_fused_fn(self):
        """_cell_verify_fn with the G1 wire decode fused in: one dispatch
        from wire bytes to the two pairing inputs.  Decode block layout:
        H = P/2 proof rows then H commitment rows, generator-padded."""
        from .ops import decompress as dec_mod
        fr, curve = self.fr, self.curve
        mp = self.mp_key

        def run(aux):
            # ONE packed u32 upload (tunnel latency ~30-50 ms/transfer):
            # scl[3,P,16], evals[P,64,16], idx[P], rp[P,16], x_limbs[2H,24],
            # sign[2H], inf[2H] with H = max(P, 128)
            aux_len = aux.shape[0]
            P = next(m for m in (1, 8, 32, 64, 128, 256, 512)
                     if 3 * m * 16 + m * 64 * 16 + m + m * 16
                     + 2 * max(m, 128) * 26 == aux_len)
            H = max(P, 128)
            o = [0]

            def take(n, shape):
                v = aux[o[0]:o[0] + n].reshape(shape)
                o[0] += n
                return v

            scl = take(3 * P * 16, (3, P, 16))
            evals_normal = take(P * 64 * 16, (P, 64, 16))
            idx = take(P, (P,)).astype(jnp.int32)
            rp_mont = take(P * 16, (P, 16))
            x_limbs = take(2 * H * 24, (2 * H, 24))
            sign = take(2 * H, (2 * H,)) != 0
            infm = take(2 * H, (2 * H,)) != 0
            wx, wy, winf, ok = dec_mod.decode_g1_graph(
                curve, x_limbs, sign, infm, True)
            Q = P
            px = jnp.stack([wx[:Q], wx[H:H + Q], wx[:Q]])
            py = jnp.stack([wy[:Q], wy[H:H + Q], wy[:Q]])
            pinf = jnp.stack([winf[:Q], winf[H:H + Q], winf[:Q]])
            res = msm_mod.msm_batched(curve, (px, py, pinf), scl,
                                      shared_points=False, window=4,
                                      chunks=8 if scl.shape[1] % 8 == 0
                                      else None)

            def inst(i):
                return tuple(c[i] for c in res)

            interp = mp.fold_interpolation_poly(fr.to_mont(evals_normal),
                                                idx, rp_mont)
            ic = msm_mod.msm(curve, mp.g1_points, fr.from_mont(interp),
                             window=4, chunks=4)
            rl = curve.add(curve.add(inst(1), curve.neg(ic)), inst(2))
            both = tuple(jnp.stack([a, b]) for a, b in zip(inst(0), rl))
            return both + (ok,)                  # Jacobian out (see above)

        return jax.jit(run)

    @staticmethod
    def _scalar_rows(scalars, pad):
        return np.stack([int_to_limbs(s, 16)
                         for s in scalars + [0] * (pad - len(scalars))])

    # --------------------------------------------------- device wire decode
    def _device_decode_enabled(self) -> bool:
        """Batched G1 decompression on device (ops/decompress.py) instead of
        the native C++ codec: ~230 us/point on this host's single core vs
        one batched dispatch.  GOETHKZG_DEVICE_DECODE=0/1 overrides the
        TPU-only default (CPU XLA compiles of the decode graph are
        minutes-slow, so tests opt in explicitly)."""
        flag = os.environ.get("GOETHKZG_DEVICE_DECODE")
        if flag is not None:
            return flag == "1"
        return jax.default_backend() == "tpu"

    def _decode_g1_device(self, datas, subgroup_check: bool = True):
        """Wire points -> (x, y, inf) Montgomery device arrays [B, ...].
        Error taxonomy matches serialization.deserialize_g1 exactly
        (reference: serialization.go:102-115)."""
        from .ops import decompress as dec_mod
        from .ops.field import _pallas_enabled
        if self._g1_decoder is None:
            self._g1_decoder = dec_mod.DeviceG1Decoder(self.curve)
        B = len(datas)
        P = _pad_bucket(B)
        if _pallas_enabled():
            P = max(P, 256)     # below 256 lanes the field muls fall back
                                # to the HBM-bound jnp path (field.py:218)
        padded = list(datas) + [datas[0]] * (P - B)
        try:
            x, y, inf, ok = self._g1_decoder.decode(padded, subgroup_check)
        except dec_mod.G1DecompressError as e:
            raise gcurve.DeserializationError(str(e)) from None
        if not ok[:B].all():
            i = int(np.argmin(ok[:B]))
            raise gcurve.DeserializationError(
                f"point {i}: not on curve or not in correct subgroup")
        return x[:B], y[:B], inf[:B]

    @property
    def _gen_g1_arrays(self):
        """Generator as Montgomery limb rows (for device-side assembly)."""
        if self._gen_arrays is None:
            gx, gy, _ = serialization.g1_points_to_device_arrays([self.gen_g1])
            self._gen_arrays = (np.asarray(gx[0]), np.asarray(gy[0]))
        return self._gen_arrays

    @property
    def _gen_g1_bytes(self) -> bytes:
        """Generator's compressed encoding — the padding/filler point for
        the fused decode blocks (always decodes valid; padding scalars are
        zero so it contributes the identity to every fold)."""
        if getattr(self, "_gen_bytes", None) is None:
            self._gen_bytes = serialization.serialize_g1(self.gen_g1)
        return self._gen_bytes

    def _parse_wire_blocks(self, block_a, block_b, H: int):
        """Two lists of 48-byte encodings -> decode-graph inputs, each
        block generator-padded to H rows (layout [a(H) ; b(H)])."""
        from .ops import decompress as dec_mod
        g = self._gen_g1_bytes
        padded = (list(block_a) + [g] * (H - len(block_a))
                  + list(block_b) + [g] * (H - len(block_b)))
        try:
            return dec_mod.parse_g1_compressed_batch(padded)
        except dec_mod.G1DecompressError as e:
            raise gcurve.DeserializationError(str(e)) from None

    def _decode_block_rows(self) -> int:
        """Half-height H of the fused decode block: the Pallas field muls
        need >= 256 lanes (field.py:218), so 2H >= 256 on TPU."""
        from .ops.field import _pallas_enabled
        return 128 if _pallas_enabled() else 0

    def _jac_to_golden(self, X, Y, Z, i=0):
        """Montgomery Jacobian device arrays -> golden affine tuple (row i).
        Host-side normalization: 2 python modinvs instead of a ~29 ms
        Fermat-inversion scan at 2 lanes inside the graph."""
        from .golden import field as gf
        from .constants import P_MOD
        x = self.fp.to_int(X[i])
        y = self.fp.to_int(Y[i])
        z = self.fp.to_int(Z[i])
        if z == 0:
            return None
        zi = gf.fp_inv(z)
        zi2 = zi * zi % P_MOD
        return (x * zi2 % P_MOD, y * zi2 % P_MOD * zi % P_MOD)

    def _affine_to_golden(self, ax, ay, ainf, i=0):
        """Normal-form affine device arrays -> golden tuple (row i)."""
        if bool(ainf[i]):
            return None
        return (self.fp.to_int(np.asarray(ax[i]), mont=False),
                self.fp.to_int(np.asarray(ay[i]), mont=False))

    # ------------------------------------------------------- EIP-4844 provers
    def blob_to_kzg_commitment(self, blob: bytes) -> bytes:
        """reference: prove.go:13."""
        ax, ay, ainf = self._commit_blobs([blob])
        return serialization.serialize_g1(self._affine_to_golden(ax, ay, ainf))

    def blob_to_kzg_commitment_batch(self, blobs) -> list:
        ax, ay, ainf = self._commit_blobs(list(blobs))
        return self._serialize_proofs(ax, ay, ainf)

    def compute_kzg_proof(self, blob: bytes, z_bytes: bytes):
        """Returns (proof, y) serialized. reference: prove.go:85."""
        poly = serialization.deserialize_blob(blob)
        z = serialization.deserialize_scalar(z_bytes)
        y, (ax, ay, ainf) = self._open(jnp.asarray(poly[None]),
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
        _, (ax, ay, ainf) = self._open(jnp.asarray(poly[None]),
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
        z_g2 = hc.g2_scalar_mul(self.gen_g2, z)
        alpha_minus_z = hc.g2_add(self.alpha_g2, hc.g2_neg(z_g2))
        y_g1 = hc.g1_scalar_mul(self.gen_g1, y)
        c_minus_y = hc.g1_add(comm, hc.g1_neg(y_g1))
        ok = self._pairing_check([
            (c_minus_y, hc.g2_neg(self.gen_g2)),
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

        use_dev = (batch > 1 and self._device_decode_enabled()
                   and self.mesh is None)
        pad = (self._mesh_pad(batch) if self.mesh is not None
               else _pad_bucket(batch))
        # start the poly upload NOW (async) so it overlaps the host
        # hashing/decoding below — it is the largest host->device transfer
        # on this path, and the tunnel runs at ~40 MB/s (measured).  The
        # fused device path uploads RAW BYTES (8.4 MB per 64 blobs, half
        # the unpacked-limb size) and unpacks on device.
        if use_dev:
            u8 = np.stack([serialization.validate_blob_bytes(b)
                           for b in blobs])
            u8_p = np.concatenate([u8] + [u8[:1]] * (pad - batch))
            polys_d = jnp.asarray(u8_p)
        else:
            polys = np.stack([serialization.deserialize_blob(b)
                              for b in blobs])
            polys_p = np.concatenate([polys] + [polys[:1]] * (pad - batch))
            polys_d = jnp.asarray(polys_p)
            comms = serialization.deserialize_g1_batch(commitments)
            quotients = serialization.deserialize_g1_batch(proofs)
        challenges = fiatshamir.compute_challenges_batch(blobs, commitments)
        z_ints = [self.fr.to_int(challenges[i], mont=False)
                  for i in range(batch)]

        chal_p = np.concatenate([challenges] + [challenges[:1]] * (pad - batch))

        if batch == 1:
            eval_ = self._jit("eval", self._eval_fn)
            ys = np.asarray(eval_(polys_d, jnp.asarray(chal_p)))
            y_int = self.fr.to_int(ys[0], mont=False)
            self._verify_opening(comms[0], z_ints[0], y_int, quotients[0])
            return

        # reference: internal/kzg/kzg_verify.go:111-202 — one device call
        r = secrets.randbelow(R_MOD - 1) + 1
        r_powers = [1]
        for _ in range(batch - 1):
            r_powers.append(r_powers[-1] * r % R_MOD)
        rz = [ri * zi % R_MOD for ri, zi in zip(r_powers, z_ints)]

        M = _pad_bucket(batch + 1)          # +1: generator slot in inst 0
        scl = np.stack([self._scalar_rows(r_powers, M),
                        self._scalar_rows(rz, M),
                        self._scalar_rows(r_powers, M)])
        fe_mask = np.zeros((3, M), dtype=bool)
        fe_mask[0, batch] = True
        rp_mont = np.stack([self.fr.from_int(x) for x in r_powers]
                           + [np.zeros(16, np.uint32)] * (pad - batch))

        if use_dev:
            # TWO uploads total: the raw byte matrix + one packed aux
            # vector; the decode block holds H generator-padded comms rows
            # (generator at row `batch` — instance 0 is comms ∪ {G1}) then
            # H quotient rows; padding scalars are zero.
            H = max(M, self._decode_block_rows())
            comms_blk = list(commitments) + [self._gen_g1_bytes] * (H - batch)
            proofs_blk = list(proofs)
            x_limbs, sign, infm = self._parse_wire_blocks(
                comms_blk, proofs_blk, H)
            aux = np.concatenate([
                chal_p.ravel(), rp_mont.ravel().astype(np.uint32),
                scl.ravel(), fe_mask.ravel().astype(np.uint32),
                x_limbs.ravel().astype(np.uint32),
                sign.ravel().astype(np.uint32),
                infm.ravel().astype(np.uint32)]).astype(np.uint32)
            run = self._jit("batch_verify_fused", self._batch_verify_fused_fn)
            out = run(polys_d, jnp.asarray(aux))
            jx, jy, jz, okm = jax.device_get(out)
            real = np.zeros(2 * H, dtype=bool)
            real[:batch] = True
            real[H:H + batch] = True
            if not okm[real].all():
                i = int(np.argmin(okm[real]))
                raise gcurve.DeserializationError(
                    f"point {i}: not on curve or not in correct subgroup")
        else:
            cpts = comms + [self.gen_g1] + [None] * (M - batch - 1)
            qpts = quotients + [None] * (M - batch)
            cx, cy, cinf = serialization.g1_points_to_device_arrays(cpts)
            qx, qy, qinf = serialization.g1_points_to_device_arrays(qpts)
            px, py = np.stack([cx, qx, qx]), np.stack([cy, qy, qy])
            pinf = np.stack([cinf, qinf, qinf])
            if self.mesh is not None:
                import contextlib
                from .parallel.sharded import _pallas_ctx
                run = self._jit("batch_verify_mesh",
                                self._batch_verify_mesh_fn)
                cm = _pallas_ctx(self.mesh)
            else:
                import contextlib
                run = self._jit("batch_verify", self._batch_verify_fn)
                cm = contextlib.nullcontext()
            with cm:
                out = run(polys_d, jnp.asarray(chal_p),
                          jnp.asarray(rp_mont), jnp.asarray(px),
                          jnp.asarray(py), jnp.asarray(pinf),
                          jnp.asarray(scl), jnp.asarray(fe_mask))
            jx, jy, jz = jax.device_get(out)
        lhs1 = self._jac_to_golden(jx, jy, jz, 0)
        lhs2 = self._jac_to_golden(jx, jy, jz, 1)
        ok = self._pairing_check([
            (lhs1, self.gen_g2),
            (lhs2, self.alpha_g2),
        ])
        if not ok:
            raise ErrVerifyOpeningProof()

    # Alias for the reference's goroutine-parallel variant (verify.go:152) —
    # here the batch path is already data-parallel on device.
    verify_blob_kzg_proof_batch_par = verify_blob_kzg_proof_batch


    # ------------------------------------------------------- EIP-7594 (cells)
    def _coeffs_fn(self):
        """blob scalars (brp-eval order, normal form) -> monomial coeffs."""
        fr = self.fr
        rev = bitrev_indices(SCALARS_PER_BLOB)
        domain = self.domain

        def to_coeffs(poly_normal):
            poly = fr.to_mont(poly_normal)
            poly = jnp.take(poly, rev, axis=-2)
            return domain.ifft(poly)

        return to_coeffs

    def _cells_only_fn(self):
        fr, fk = self.fr, self.fk20
        to_coeffs = self._coeffs_fn()

        def run(poly_normal):
            coeffs = to_coeffs(poly_normal)
            return fr.from_mont(fk.extended_evaluations(coeffs))

        return jax.jit(run)

    def _cells_proofs_from_coeffs_fn(self):
        fr, fk, curve = self.fr, self.fk20, self.curve
        table = fk.production_table()   # eager; threaded as jit ARGUMENT

        def run(coeffs_mont, *tbl):
            evals = fr.from_mont(fk.extended_evaluations(coeffs_mont))
            proofs = fk.multi_open_proofs(coeffs_mont,
                                          s1_table=tbl or None)
            return evals, self._affine_normal(proofs)

        jitted = jax.jit(run)
        if table is None:
            return jitted
        return lambda coeffs: jitted(coeffs, *table)

    def _cells_proofs_fn(self):
        """ONE jit from blob scalars to (evals, affine proofs): the
        coeffs and proofs stages fuse into a single dispatch (two chained
        jit calls cost an extra device round-trip each call; the recover
        path keeps the standalone cells_proofs_coeffs graph)."""
        fr, fk = self.fr, self.fk20
        to_coeffs = self._coeffs_fn()
        table = fk.production_table()   # eager; threaded as jit ARGUMENT

        def run(poly_normal, *tbl):
            coeffs = to_coeffs(poly_normal)
            evals = fr.from_mont(fk.extended_evaluations(coeffs))
            proofs = fk.multi_open_proofs(coeffs, s1_table=tbl or None)
            return evals, self._affine_normal(proofs)

        jitted = jax.jit(run)
        if table is None:
            return jitted
        return lambda poly: jitted(poly, *table)

    def _serialize_cells(self, evals_normal):
        """[128, 64, 16] normal-form evals -> list of 128 cell byte strings."""
        arr = np.asarray(evals_normal)
        return [serialization.serialize_fr_normal(arr[i])
                for i in range(CELLS_PER_EXT_BLOB)]

    def _serialize_proofs(self, ax, ay, ainf):
        # one transfer per array — per-element device indexing costs a
        # device slice + host round-trip each (seconds over a remote tunnel);
        # compression is one native batch call over packed limb bytes
        # ONE batched device_get: three sequential np.asarray fetches pay
        # the tunnel round-trip each (~75 ms total measured; batched ~35)
        ax, ay, ainf = jax.device_get((ax, ay, ainf))
        ax, ay, ainf = np.asarray(ax), np.asarray(ay), np.asarray(ainf)
        n = ax.shape[0]
        interleaved = np.empty((2 * n, ax.shape[1]), dtype=np.uint32)
        interleaved[0::2] = ax
        interleaved[1::2] = ay
        return hc.g1_compress_normal_limbs(interleaved, ainf)

    def compute_cells(self, blob: bytes) -> list:
        """reference: api_eip7594.go:12."""
        poly = serialization.deserialize_blob(blob)
        run = self._jit("cells_only", self._cells_only_fn)
        evals = run(jnp.asarray(poly))
        return self._serialize_cells(evals)

    def compute_cells_and_kzg_proofs(self, blob: bytes):
        """reference: api_eip7594.go:28."""
        poly = serialization.deserialize_blob(blob)
        run = self._jit("cells_proofs", self._cells_proofs_fn)
        evals, (ax, ay, ainf) = run(jnp.asarray(poly))
        return (self._serialize_cells(evals),
                self._serialize_proofs(ax, ay, ainf))

    def compute_cells_and_kzg_proofs_batch(self, blobs):
        """Batched cells + proofs: ONE device dispatch for the whole blob
        batch, returning [(cells, proofs), ...] per blob.

        TPU-first extension with no reference analog (the reference API
        is per-blob, api_eip7594.go:28, parallelized over goroutines) —
        the FK20 graph is batch-shaped end to end, so a batch amortizes
        the launch/transfer overhead that dominates the single-blob
        latency.  Bit-identical per blob to compute_cells_and_kzg_proofs.
        """
        if not blobs:
            return []
        B = len(blobs)
        pad = _pad_bucket(B)
        polys = np.stack([serialization.deserialize_blob(b) for b in blobs]
                         + [np.zeros((SCALARS_PER_BLOB, 16), np.uint32)]
                         * (pad - B))
        run = self._jit("cells_proofs", self._cells_proofs_fn)
        evals, (ax, ay, ainf) = run(jnp.asarray(polys))
        evals, ax, ay, ainf = jax.device_get((evals, ax, ay, ainf))
        return [(self._serialize_cells(evals[i]),
                 self._serialize_proofs(ax[i], ay[i], ainf[i]))
                for i in range(B)]

    def _recover_poly_coeffs(self, cell_ids, cells):
        """Validation + erasure recovery -> monomial coeffs (device array).

        reference: api_eip7594.go:93-141.
        """
        from .errors import (ErrCellIDsNotOrdered, ErrFoundInvalidCellID,
                             ErrNotEnoughCellsForReconstruction,
                             ErrNumCellIDsNotEqualNumCells)
        if len(cell_ids) != len(cells):
            raise ErrNumCellIDsNotEqualNumCells()
        if any(b <= a for a, b in zip(cell_ids, cell_ids[1:])):
            raise ErrCellIDsNotOrdered()
        if any(cid >= CELLS_PER_EXT_BLOB for cid in cell_ids):
            raise ErrFoundInvalidCellID()
        if len(cell_ids) < self.recovery.blocks_needed():
            raise ErrNotEnoughCellsForReconstruction()

        ext = np.zeros((SCALARS_PER_EXT_BLOB, 16), dtype=np.uint32)
        for cid, cell in zip(cell_ids, cells):
            ext[cid * SCALARS_PER_CELL:(cid + 1) * SCALARS_PER_CELL] = \
                serialization.deserialize_cell(cell)
        rev = bitrev_indices(SCALARS_PER_EXT_BLOB)
        ext = ext[rev]
        present = set(cell_ids)
        missing = [int(bin(cid + CELLS_PER_EXT_BLOB)[3:][::-1], 2)
                   for cid in range(CELLS_PER_EXT_BLOB) if cid not in present]
        data_mont = self.fr.to_mont(jnp.asarray(ext))
        return self.recovery.recover_poly_coeffs(data_mont, missing)

    def recover_cells_and_compute_kzg_proofs(self, cell_ids, cells):
        """reference: api_eip7594.go:144."""
        coeffs = self._recover_poly_coeffs(list(cell_ids), list(cells))
        from_coeffs = self._jit("cells_proofs_coeffs",
                                self._cells_proofs_from_coeffs_fn)
        evals, (ax, ay, ainf) = from_coeffs(coeffs)
        return (self._serialize_cells(evals),
                self._serialize_proofs(ax, ay, ainf))

    def recover_cells(self, cell_ids, cells) -> list:
        """Recovery without proofs (reference: api_eip.go:8)."""
        coeffs = self._recover_poly_coeffs(list(cell_ids), list(cells))
        fr, fk = self.fr, self.fk20
        run = self._jit("cells_from_coeffs", lambda: jax.jit(
            lambda c: fr.from_mont(fk.extended_evaluations(c))))
        return self._serialize_cells(run(coeffs))

    def verify_cell_kzg_proof_batch(self, commitments, cell_indices, cells,
                                    proofs) -> None:
        """reference: api_eip7594.go:163, internal/kzg_multi/kzg_verify.go:16."""
        from .errors import ErrInvalidCellID
        # deduplicate commitments, order-preserving (api_eip7594.go:238)
        unique, row_indices = [], []
        seen = {}
        for c in commitments:
            key = bytes(c)
            if key not in seen:
                seen[key] = len(unique)
                unique.append(key)
            row_indices.append(seen[key])
        batch = len(commitments)
        if batch != len(cell_indices) or batch != len(cells) or batch != len(proofs):
            raise ErrBatchLengthCheck()
        if batch == 0:
            return
        if any(ci >= CELLS_PER_EXT_BLOB for ci in cell_indices):
            raise ErrInvalidCellID()

        use_dev = self._device_decode_enabled()
        if not use_dev:
            comms_g = serialization.deserialize_g1_batch(unique)
            proofs_g = serialization.deserialize_g1_batch(proofs)
        evals = np.stack([serialization.deserialize_cell(c) for c in cells])

        r = secrets.randbelow(R_MOD - 1) + 1
        r_powers = [1]
        for _ in range(batch - 1):
            r_powers.append(r_powers[-1] * r % R_MOD)

        # one device dispatch: three folds + interpolation fold + its
        # commitment + the RL combine (reference kzg_verify.go:16-105 runs
        # these as separate sequential steps)
        weights = [0] * len(unique)
        for k, ridx in enumerate(row_indices):
            weights[ridx] = (weights[ridx] + r_powers[k]) % R_MOD
        weighted = [self.mp_key.coset_shifts_pow_cs[ci] * rp % R_MOD
                    for ci, rp in zip(cell_indices, r_powers)]

        pad = _pad_bucket(batch)
        U = len(unique)
        scl = np.stack([self._scalar_rows(r_powers, pad),
                        self._scalar_rows(weights, pad),
                        self._scalar_rows(weighted, pad)])

        evals_p = np.concatenate([evals] + [evals[:1]] * (pad - batch))
        idx_p = np.asarray(list(cell_indices) + [0] * (pad - batch),
                           dtype=np.int32)
        rp_mont = np.stack([self.fr.from_int(x) for x in
                            r_powers + [0] * (pad - batch)])

        if use_dev:
            # ONE dispatch from wire bytes to the pairing inputs (decode
            # block: H generator-padded proof rows, H commitment rows)
            H = max(pad, self._decode_block_rows())
            x_limbs, sign, infm = self._parse_wire_blocks(proofs, unique, H)
            aux = np.concatenate([
                scl.ravel(), np.asarray(evals_p).ravel(),
                np.asarray(idx_p).ravel().astype(np.uint32),
                rp_mont.ravel().astype(np.uint32),
                x_limbs.ravel().astype(np.uint32),
                sign.ravel().astype(np.uint32),
                infm.ravel().astype(np.uint32)]).astype(np.uint32)
            run = self._jit("cell_verify_fused", self._cell_verify_fused_fn)
            out = run(jnp.asarray(aux))
            jx, jy, jz, okm = jax.device_get(out)
            real = np.zeros(2 * H, dtype=bool)
            real[:batch] = True
            real[H:H + U] = True
            if not okm[real].all():
                i = int(np.argmin(okm[real]))
                raise gcurve.DeserializationError(
                    f"point {i}: not on curve or not in correct subgroup")
        else:
            ppts = proofs_g + [None] * (pad - batch)
            cpts = comms_g + [None] * (pad - len(comms_g))
            qx, qy, qinf = serialization.g1_points_to_device_arrays(ppts)
            cx, cy, cinf = serialization.g1_points_to_device_arrays(cpts)
            px, py = np.stack([qx, cx, qx]), np.stack([qy, cy, qy])
            pinf = np.stack([qinf, cinf, qinf])
            run = self._jit("cell_verify", self._cell_verify_fn)
            out = run(jnp.asarray(px), jnp.asarray(py),
                      jnp.asarray(pinf), jnp.asarray(scl),
                      jnp.asarray(evals_p), jnp.asarray(idx_p),
                      jnp.asarray(rp_mont))
            jx, jy, jz = jax.device_get(out)
        folded_proofs = self._jac_to_golden(jx, jy, jz, 0)
        rl = self._jac_to_golden(jx, jy, jz, 1)
        s_pow_cs_g2 = self.g2_points[SCALARS_PER_CELL]
        ok = self._pairing_check([
            (folded_proofs, s_pow_cs_g2),
            (rl, hc.g2_neg(self.gen_g2)),
        ])
        if not ok:
            raise ErrVerifyOpeningProof()


def new_context_4096_secure(use_cache: bool = True) -> Context:
    """reference: api.go:53."""
    return Context(None, use_cache=use_cache)
