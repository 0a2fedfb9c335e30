"""Multi-chip sharding: the TPU-native replacement for the reference's
goroutine parallelism (SURVEY.md §2.5).

Three parallel axes, expressed with `shard_map` over a `jax.sharding.Mesh`
so XLA inserts the collectives (ICI within a slice, DCN across hosts):

* **data parallel (P2 analog)** — the blob/batch axis is sharded; each
  device runs the full per-blob kernel (commit, eval, open) locally with
  zero communication;
* **point-sharded MSM (P1/P4 analog)** — the MSM's point axis is sharded;
  each device bucket-accumulates its chunk's per-window sums and the
  partial window sums are all-gathered (tiny: W points) and folded
  locally — group elements cannot ride `psum`, so the collective is an
  all-gather + local fold;
* **domain-sharded Fr reduction (the sequence-parallel analog)** — sums of
  field elements use `psum` on widened limb columns (lazy carries: 16-bit
  limbs summed across <= 2^15 devices cannot overflow uint32), followed by
  one local carry resolution.

Results are equal regardless of mesh shape (bit-identical for the
data-parallel path; equal as group elements for the collective MSM, whose
reduction order differs by design) — tests/test_sharded.py pins both on a
1-device vs 8-device virtual CPU mesh.
"""

import contextlib
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import field as field_mod
from ..ops import msm as msm_mod
from ..ops.field import fr_spec
from ..utils import jaxcfg  # noqa: F401  (persistent compilation cache)


def _pallas_ctx(mesh: Mesh):
    """Pallas kernels don't lower on the CPU backend (virtual test meshes)."""
    if mesh.devices.flat[0].platform == "cpu":
        return field_mod.pallas_disabled()
    return contextlib.nullcontext()


def _scan_fold(curve, gathered):
    """Sequential fold of an all-gathered point tuple along its leading
    (device) axis via lax.scan — ONE group-add body in the compiled module
    instead of ndev-1 unrolled copies.  The single-core CPU XLA compiles of
    the virtual test meshes are dominated by module size, and the fold
    order (device 0..D-1) matches the unrolled loop bit-for-bit."""
    init = jax.tree.map(lambda c: jnp.zeros_like(c[0]), gathered)
    # point at infinity: Z = 0 (Jacobian) / inf flag in slot 2 — the curve
    # tuples here are Jacobian (X, Y, Z), so all-zeros is the identity.

    def body(acc, dev_slice):
        return curve.add(acc, dev_slice), None

    total, _ = jax.lax.scan(body, init, gathered)
    return total


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def data_parallel_commit(mesh: Mesh, curve, points_affine, polys_normal,
                         axis_name: str = "data", window: int = 8,
                         to_affine: bool = True):
    """Batch commitment with the blob axis sharded across the mesh.

    points replicated, polys [B, N, 16] sharded on B. Returns affine
    coordinate arrays [B, ...] sharded on B (or Jacobian with
    to_affine=False — skips the Fermat-inversion scan, which dominates the
    compile time of tiny dryrun/test graphs).
    """

    def local(pts, polys):
        B = polys.shape[0]
        bpts = tuple(jnp.broadcast_to(c[None], (B,) + c.shape) for c in pts)
        res = msm_mod.msm_core(curve, bpts, polys, window,
                               vary_axes=(axis_name,))
        return curve.to_affine(res) if to_affine else res

    # jit the shard_map: called eagerly it executes per-primitive (each
    # op becomes its own tiny SPMD program -- hours of dispatch overhead)
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=((P(), P(), P()), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name))))
    with _pallas_ctx(mesh):
        return fn(points_affine, polys_normal)


def point_sharded_msm(mesh: Mesh, curve, points_affine, scalars_normal,
                      window: int = 8, axis_name: str = "data"):
    """One big MSM with the *point* axis sharded across devices.

    Each device computes partial per-window sums over its point chunk;
    partials are all-gathered and folded locally (log-free small combine),
    then the Horner chain runs replicated.  Returns a replicated Jacobian
    point.
    """
    def local(pts, scalars):
        partial_sums = msm_mod.msm_window_sums(curve, pts, scalars, window,
                                               vary_axes=(axis_name,))
        gathered = jax.tree.map(
            lambda c: jax.lax.all_gather(c, axis_name), partial_sums)
        total = _scan_fold(curve, gathered)
        return msm_mod.combine_window_sums(curve, total, window,
                                           vary_axes=(axis_name,))

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=((P(axis_name), P(axis_name), P(axis_name)), P(axis_name)),
        out_specs=(P(), P(), P()),
        # scan carries are marked varying via _pvary, so the VMA checker
        # cannot infer the (actually replicated) outputs
        check_vma=False))
    with _pallas_ctx(mesh):
        return fn(points_affine, scalars_normal)


def make_mesh_2d(devices=None, n_hosts: int = 1,
                 axis_names=("host", "chip")) -> Mesh:
    """2D mesh for multi-host runs: leading axis = hosts (DCN), trailing
    axis = chips within a host (ICI).  On a real pod slice pass
    jax.devices() ordered host-major (the default)."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % n_hosts == 0
    grid = np.array(devices).reshape(n_hosts, len(devices) // n_hosts)
    return Mesh(grid, axis_names)


def point_sharded_msm_2d(mesh: Mesh, curve, points_affine, scalars_normal,
                         window: int = 8, axis_names=("host", "chip")):
    """point_sharded_msm over a (host, chip) mesh with a hierarchical
    combine that keeps DCN traffic minimal.

    The point axis is sharded over BOTH mesh axes.  Per-window partial
    sums are folded in two stages: an all-gather + fold over the chip
    axis (ICI — cheap, wide), then an all-gather + fold of the per-host
    results over the host axis, so only W points per host cross the DCN
    instead of W x chips.  This is the multi-host shape of the
    reference's MSM parallelism (reference:
    internal/multiexp/multiexp.go:20-34 fans out goroutines; here the
    fan-in is explicit in the collective hierarchy).  Returns a
    replicated Jacobian point, equal as a group element to the
    single-device MSM for any mesh shape.
    """
    host_ax, chip_ax = axis_names
    n_hosts, n_chips = mesh.shape[host_ax], mesh.shape[chip_ax]

    def _gather_fold(tree, axis_name, count):
        gathered = jax.tree.map(
            lambda c: jax.lax.all_gather(c, axis_name), tree)
        return _scan_fold(curve, gathered)

    def local(pts, scalars):
        partial_sums = msm_mod.msm_window_sums(curve, pts, scalars, window,
                                               vary_axes=axis_names)
        per_host = _gather_fold(partial_sums, chip_ax, n_chips)   # ICI
        total = _gather_fold(per_host, host_ax, n_hosts)          # DCN
        return msm_mod.combine_window_sums(curve, total, window,
                                           vary_axes=axis_names)

    shard = P(axis_names)  # point axis split over host x chip jointly
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=((shard, shard, shard), shard),
        out_specs=(P(), P(), P()), check_vma=False))
    with _pallas_ctx(mesh):
        return fn(points_affine, scalars_normal)


@functools.cache
def _four_step_twiddles(n1: int, n2: int, inverse: bool):
    """tw[k1, i2] = w_N^{±k1*i2} (Montgomery), N = n1*n2, host-built once."""
    from ..constants import R_MOD
    from ..ops.ntt import root_of_unity
    fr = fr_spec()
    n = n1 * n2
    w = root_of_unity(n)
    if inverse:
        w = pow(w, -1, R_MOD)
    tw = np.zeros((n1, n2, fr.n), dtype=np.uint32)
    col = [pow(w, k1, R_MOD) for k1 in range(n1)]
    for i2 in range(n2):
        for k1 in range(n1):
            tw[k1, i2] = fr.from_int(pow(col[k1], i2, R_MOD))
    return tw


def domain_sharded_fft(mesh: Mesh, x_mont, n1: int, n2: int,
                       inverse: bool = False, axis_name: str = "data"):
    """Four-step NTT of N = n1*n2 points with ONE all-to-all.

    This is the multi-chip analog of the reference's single-threaded
    recursive FFT (reference: internal/kzg/fft.go:95-144) for domains too
    large (or too numerous) for one chip: column FFTs are local, the
    transpose is a mesh all-to-all over ICI, row FFTs are local.

    Input  x [n1, n2, 16] Montgomery, row-major element i = i1*n2 + i2,
           sharded on axis 1 (i2).
    Output y [n1, n2, 16] sharded on axis 0, with the standard four-step
           digit-reversed layout: y[k1, k2] = X_hat[k2*n1 + k1].
    (Callers compose transforms so the permutation cancels, or fold it
    into their gather indices — same convention as the brp domains.)

    inverse=True computes the inverse NTT including the 1/N scale.
    """
    D = mesh.devices.size
    assert n2 % D == 0 and n1 % D == 0
    from ..ops.ntt import get_domain
    fr = fr_spec()
    d1, d2 = get_domain(n1), get_domain(n2)
    tw = _four_step_twiddles(n1, n2, inverse)

    def local(x, tw_local):
        # x: [n1, n2/D, 16] — FFT each column (length n1, axis 0)
        xt = jnp.moveaxis(x, 0, -2)                   # [n2/D, n1, 16]
        y = d1.ifft(xt) if inverse else d1.fft(xt)    # [n2/D, k1, 16]
        y = fr.mul(y, jnp.moveaxis(tw_local, 0, -2))
        # transpose via all-to-all: split k1, concat i2
        y = jax.lax.all_to_all(y, axis_name, split_axis=1, concat_axis=0,
                               tiled=True)            # [n2, n1/D, 16]
        yt = jnp.moveaxis(y, 0, -2)                   # [n1/D, n2, 16]
        return d2.ifft(yt) if inverse else d2.fft(yt)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name)),
        out_specs=P(axis_name), check_vma=False))
    with _pallas_ctx(mesh):
        return fn(x_mont, tw)


def cells_sharded_proofs(mesh: Mesh, fk, poly_coeff_mont,
                         axis_name: str = "data", to_affine: bool = True):
    """FK20 multi-open with the coset/frequency axis sharded over the mesh.

    The two MSM stages of engines/fk20.py shard cleanly (the reference runs
    the analogous loops on goroutines — internal/kzg_multi/fk20/fk20.go:58-70,
    toeplitz.go:114):

    * stage 1 — each device runs the per-frequency Toeplitz MSMs for its
      nc/D frequencies against its shard of the FFT'd SRS table;
    * the h-commitments are all-gathered in affine form (nc * 2 * 24 words
      — KBs over ICI);
    * stage 2 — each device computes its nc/D proofs via the compacted
      65-column composite map.

    poly_coeff_mont: [poly_size, 16] (replicated).  Returns affine
    (x, y, inf) arrays [nc], proofs sharded on the mesh axis — or
    Jacobian (X, Y, Z) with to_affine=False, which drops the final
    Fermat-inversion scan from the compiled module (the driver dryrun
    normalizes on the host; the inversion for the mid-pipeline h
    all-gather is unavoidable, stage 2 consumes affine points).
    """
    fr, curve = fk.fr, fk.curve
    F = curve.F
    nc, cs = fk.num_cosets, fk.coset_size
    D = mesh.devices.size
    assert nc % D == 0
    tx, ty, tinf = fk.table                       # [nc, cs] point arrays
    k_idx = fk._s2_k_idx                          # [nc, P]
    s2_scalars = fk._s2_scalars                   # [nc, P, 16]

    def local(poly, txl, tyl, tinfl, k_idxl, s2l):
        scalars = fk._toeplitz_scalars(poly[None])[0]       # [nc, cs, 16]
        my = jax.lax.axis_index(axis_name)
        local_scal = jax.lax.dynamic_slice_in_dim(
            scalars, my * (nc // D), nc // D, axis=0)
        h = msm_mod.msm_core(curve, (txl, tyl, tinfl), local_scal, window=4,
                             vary_axes=(axis_name,))
        hx, hy, hinf = curve.to_affine(h)                   # [nc/D]
        gx = jax.lax.all_gather(hx, axis_name, tiled=True)  # [nc]
        gy = jax.lax.all_gather(hy, axis_name, tiled=True)
        ginf = jax.lax.all_gather(hinf, axis_name, tiled=True)
        # stage 2: my nc/D proofs, each a P-point MSM over gathered h
        px = jnp.take(gx, k_idxl, axis=0)                   # [nc/D, P, n]
        py = jnp.take(gy, k_idxl, axis=0)
        pinf = jnp.take(ginf, k_idxl, axis=0)
        proofs = msm_mod.msm_core(curve, (px, py, pinf), s2l, window=4,
                                  vary_axes=(axis_name,))
        return curve.to_affine(proofs) if to_affine else proofs

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False))
    with _pallas_ctx(mesh):
        return fn(poly_coeff_mont, tx, ty, tinf, k_idx, s2_scalars)


def fused_sharded_step(mesh: Mesh, curve, points_affine, polys_normal,
                       scalars_normal, a_mont, b_mont,
                       axis_name: str = "data", window: int = 1):
    """All three sharding patterns in ONE shard_map module:

    1. data-parallel batched commit (blob axis sharded),
    2. point-sharded MSM with all-gather + fold combine (point axis sharded),
    3. domain-sharded lazy-carry inner product over psum.

    One jit -> one XLA compile, and stages 1 + 2 STACK on the MSM instance
    axis so the expensive point-op scan bodies (bucket walk, weighted walk,
    Horner) compile exactly once — this is what lets the driver's 8-device
    CPU dryrun fit its budget on a single-core host.

    Returns (res, ip): res is a Jacobian tuple sharded on its leading axis
    whose global rows interleave, per device, B_local data-parallel commit
    results followed by one copy of the (replicated-by-construction)
    point-sharded MSM result; ip is the replicated inner product.  Split
    res on the host after one device_get.
    """
    fr = fr_spec()
    td = curve.F.trailing_dims
    vary = (axis_name,)

    def local(pts, polys, lpts, lsc, a, b):
        # Stages 1 + 2 share ONE bucket-walk / weighted-walk / Horner
        # instantiation: the data-parallel commits (instances 0..B-1, full
        # replicated point set) and the point-sharded partial MSM (last
        # instance, the local point/scalar shard padded to N with infinity
        # points and zero scalars) stack on the instance axis, so the
        # expensive point-op scan bodies compile exactly once.
        B, N = polys.shape[0], pts[0].shape[0]
        n_local = lsc.shape[0]

        def pad_pts(c, fill_inf):
            pad_shape = (N - n_local,) + c.shape[1:]
            fill = (jnp.ones(pad_shape, dtype=c.dtype) if fill_inf
                    else jnp.zeros(pad_shape, dtype=c.dtype))
            return jnp.concatenate([c, fill], axis=0)

        px = jnp.concatenate(
            [jnp.broadcast_to(pts[0][None], (B,) + pts[0].shape),
             pad_pts(lpts[0], False)[None]])
        py = jnp.concatenate(
            [jnp.broadcast_to(pts[1][None], (B,) + pts[1].shape),
             pad_pts(lpts[1], False)[None]])
        pinf = jnp.concatenate(
            [jnp.broadcast_to(pts[2][None], (B,) + pts[2].shape),
             pad_pts(lpts[2], True)[None]])
        lsc_pad = jnp.concatenate(
            [lsc, jnp.zeros((N - n_local,) + lsc.shape[1:], lsc.dtype)])
        sc = jnp.concatenate([polys, lsc_pad[None]])       # [B+1, N, limbs]

        digits = msm_mod.fr_digits(sc, window)             # [B+1, N, W]
        W = digits.shape[-1]
        buckets = msm_mod._bucket_scan(
            curve, px[:, None], py[:, None], pinf[:, None],
            digits[:, None], 1 << window, vary)
        merged = msm_mod._tree_add(curve, buckets, axis_from_end=2)
        ws = msm_mod._weighted_bucket_sum(curve, merged, vary)  # [B+1, W]

        # point-sharded combine: all-gather the last instance's partial
        # window sums and fold sequentially (one add body)
        ps_ws = tuple(c[B] for c in ws)
        gathered = jax.tree.map(
            lambda c: jax.lax.all_gather(c, axis_name), ps_ws)
        folded = _scan_fold(curve, gathered)               # [W, *e]

        combined = tuple(jnp.concatenate([c[:B], f[None]])
                         for c, f in zip(ws, folded))      # [B+1, W]
        res = msm_mod.combine_window_sums(curve, combined, window, vary)

        # 3. domain-sharded inner product (lazy-carry psum)
        prod = fr.mul(a, b)
        cols = jax.lax.psum(
            jnp.sum(prod.astype(jnp.uint32), axis=-2, dtype=jnp.uint32),
            axis_name)
        limbs, carry = fr._propagate_cols(cols)
        carry_limbs = jnp.zeros_like(limbs).at[..., 0].set(carry)
        ip = fr.add(fr.to_mont(fr.from_mont(limbs)),
                    fr.mul(carry_limbs, fr.r2_limbs))
        # res: [B_local+1, ...] per device — row B is this device's copy of
        # the (replicated-by-construction) point-sharded MSM result
        return res, ip

    shard = P(axis_name)
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=((P(), P(), P()), shard, (shard, shard, shard),
                  shard, shard, shard),
        out_specs=((shard,) * 3, P()),
        check_vma=False))
    with _pallas_ctx(mesh):
        return fn(points_affine, polys_normal, points_affine,
                  scalars_normal, a_mont, b_mont)


def lazy_carry_fr_sum(fr, prod_mont, axis_name: str):
    """sum over BOTH the local element axis (-2) and the mesh axis of
    Montgomery products, via widened limb columns + ONE psum + one local
    carry resolution.  prod_mont: [..., N_local, 16].  Returns [..., 16]
    Montgomery (replicated across the mesh axis).

    Safe for < 2^16 total elements (columns stay < 2^32)."""
    cols = jax.lax.psum(
        jnp.sum(prod_mont.astype(jnp.uint32), axis=-2, dtype=jnp.uint32),
        axis_name)
    limbs, carry = fr._propagate_cols(cols)
    # true sum = carry * 2^256 + limbs; reduce both terms mod r
    carry_limbs = jnp.zeros_like(limbs).at[..., 0].set(carry)
    return fr.add(fr.to_mont(fr.from_mont(limbs)),
                  fr.mul(carry_limbs, fr.r2_limbs))


def domain_sharded_inner_product(mesh: Mesh, a_mont, b_mont,
                                 axis_name: str = "data"):
    """sum_i a_i * b_i with the element axis sharded: local partial products,
    lazy-carry `psum` across the mesh, single carry resolution.

    a, b: [N, 16] Montgomery; N sharded. Returns [16] Montgomery (replicated).
    """
    fr = fr_spec()

    def local(a, b):
        prod = fr.mul(a, b)
        local_sum_cols = jnp.sum(prod.astype(jnp.uint32), axis=-2,
                                 dtype=jnp.uint32)
        # columns < n_local * 2^16; psum over devices stays < 2^32 for any
        # realistic mesh; resolve carries + mod-reduce once, locally.
        cols = jax.lax.psum(local_sum_cols, axis_name)
        limbs, carry = fr._propagate_cols(cols)
        # true sum = carry * 2^256 + limbs;  result = both terms mod r:
        #   carry * 2^256 mod r  ==  mont_mul(carry, R^2)
        #   limbs mod r          ==  to_mont(from_mont(limbs))
        carry_limbs = jnp.zeros_like(limbs).at[..., 0].set(carry)
        carry_contrib = fr.mul(carry_limbs, fr.r2_limbs)
        limbs_reduced = fr.to_mont(fr.from_mont(limbs))
        return fr.add(limbs_reduced, carry_contrib)

    fn = jax.jit(jax.shard_map(local, mesh=mesh,
                               in_specs=(P(axis_name), P(axis_name)),
                               out_specs=P(), check_vma=False))
    with _pallas_ctx(mesh):
        return fn(a_mont, b_mont)
