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
    ndev = mesh.devices.size

    def local(pts, scalars):
        partial_sums = msm_mod.msm_window_sums(curve, pts, scalars, window,
                                               vary_axes=(axis_name,))
        gathered = jax.tree.map(
            lambda c: jax.lax.all_gather(c, axis_name), partial_sums)
        total = jax.tree.map(lambda c: c[0], gathered)
        for d in range(1, ndev):
            total = curve.add(total, jax.tree.map(lambda c: c[d], gathered))
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
