"""Per-stage timing of the fused batch-verify and cell-verify graphs.

VERDICT r03: "the verify paths are latency/dispatch-bound ... there is no
per-stage timing of the fused verify graph anywhere".  This carves the
production graphs into separately-jitted stages fed the SAME inputs the
fused path sees, so the 688 ms can be attributed:

  decode        device G1 wire decode (sqrt + sign + GLV subgroup check)
  decode_nosg   same without the subgroup check (isolates the z^2 chains)
  eval          batched barycentric eval + fe fold
  msm           the three fold MSMs (window=4, N=128 pts, 3 instances)
  affine        Jacobian -> normal-form affine (Fermat inversions, 2 pts)
  fused         the production one-dispatch graph (_batch_verify_fused_fn)
  host:*        host-side pieces (deserialize, Fiat-Shamir, parse, pairing)

Run on TPU: python tools/probe_verify.py    (stages via PROBE=... csv)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.timing import measure, measure_host

BATCH = 64


def main():
    import jax
    import jax.numpy as jnp
    from goethkzg_tpu import fiatshamir, serialization
    from goethkzg_tpu.api import Context, _pad_bucket
    from goethkzg_tpu.constants import R_MOD
    from goethkzg_tpu.engines import kzg as kzg_engine
    from goethkzg_tpu.ops import decompress as dec_mod
    from goethkzg_tpu.ops import msm as msm_mod

    stages = set(os.environ.get(
        "PROBE",
        "host,decode,decode_nosg,eval,msm,affine,fused,cell").split(","))
    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.time()
    ctx = Context()
    rng = np.random.default_rng(0)

    def rand_blob():
        out = bytearray()
        for _ in range(4096):
            out += (int.from_bytes(rng.bytes(32), "big")
                    % R_MOD).to_bytes(32, "big")
        return bytes(out)

    rows = []

    def rec(name, seconds, note=""):
        rows.append((name, seconds))
        print(f"  {name:24s} {seconds * 1e3:9.2f} ms  {note}", flush=True)

    blobs = [rand_blob() for _ in range(BATCH)]
    commitments = ctx.blob_to_kzg_commitment_batch(blobs)
    proofs = [ctx.compute_blob_kzg_proof(b, c)
              for b, c in zip(blobs, commitments)]
    print(f"[{time.time() - t0:.1f}s] inputs ready", flush=True)

    # ---- host-side pieces --------------------------------------------------
    if "host" in stages:
        t = measure_host(lambda: [serialization.deserialize_blob(b) for b in blobs])
        rec("host:deserialize_blobs", t, f"{BATCH} blobs")
        t = measure_host(lambda: fiatshamir.compute_challenges_batch(
            blobs, commitments))
        rec("host:fiat_shamir", t)
        H = 128
        t = measure_host(lambda: ctx._parse_wire_blocks(
            list(commitments) + [ctx._gen_g1_bytes] * (H - BATCH),
            list(proofs), H))
        rec("host:parse_wire", t, "256 pts")
        from goethkzg_tpu import hostcurve as hc
        g = ctx.gen_g1
        t = measure_host(lambda: hc.pairing_check(
            [(g, ctx.gen_g2), (g, hc.g2_neg(ctx.gen_g2))]))
        rec("host:pairing", t)

    # ---- shared device inputs (mirror verify_blob_kzg_proof_batch) --------
    polys = np.stack([serialization.deserialize_blob(b) for b in blobs])
    challenges = fiatshamir.compute_challenges_batch(blobs, commitments)
    pad = _pad_bucket(BATCH)
    polys_p = jnp.asarray(polys)
    chal_p = jnp.asarray(challenges)
    rp_mont = jnp.asarray(np.stack(
        [ctx.fr.from_int(pow(7, i, R_MOD)) for i in range(BATCH)]))
    H = 128
    x_limbs, sign, infm = ctx._parse_wire_blocks(
        list(commitments) + [ctx._gen_g1_bytes] * (H - BATCH),
        list(proofs), H)
    x_limbs = jnp.asarray(x_limbs)
    sign_d = jnp.asarray(sign)
    infm_d = jnp.asarray(infm)
    M = _pad_bucket(BATCH + 1)
    scl = jnp.asarray(rng.integers(0, 1 << 16, (3, M, 16), dtype=np.uint32))
    fe_mask = np.zeros((3, M), dtype=bool)
    fe_mask[0, BATCH] = True
    fe_mask = jnp.asarray(fe_mask)

    fr, curve = ctx.fr, ctx.curve
    roots, roots_inv = ctx.roots_brp, ctx.roots_brp_inv
    n_inv = ctx.domain.n_inv_mont

    # ---- decode ------------------------------------------------------------
    if "decode" in stages:
        f = jax.jit(lambda x, s, i: dec_mod.decode_g1_graph(
            curve, x, s, i, True))
        t = measure(lambda: f(x_limbs, sign_d, infm_d))
        rec("decode(+subgroup)", t, "256 pts")
    if "decode_nosg" in stages:
        f = jax.jit(lambda x, s, i: dec_mod.decode_g1_graph(
            curve, x, s, i, False))
        t = measure(lambda: f(x_limbs, sign_d, infm_d))
        rec("decode(nosubgroup)", t, "256 pts  (diff = z^2 chains)")

    # ---- eval --------------------------------------------------------------
    if "eval" in stages:
        def eval_fe(polys_normal, chal_normal, rp):
            poly = fr.to_mont(polys_normal)
            z = fr.to_mont(chal_normal)
            y, _, _, _ = kzg_engine.eval_lagrange(roots, roots_inv, n_inv,
                                                  poly, z)
            fe = fr.sum(fr.mul(rp, y), axis=-2)
            return fr.from_mont(fr.neg(fe))

        f = jax.jit(eval_fe)
        t = measure(lambda: f(polys_p, chal_p, rp_mont))
        rec("eval+fold", t, f"[{BATCH},4096]")

    # ---- fold MSMs ---------------------------------------------------------
    if "msm" in stages:
        wx, wy, winf, _ = jax.jit(
            lambda x, s, i: dec_mod.decode_g1_graph(curve, x, s, i, False)
        )(x_limbs, sign_d, infm_d)
        Q = M
        px = jnp.stack([wx[:Q], wx[H:H + Q], wx[H:H + Q]])
        py = jnp.stack([wy[:Q], wy[H:H + Q], wy[H:H + Q]])
        pinf = jnp.stack([winf[:Q], winf[H:H + Q], winf[H:H + Q]])

        def msm4(px, py, pinf, scl):
            return msm_mod.msm_batched(curve, (px, py, pinf), scl,
                                       shared_points=False, window=4)

        f = jax.jit(msm4)
        t = measure(lambda: f(px, py, pinf, scl))
        rec("fold_msms(w=4)", t, f"3 x {M} pts")

        res = f(px, py, pinf, scl)

        if "affine" in stages:
            def aff(res):
                lhs1 = curve.add(tuple(c[0] for c in res),
                                 tuple(c[1] for c in res))
                lhs2 = curve.neg(tuple(c[2] for c in res))
                both = tuple(jnp.stack([a, b]) for a, b in zip(lhs1, lhs2))
                return ctx._affine_normal(both)

            f2 = jax.jit(aff)
            t = measure(lambda: f2(res))
            rec("jac->affine(2 pts)", t, "Fermat inv at 2 lanes")

    # ---- the production fused graph (raw-u8 + packed aux signature) --------
    if "fused" in stages:
        u8 = np.stack([serialization.validate_blob_bytes(b) for b in blobs])
        u8_d = jnp.asarray(u8)
        aux = np.concatenate([
            np.asarray(chal_p).ravel(), np.asarray(rp_mont).ravel(),
            np.asarray(scl).ravel(), np.asarray(fe_mask).astype(np.uint32).ravel(),
            np.asarray(x_limbs).ravel(),
            np.asarray(sign_d).astype(np.uint32).ravel(),
            np.asarray(infm_d).astype(np.uint32).ravel()]).astype(np.uint32)
        run = ctx._jit("batch_verify_fused", ctx._batch_verify_fused_fn)
        aux_d = jnp.asarray(aux)
        t = measure(lambda: run(u8_d, aux_d))
        rec("FUSED batch_verify", t, "one dispatch, device only")
        t = measure_host(lambda: ctx.verify_blob_kzg_proof_batch(
            blobs, commitments, proofs))
        rec("e2e verify_blob_batch", t, f"{BATCH} blobs bytes-to-bool")

    # ---- cell verify -------------------------------------------------------
    if "cell" in stages:
        cells, cell_proofs = ctx.compute_cells_and_kzg_proofs(blobs[0])
        idxs = list(range(128))
        comms = [commitments[0]] * 128
        t = measure_host(lambda: ctx.verify_cell_kzg_proof_batch(
            comms, idxs, cells, cell_proofs))
        rec("e2e verify_cell_batch", t, "128 cells")

        evals = np.stack([serialization.deserialize_cell(c) for c in cells])
        mp = ctx.mp_key
        idx_p = jnp.asarray(np.asarray(idxs, dtype=np.int32))
        rp128 = jnp.asarray(np.stack(
            [ctx.fr.from_int(pow(7, i, R_MOD)) for i in range(128)]))

        def interp_fn(evals_normal, idx, rp):
            interp = mp.fold_interpolation_poly(fr.to_mont(evals_normal),
                                                idx, rp)
            return msm_mod.msm(curve, mp.g1_points, fr.from_mont(interp),
                               window=4)

        f = jax.jit(interp_fn)
        t = measure(lambda: f(jnp.asarray(evals), idx_p, rp128))
        rec("cell:interp+commit", t, "coset-IFFT fold + 64-pt MSM")

    print("\n| stage | ms |")
    print("|---|---|")
    for name, s in rows:
        print(f"| {name} | {s * 1e3:.2f} |")


if __name__ == "__main__":
    main()
