"""On-hardware numerical parity matrix for the compiled Pallas kernels.

The r3 sortseg regression shipped because the only compiled-lowering
numeric check was a single (xyz-grads, default-config) comparison in
bench.py; every other kernel variant ran only in interpreter mode on CPU
(VERDICT r3 weak #7). This module is the widened gate: one call checks
the real Mosaic lowering against the XLA tile pipeline across

  - the forward image,
  - ALL 7 parameter-group gradients (reference contract: grads allclose
    at atol 1e-5, /root/reference/tests/test_batch_training_loss.py:104-110),
  - both backward reductions (bwd_reduce scatter / sortseg),
  - cull on/off, record packing 1/8,
  - fused multi-view batches (view_rows ≠ single-view grid),
  - the custom-JVP kernel, standalone and through the LM residual
    operator (J·v, the path CGLS consumes).

Returns a dict the bench embeds in its JSON so every round's hardware
record carries the full table (run it via ``python -m
gslm_tpu.utils.paritycheck`` or through bench.py).
"""

from __future__ import annotations

GROUPS = ("xyz", "features_dc", "features_rest", "scaling", "rotation",
          "opacity", "exposure")

# gradient gate: reference pins grads at atol 1e-5 on unit-scale losses
# (test_batch_training_loss.py:104-110); we normalize by each group's
# gradient scale, so 1e-4 relative ≈ the same contract with headroom for
# Mosaic-vs-XLA reassociation. Images are in [0,1]: absolute 1e-5.
GRAD_RTOL = 1e-4
IMG_ATOL = 1e-5


def _grad_errs(ga, gb):
    """Per-group max error of gb vs ga, normalized by ga's scale."""
    import numpy as np
    errs = {}
    for k in GROUPS:
        a = np.asarray(getattr(ga, k), np.float64)
        b = np.asarray(getattr(gb, k), np.float64)
        scale = np.abs(a).max() + 1e-12
        errs[k] = float(np.abs(b - a).max() / scale)
    return errs


def run_parity_matrix(quick: bool = False) -> dict:
    """Compare compiled pallas/pallas_jvp against the tiled XLA pipeline.

    ``quick`` shrinks the scene (CI smoke). Each variant reports the
    worst per-group relative gradient error (or image/JVP error) and an
    ``ok`` flag at the gate tolerance.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gslm_tpu.models.cameras import camera_from_meta
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.renderer import batch_render, render
    from gslm_tpu.solver.residuals import batch_residuals
    from gslm_tpu.utils.synthetic import (make_camera, random_gaussians,
                                          ring_camera_batch)

    n = 512 if quick else 2048
    H, W = (96, 128) if quick else (160, 192)
    params, aux = random_gaussians(np.random.default_rng(7), n=n,
                                   capacity=n, num_images=4)
    cam = camera_from_meta(make_camera(height=H, width=W))
    cfg = RasterConfig(dup_capacity=1 << (13 if quick else 14),
                       max_per_tile=512, tile_chunk=16, impl="tiled")
    gt = jnp.asarray(np.random.default_rng(8).uniform(0, 1, (3, H, W)),
                     jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    def loss(p, c):
        # use_trained_exp so the 7th group (exposure) carries gradient
        img = render(p, cam, bg, config=c, alive=aux.alive,
                     use_trained_exp=True).render
        return jnp.sum((img - gt) ** 2), img

    def grad_of(c):
        (_, img), g = jax.jit(jax.value_and_grad(
            lambda p: loss(p, c), has_aux=True))(params)
        return img, g

    results: dict[str, dict] = {}

    def record(name, max_err, ok):
        results[name] = {"ok": bool(ok), "max_err": float(max_err)}

    # ---- reference gradients/image (XLA tile pipeline) -----------------
    img_t, g_t = grad_of(cfg)
    img_p, g_p = grad_of(cfg.replace(impl="pallas"))

    record("fwd_image", float(jnp.abs(img_p - img_t).max()),
           jnp.allclose(img_p, img_t, atol=IMG_ATOL))

    def record_grads(name, gb, ga=g_t):
        errs = _grad_errs(ga, gb)
        worst = max(errs.values())
        results[name] = {"ok": worst < GRAD_RTOL, "max_err": worst,
                         "per_group": {k: round(v, 9)
                                       for k, v in errs.items()}}

    record_grads("grads_scatter", g_p)
    record_grads("grads_sortseg",
                 grad_of(cfg.replace(impl="pallas",
                                     bwd_reduce="sortseg"))[1])
    # cull=False: compare within the same cull setting (cull only
    # reorders f32 reductions, but the stream layouts differ)
    _, g_tnc = grad_of(cfg.replace(cull=False))
    record_grads("grads_nocull",
                 grad_of(cfg.replace(impl="pallas", cull=False))[1],
                 ga=g_tnc)
    record_grads("grads_pack8",
                 grad_of(cfg.replace(impl="pallas", pack=8))[1])
    # bucket-binned stream (r5): fwd image + grads through the bucket
    # backward kernel (rect-gated walk, member-tile accumulation)
    img_b, g_b2 = grad_of(cfg.replace(impl="pallas", bucket=2))
    record("fwd_bucket2", float(jnp.abs(img_b - img_t).max()),
           jnp.allclose(img_b, img_t, atol=IMG_ATOL))
    record_grads("grads_bucket2", g_b2)

    # bucket=4 (the m1 bench configuration, 16-member accumulation) needs
    # tile rows % 4 == 0 — run it at its own 192-px-tall camera
    H4 = 128 if quick else 192
    cam4 = camera_from_meta(make_camera(height=H4, width=W))
    gt4 = jnp.asarray(np.random.default_rng(8).uniform(0, 1, (3, H4, W)),
                      jnp.float32)

    def loss4(p, c):
        img = render(p, cam4, bg, config=c, alive=aux.alive,
                     use_trained_exp=True).render
        return jnp.sum((img - gt4) ** 2), img

    def grad4_of(c):
        (_, img), g = jax.jit(jax.value_and_grad(
            lambda p: loss4(p, c), has_aux=True))(params)
        return img, g

    img4_t, g4_t = grad4_of(cfg)
    img4_b, g4_b = grad4_of(cfg.replace(impl="pallas", bucket=4))
    record("fwd_bucket4", float(jnp.abs(img4_b - img4_t).max()),
           jnp.allclose(img4_b, img4_t, atol=IMG_ATOL))
    record_grads("grads_bucket4", g4_b, ga=g4_t)

    # ---- fused multi-view batch (view_rows path) ------------------------
    cams = ring_camera_batch(2, H, W)

    def bloss(p, c):
        out = batch_render(p, cams, bg, config=c, alive=aux.alive,
                           use_trained_exp=True)
        return jnp.sum((out.render - cams.gt_image) ** 2)

    bcfg = cfg.replace(dup_capacity=2 * cfg.dup_capacity)
    g_bt = jax.jit(jax.grad(lambda p: bloss(p, bcfg)))(params)
    g_bp = jax.jit(jax.grad(
        lambda p: bloss(p, bcfg.replace(impl="pallas"))))(params)
    record_grads("grads_batch2", g_bp, ga=g_bt)

    # ---- JVP kernel: standalone and through the LM residual operator ---
    tan = jax.tree.map(lambda x: jnp.asarray(
        np.random.default_rng(9).normal(0, 1e-3, x.shape), x.dtype), params)

    def img_fn(c):
        return lambda p: render(p, cam, bg, config=c,
                                alive=aux.alive).render

    _, jv_t = jax.jit(lambda p, t: jax.jvp(img_fn(cfg), (p,), (t,)))(
        params, tan)
    _, jv_p = jax.jit(lambda p, t: jax.jvp(
        img_fn(cfg.replace(impl="pallas_jvp")), (p,), (t,)))(params, tan)
    jsc = float(jnp.abs(jv_t).max()) + 1e-12
    record("jvp_image", float(jnp.abs(jv_p - jv_t).max()) / jsc,
           jnp.allclose(jv_p, jv_t, atol=IMG_ATOL * 10, rtol=1e-4))

    def res_fn(c):
        return lambda p: batch_residuals(p, cams, bg, config=c,
                                         disable_ssim=True,
                                         alive=aux.alive).l1

    _, rv_t = jax.jit(lambda p, t: jax.jvp(res_fn(bcfg), (p,), (t,)))(
        params, tan)
    _, rv_p = jax.jit(lambda p, t: jax.jvp(
        res_fn(bcfg.replace(impl="pallas_jvp")), (p,), (t,)))(params, tan)
    rsc = float(jnp.abs(rv_t).max()) + 1e-12
    rel = float(jnp.abs(rv_p - rv_t).max()) / rsc
    record("jvp_lm_operator", rel, rel < GRAD_RTOL)

    ok = all(v["ok"] for v in results.values())
    return {"ok": ok, "variants": results}


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    out = run_parity_matrix(quick=args.quick)
    for name, v in out["variants"].items():
        flag = "PASS" if v["ok"] else "FAIL"
        print(f"{name:18s} {flag}  max_err={v['max_err']:.3e}")
    print(json.dumps({"ok": out["ok"]}))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
