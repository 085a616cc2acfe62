"""Rasterizer golden tests: tiled production path vs dense reference path.

Mirrors the reference's tests/test_batch_render.py golden strategy (batch
path vs orig rasterizer, allclose atol 1e-6) but self-contained on synthetic
scenes — no dataset needed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslm_tpu.models.cameras import camera_from_meta
from gslm_tpu.ops.projection import preprocess
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.renderer import batch_render_jit as batch_render, render_jit as render

from tests.utils import make_camera, random_gaussians

CFG = RasterConfig(dup_capacity=1 << 14, max_per_tile=256, tile_chunk=8)
BG = jnp.zeros(3)


def test_preprocess_finite(rng):
    params, aux = random_gaussians(rng, n=64)
    cam = camera_from_meta(make_camera())
    sp = preprocess(params, cam, active_sh_degree=3)
    for leaf in jax.tree.leaves(sp):
        arr = np.asarray(leaf, dtype=np.float64)
        assert not np.isnan(arr).any()
    assert bool(sp.visible.any()), "expected some visible gaussians"


@pytest.mark.smoke
def test_tiled_matches_ref(rng):
    params, aux = random_gaussians(rng, n=256)
    cam = camera_from_meta(make_camera(height=72, width=96, angle=0.3))
    out_ref = render(params, cam, BG, config=CFG, impl="ref")
    out_tiled = render(params, cam, BG, config=CFG, impl="tiled")
    assert int(out_tiled.overflow) == 0
    np.testing.assert_allclose(np.asarray(out_tiled.render),
                               np.asarray(out_ref.render), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_tiled.invdepth),
                               np.asarray(out_ref.invdepth), atol=1e-6)


def test_tiled_matches_ref_nonzero_bg(rng):
    params, aux = random_gaussians(rng, n=128)
    cam = camera_from_meta(make_camera(height=64, width=64, angle=-0.5))
    bg = jnp.asarray([1.0, 0.5, 0.25])
    out_ref = render(params, cam, bg, config=CFG, impl="ref")
    out_tiled = render(params, cam, bg, config=CFG, impl="tiled")
    np.testing.assert_allclose(np.asarray(out_tiled.render),
                               np.asarray(out_ref.render), atol=1e-6)


def test_dead_slots_do_not_render(rng):
    params, aux = random_gaussians(rng, n=64, capacity=256)
    cam = camera_from_meta(make_camera())
    out_padded = render(params, cam, BG, config=CFG, impl="ref",
                        alive=aux.alive)
    params_live = jax.tree.map(
        lambda x: x[:64] if x.shape[:1] == (256,) else x, params)
    out_live = render(params_live, cam, BG, config=CFG, impl="ref")
    np.testing.assert_allclose(np.asarray(out_padded.render),
                               np.asarray(out_live.render), atol=1e-6)


def test_grad_matches_between_impls(rng):
    params, aux = random_gaussians(rng, n=96)
    cam = camera_from_meta(make_camera(height=48, width=48))
    gt = jnp.asarray(rng.uniform(0, 1, (3, 48, 48)), jnp.float32)

    def loss(p, impl):
        img = render(p, cam, BG, config=CFG, impl=impl).render
        return jnp.sum((img - gt) ** 2)

    g_ref = jax.grad(lambda p: loss(p, "ref"))(params)
    g_tiled = jax.grad(lambda p: loss(p, "tiled"))(params)
    for name in ("xyz", "features_dc", "scaling", "rotation", "opacity"):
        # rtol covers f32 summation-order rounding on O(10)-magnitude grads
        # (the two compositors reduce in different orders); the reference's
        # 1e-5 threshold (tests/test_batch_training_loss.py:104-110) is on
        # normalized per-pixel losses.
        np.testing.assert_allclose(np.asarray(getattr(g_tiled, name)),
                                   np.asarray(getattr(g_ref, name)),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"grad mismatch in {name}")


def test_jvp_matches_between_impls(rng):
    params, aux = random_gaussians(rng, n=96)
    cam = camera_from_meta(make_camera(height=48, width=48))
    tangent = jax.tree.map(
        lambda x: jnp.asarray(np.random.default_rng(7).normal(
            0, 1e-3, x.shape), x.dtype), params)

    def img_fn(p, impl):
        return render(p, cam, BG, config=CFG, impl=impl).render

    _, jv_ref = jax.jvp(lambda p: img_fn(p, "ref"), (params,), (tangent,))
    _, jv_tiled = jax.jvp(lambda p: img_fn(p, "tiled"), (params,), (tangent,))
    np.testing.assert_allclose(np.asarray(jv_tiled), np.asarray(jv_ref),
                               atol=1e-6)


def test_batch_render_consistent_with_single(rng):
    from gslm_tpu.models.cameras import batch_from_metas
    params, aux = random_gaussians(rng, n=128)
    metas = [make_camera(height=64, width=64, angle=a, exposure_idx=i)
             for i, a in enumerate((0.0, 0.4, -0.4))]
    batch = batch_from_metas(metas)
    out_b = batch_render(params, batch, BG, config=CFG)
    for i, m in enumerate(metas):
        out_1 = render(params, camera_from_meta(m), BG, config=CFG)
        np.testing.assert_allclose(np.asarray(out_b.render[i]),
                                   np.asarray(out_1.render), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out_b.radii[i]),
                                      np.asarray(out_1.radii))


@pytest.mark.slow
def test_overflow_recovers_exactly_at_doubled_capacity(rng):
    """Forced duplicate-buffer overflow: the flag must fire, and re-running
    at doubled capacity must reproduce the ample-capacity render exactly —
    the contract behind the trainer's overflow-retry loop (train.py; the
    reference resizes its CUDA buffers on demand)."""
    params, aux = random_gaussians(rng, n=96)
    cam = camera_from_meta(make_camera(height=64, width=64))

    big = RasterConfig(dup_capacity=1 << 12, max_per_tile=256, tile_chunk=4)
    ref = render(params, cam, BG, config=big).render
    out_big = render(params, cam, BG, config=big)
    assert int(out_big.overflow) == 0
    n_dup = int(out_big.n_duplicates)

    small = big.replace(dup_capacity=max(64, n_dup // 3))
    out_small = render(params, cam, BG, config=small)
    assert int(out_small.overflow) == 1          # reported, render degraded

    grown = small
    for _ in range(4):                            # trainer retry loop
        if int(render(params, cam, BG, config=grown).overflow) == 0:
            break
        grown = grown.replace(dup_capacity=2 * grown.dup_capacity)
    out_rec = render(params, cam, BG, config=grown)
    assert int(out_rec.overflow) == 0
    np.testing.assert_array_equal(np.asarray(out_rec.render),
                                  np.asarray(ref))


def test_antialiasing_parity_and_semantics(rng):
    """antialiasing=True (EWA opacity rescale by sqrt(det_orig/det)):
    tiled ≡ dense-reference, and AA opacities are <= plain ones."""
    params, aux = random_gaussians(rng, n=128)
    cam = camera_from_meta(make_camera(height=64, width=64))
    aa = CFG.replace(antialiasing=True)
    out_ref = render(params, cam, BG, config=aa, impl="ref")
    out_tiled = render(params, cam, BG, config=aa, impl="tiled")
    np.testing.assert_allclose(np.asarray(out_tiled.render),
                               np.asarray(out_ref.render), atol=1e-6)
    sp_plain = preprocess(params, cam, active_sh_degree=3)
    sp_aa = preprocess(params, cam, active_sh_degree=3, antialiasing=True)
    assert np.all(np.asarray(sp_aa.opacity) <=
                  np.asarray(sp_plain.opacity) + 1e-7)
    assert np.any(np.asarray(sp_aa.opacity) <
                  np.asarray(sp_plain.opacity) - 1e-5)
