"""Bucket-binned raster tests (RasterConfig.bucket > 1, Pallas path).

Bucket mode bins stages 1-3 at bucket²-tile granularity; each 16x16 tile
walks its parent bucket's segment, and records gated out by the rect /
alpha tests contribute exactly 0 — the remaining difference vs bucket=1
is chunk-BOUNDARY rounding in the carried transmittance product
(exp(a+b) vs exp(a)*exp(b); a few ulp, measured 1.8e-7), so forward
output matches at 1e-6, gradients at the parity-gate tolerance (the
backward accumulates bucket member tiles in one program), and the JVP
kernel agrees. Record counts shrink (that's the point: the sort and
gather are row-bound — measured ~3x fewer records at m1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslm_tpu.models.cameras import camera_from_meta
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.renderer import batch_render, render
from tests.utils import make_camera, random_gaussians, ring_camera_batch

BG = jnp.zeros(3)
CFG = RasterConfig(dup_capacity=1 << 14, max_per_tile=256, tile_chunk=16,
                   impl="pallas", cull=False)


def _scene(rng, n=512):
    params, aux = random_gaussians(rng, n=n, capacity=n)
    cam = camera_from_meta(make_camera(height=96, width=128))
    return params, aux, cam


@pytest.mark.smoke
def test_bucket_forward_bitwise(rng):
    params, aux, cam = _scene(rng)
    base = render(params, cam, BG, config=CFG, alive=aux.alive)
    buck = render(params, cam, BG, config=CFG.replace(bucket=2),
                  alive=aux.alive)
    assert int(buck.n_duplicates) < int(base.n_duplicates), \
        "bucket binning should shrink the record stream"
    np.testing.assert_allclose(np.asarray(buck.render),
                               np.asarray(base.render), atol=1e-6)
    np.testing.assert_allclose(np.asarray(buck.invdepth),
                               np.asarray(base.invdepth), atol=1e-6)
    assert int(buck.overflow) == 0


def test_bucket_forward_with_cull(rng):
    params, aux, cam = _scene(rng)
    ccfg = CFG.replace(cull=True, live_capacity=(1 << 14) - (1 << 12))
    base = render(params, cam, BG, config=ccfg, alive=aux.alive)
    buck = render(params, cam, BG, config=ccfg.replace(bucket=2),
                  alive=aux.alive)
    assert int(buck.overflow) == 0
    # bucket-level cull keeps a superset of the tile-level survivors;
    # zero-weight extras shift nothing (alpha exactly 0)
    np.testing.assert_allclose(np.asarray(buck.render),
                               np.asarray(base.render), atol=1e-6)


@pytest.mark.parametrize("bucket,reduce", [(2, "scatter"), (2, "sortseg"),
                                           (4, "scatter")])
def test_bucket_grads_match(rng, bucket, reduce):
    # bucket=4 needs view_rows % 4 == 0 -> 128-px-tall camera (8 rows);
    # its backward runs one 16-member-tile bucket per program (B2=16)
    params, aux = random_gaussians(rng, n=512, capacity=512)
    cam = camera_from_meta(make_camera(height=128 if bucket == 4 else 96,
                                       width=128))
    gt = jnp.asarray(rng.uniform(0, 1, (3, cam.height, cam.width)),
                     jnp.float32)

    def loss(p, cfg):
        out = render(p, cam, BG, config=cfg, alive=aux.alive)
        return (jnp.sum((out.render - gt) ** 2)
                + 0.1 * jnp.sum(out.invdepth))

    g1 = jax.grad(lambda p: loss(p, CFG.replace(bwd_reduce=reduce)))(params)
    g2 = jax.grad(lambda p: loss(
        p, CFG.replace(bucket=bucket, bwd_reduce=reduce)))(params)
    for k in ("xyz", "scaling", "rotation", "opacity", "features_dc",
              "features_rest"):
        a, b = np.asarray(getattr(g1, k)), np.asarray(getattr(g2, k))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, err_msg=k)


def test_bucket_jvp_matches(rng):
    params, aux, cam = _scene(rng)
    tan = jax.tree.map(
        lambda x: jnp.asarray(rng.normal(0, 1e-2, x.shape), x.dtype), params)

    def img(p, cfg):
        return render(p, cam, BG, config=cfg, alive=aux.alive,
                      impl="pallas_jvp").render

    _, j1 = jax.jvp(lambda p: img(p, CFG), (params,), (tan,))
    _, j2 = jax.jvp(lambda p: img(p, CFG.replace(bucket=2)), (params,),
                    (tan,))
    scale = float(jnp.abs(j1).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(j2), np.asarray(j1),
                               atol=1e-6 * scale)


def test_bucket_batched_views(rng):
    """Fused multi-view stacking: bucket rows must stay view-local
    (view_rows % bucket == 0)."""
    params, aux = random_gaussians(rng, n=512, capacity=512, num_images=2)
    cams = ring_camera_batch(2, 96, 128)
    bcfg = CFG.replace(dup_capacity=1 << 15)
    base = batch_render(params, cams, BG, config=bcfg, alive=aux.alive)
    buck = batch_render(params, cams, BG, config=bcfg.replace(bucket=2),
                        alive=aux.alive)
    np.testing.assert_allclose(np.asarray(buck.render),
                               np.asarray(base.render), atol=1e-6)
    assert int(buck.n_duplicates) < int(base.n_duplicates)
