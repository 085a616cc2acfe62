"""Pallas kernel differentiation tests (interpret mode on CPU).

Covers the custom-VJP backward kernel, the fused custom-JVP kernel, and
their adjoint consistency — the reference's test strategy layers 1-2
(tests/test_batch_training_loss.py gradients, tests/test_matvec.py
adjoint), applied to the TPU kernels against the XLA-autodiffed tile
pipeline. On CPU both run the same float ops, so tolerances are tight
(knife-edge threshold flips only appear across different codegens).
"""

import numpy as np
import pytest

from gslm_tpu.models.cameras import camera_from_meta
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.renderer import render
from tests.synthetic_scene import blob_params
from tests.utils import make_camera

CFG = RasterConfig(dup_capacity=1 << 12, max_per_tile=256, tile_chunk=4)


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp
    params = blob_params(num_images=1)   # opaque: exercises the T freeze
    cam = camera_from_meta(make_camera(height=64, width=64, radius=5.0,
                                       angle=0.3))
    gt = jnp.zeros((3, 64, 64)).at[1].set(0.5)
    return params, cam, gt


def _loss(p, cam, gt, impl):
    import jax.numpy as jnp
    out = render(p, cam, jnp.array([0.3, 0.2, 0.1]), config=CFG, impl=impl)
    return (jnp.mean(jnp.abs(out.render - gt))
            + 0.1 * jnp.mean(out.invdepth))


def test_pallas_vjp_matches_tiled_grad(setup):
    import jax
    params, cam, gt = setup
    ga = jax.grad(lambda p: _loss(p, cam, gt, "tiled"))(params)
    gb = jax.grad(lambda p: _loss(p, cam, gt, "pallas"))(params)
    for k in ("xyz", "scaling", "rotation", "opacity", "features_dc",
              "features_rest"):
        a, b = np.asarray(getattr(ga, k)), np.asarray(getattr(gb, k))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, err_msg=k)


def test_pallas_jvp_matches_tiled_jvp(setup):
    import jax
    import jax.numpy as jnp
    params, cam, gt = setup
    rng = np.random.default_rng(3)
    v = jax.tree.map(lambda x: jnp.asarray(rng.normal(0, 1, x.shape),
                                           jnp.float32), params)

    def img(p, impl):
        return render(p, cam, jnp.zeros(3), config=CFG, impl=impl).render

    _, jt = jax.jvp(lambda p: img(p, "tiled"), (params,), (v,))
    _, jp = jax.jvp(lambda p: img(p, "pallas_jvp"), (params,), (v,))
    scale = float(jnp.abs(jt).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(jp), np.asarray(jt),
                               atol=1e-5 * scale)


def test_pallas_adjoint_consistency(setup):
    """<J v, u> == <v, J^T u> with J via the JVP kernel and J^T via the
    VJP kernel (reference tests/test_matvec.py:51-87 idea)."""
    import jax
    import jax.numpy as jnp
    import gslm_tpu.models.gaussians as G
    params, cam, gt = setup
    rng = np.random.default_rng(4)

    def img(p, impl):
        return render(p, cam, jnp.zeros(3), config=CFG, impl=impl).render

    v = jax.tree.map(lambda x: jnp.asarray(rng.normal(0, 1, x.shape),
                                           jnp.float32), params)
    u = jnp.asarray(rng.normal(0, 1, (3, 64, 64)), jnp.float32)

    _, jv = jax.jvp(lambda p: img(p, "pallas_jvp"), (params,), (v,))
    _, vjp_fn = jax.vjp(lambda p: img(p, "pallas"), params)
    (jtu,) = vjp_fn(u)

    lhs = float(jnp.vdot(jv, u))
    rhs = float(G.vdot(v, jtu))
    assert abs(lhs - rhs) < 1e-4 * max(abs(lhs), 1.0), (lhs, rhs)


@pytest.mark.parametrize("payload_sort_max", [1 << 30, 0])
def test_segment_reduce_sorted_exact(payload_sort_max, monkeypatch):
    """sortseg's segment sum must stay in the scatter-add's error class:
    r3's cumsum-difference variant drifted to 3.6e-3 worst-case (error
    scaled with BLOCK content, not segment content) and failed the 1e-4
    on-hardware grad parity gate (BENCH_r03). The segmented-scan variant
    only ever adds within a segment — pin ~eps*|segment| accuracy vs
    float64, including sentinel (gid=P) dead rows and empty segments.

    Parametrized over both formulations: the payload sort (small L) and
    the permutation-sort + row gather that large L dispatches to (the
    11-column sort OOMed the compile helper at the million-Gaussian
    L=10.5M; threshold _SEG_PAYLOAD_SORT_MAX)."""
    import jax.numpy as jnp
    from gslm_tpu.ops import rasterize_pallas as rp
    monkeypatch.setattr(rp, "_SEG_PAYLOAD_SORT_MAX",
                        payload_sort_max or 0)
    rng = np.random.default_rng(0)
    P, L = 300, 20000
    gid = rng.integers(0, P + 1, L).astype(np.int32)   # P = sentinel
    gid[gid == 7] = 8                                  # force an empty seg
    d = (rng.normal(0, 1, (L, 10)) * 100).astype(np.float32)
    counts = np.bincount(gid, minlength=P + 1)[:P]
    offs = np.zeros(P + 1, np.int32)
    offs[1:] = np.cumsum(counts)
    out = np.asarray(rp._segment_reduce_sorted(
        jnp.asarray(d), jnp.asarray(gid), jnp.asarray(offs)))
    gt = np.zeros((P, 10))
    for g in range(P):
        gt[g] = d[gid == g].astype(np.float64).sum(axis=0)
    seg_content = np.abs(d).astype(np.float64).sum() / P
    assert np.abs(out - gt).max() < 1e-5 * seg_content
    assert np.all(out[7] == 0.0)


@pytest.mark.slow
def test_pallas_sortseg_permgather_grad_matches_scatter(setup, monkeypatch):
    """The large-L permutation-gather sortseg formulation must reproduce
    the scatter-add gradients end-to-end through the kernel backward
    (forced here by dropping the dispatch threshold to 0)."""
    import jax
    from gslm_tpu.ops import rasterize_pallas as rp
    monkeypatch.setattr(rp, "_SEG_PAYLOAD_SORT_MAX", 0)
    jax.clear_caches()   # same shapes/config as other tests: force retrace
    params, cam, gt = setup
    try:
        def loss(p, reduce):
            import jax.numpy as jnp
            out = render(p, cam, jnp.array([0.3, 0.2, 0.1]),
                         config=CFG.replace(bwd_reduce=reduce),
                         impl="pallas")
            return (jnp.mean(jnp.abs(out.render - gt))
                    + 0.1 * jnp.mean(out.invdepth))

        ga = jax.grad(lambda p: loss(p, "scatter"))(params)
        gb = jax.grad(lambda p: loss(p, "sortseg"))(params)
        for k in ("xyz", "scaling", "rotation", "opacity", "features_dc",
                  "features_rest"):
            a, b = np.asarray(getattr(ga, k)), np.asarray(getattr(gb, k))
            scale = np.abs(a).max() + 1e-12
            np.testing.assert_allclose(b, a, atol=1e-5 * scale, err_msg=k)
    finally:
        jax.clear_caches()   # don't leak threshold-0 executables


def test_pallas_sortseg_grad_matches_scatter(setup):
    """bwd_reduce='sortseg' must reproduce the scatter-add gradients at
    the hardware parity gate's tolerance."""
    import jax
    params, cam, gt = setup

    def loss(p, reduce):
        import jax.numpy as jnp
        out = render(p, cam, jnp.array([0.3, 0.2, 0.1]),
                     config=CFG.replace(bwd_reduce=reduce), impl="pallas")
        return (jnp.mean(jnp.abs(out.render - gt))
                + 0.1 * jnp.mean(out.invdepth))

    ga = jax.grad(lambda p: loss(p, "scatter"))(params)
    gb = jax.grad(lambda p: loss(p, "sortseg"))(params)
    for k in ("xyz", "scaling", "rotation", "opacity", "features_dc",
              "features_rest"):
        a, b = np.asarray(getattr(ga, k)), np.asarray(getattr(gb, k))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, err_msg=k)


def test_pallas_grad_through_vmap(setup):
    """Batched (vmapped) renders differentiate through the kernel."""
    import jax
    import jax.numpy as jnp
    from gslm_tpu.renderer import batch_render
    from tests.utils import ring_camera_batch
    params, _, _ = setup
    cams = ring_camera_batch(2, 32, 32)

    def loss(p):
        out = batch_render(p, cams, jnp.zeros(3), config=CFG, impl="pallas")
        return jnp.mean(jnp.abs(out.render - cams.gt_image))

    g = jax.grad(loss)(params)
    for k in ("xyz", "scaling", "opacity"):
        assert np.isfinite(np.asarray(getattr(g, k))).all(), k
    assert float(jnp.abs(g.xyz).max()) > 0
