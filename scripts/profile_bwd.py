"""A/B timing of backward-pass components at bench shape on the real chip."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu.models.cameras import camera_from_meta
from gslm_tpu.ops.projection import preprocess, TILE
from gslm_tpu.ops.rasterize_tiled import RasterConfig, duplicate_sort_ranges, _cdiv
from gslm_tpu.ops import rasterize_pallas as rp
from gslm_tpu.renderer import render
from gslm_tpu.utils.synthetic import make_camera, random_gaussians


from gslm_tpu.utils.profiling import timeit_ms as _timeit_ms


def timeit(fn, args, iters=6):
    return _timeit_ms(fn, args, iters=iters)


def main():
    n_gauss, H, W = 131_072, 1080, 1920
    L = 1_638_400
    cfg = RasterConfig(dup_capacity=L, max_per_tile=1024,
                       tile_chunk=64, impl="pallas")
    rng = np.random.default_rng(0)
    params, aux = random_gaussians(rng, n=n_gauss, capacity=n_gauss,
                                   num_images=2, spread=1.5,
                                   scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    ntx, nty = _cdiv(W, TILE), _cdiv(H, TILE)

    @jax.jit
    def fb(p):
        def loss_fn(p):
            img = render(p, camera, bg, config=cfg, alive=aux.alive).render
            return jnp.mean(jnp.abs(img - gt))
        return jax.value_and_grad(loss_fn)(p)[1].xyz

    @jax.jit
    def fwd(p):
        return render(p, camera, bg, config=cfg, alive=aux.alive).render

    # standalone: scatter-add of (L,10) rows into (P+1,10)
    splats = jax.jit(lambda p: preprocess(p, camera, active_sh_degree=3,
                                          alive=aux.alive))(params)
    order, gid2, starts, ends, totals = jax.jit(
        lambda s: duplicate_sort_ranges(s, ntx, nty, L))(splats)
    dfeat = jnp.ones((L, 10), jnp.float32)

    @jax.jit
    def scat(dfeat, gid2):
        return jnp.zeros((n_gauss + 1, 10), jnp.float32).at[gid2].add(dfeat)

    # standalone bwd kernel call
    counts = ends - starts
    n_programs = _cdiv(ntx * nty, rp.GROUP)
    nt_pad = n_programs * rp.GROUP
    starts_plus = jnp.concatenate([
        starts.astype(jnp.int32),
        jnp.zeros((nt_pad - ntx * nty,), jnp.int32),
        jnp.array([ntx, nty], jnp.int32)])
    counts_pad = jnp.concatenate(
        [counts, jnp.zeros((nt_pad - ntx * nty,), jnp.int32)])
    ps = rp._SPECS[1]
    feat = jnp.zeros(((L + rp.K) // 1, 128), jnp.float32)
    tiles = jax.jit(lambda f, s, c: rp._fwd_call(
        f, s, c, n_programs=n_programs, interpret=False, pack=1))(
        feat, starts_plus, counts_pad)
    gtiles = jnp.ones_like(tiles)

    @jax.jit
    def bwdk(f, s, c, g, t):
        return rp._bwd_call(f, s, c, g, t, n_programs=n_programs,
                            interpret=False, pack=1)

    total = totals[0] if isinstance(totals, tuple) else totals
    print(f"total records {int(total)}")
    print(f"fwd            {timeit(fwd, (params,)):8.2f} ms", flush=True)
    print(f"fwd+bwd        {timeit(fb, (params,)):8.2f} ms", flush=True)
    print(f"scatter L->P   {timeit(scat, (dfeat, gid2)):8.2f} ms", flush=True)
    print(f"fwd kernel     {timeit(jax.jit(lambda f,s,c: rp._fwd_call(f,s,c,n_programs=n_programs,interpret=False,pack=1)), (feat, starts_plus, counts_pad)):8.2f} ms", flush=True)
    print(f"bwd kernel     {timeit(bwdk, (feat, starts_plus, counts_pad, gtiles, tiles)):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
