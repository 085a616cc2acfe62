"""Time full fwd and fwd+bwd at the bench shape for one PACK/L setting.

Usage: GSLM_RASTER_PACK=n python scripts/sweep_pack.py [L]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu.models.cameras import camera_from_meta
from gslm_tpu.ops.rasterize_tiled import RasterConfig
from gslm_tpu.renderer import render
from gslm_tpu.utils.synthetic import make_camera, random_gaussians


from gslm_tpu.utils.profiling import timeit_ms as _timeit_ms


def timeit(fn, args, iters=10):
    return _timeit_ms(fn, args, iters=iters)


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 21)
    n_gauss, H, W = 131_072, 1080, 1920
    cfg = RasterConfig(dup_capacity=L, max_per_tile=1024,
                       tile_chunk=64, impl="pallas")
    rng = np.random.default_rng(0)
    params, aux = random_gaussians(rng, n=n_gauss, capacity=n_gauss,
                                   num_images=2, spread=1.5,
                                   scale_range=(-5.5, -3.5))
    camera = camera_from_meta(make_camera(height=H, width=W))
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)

    @jax.jit
    def fwd(p):
        return render(p, camera, bg, config=cfg, alive=aux.alive).render

    @jax.jit
    def fwd_bwd(p):
        def loss_fn(p):
            img = render(p, camera, bg, config=cfg, alive=aux.alive).render
            return jnp.mean(jnp.abs(img - gt))
        return jax.value_and_grad(loss_fn)(p)[1].xyz

    from gslm_tpu.ops.rasterize_pallas import PACK
    print(f"PACK={PACK} L={L}", flush=True)
    print(f"  fwd     {timeit(fwd, (params,)):8.2f} ms", flush=True)
    print(f"  fwd+bwd {timeit(fwd_bwd, (params,), iters=5):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
