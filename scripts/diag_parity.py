"""Attribute the on-hardware grad-parity failure (bench.py stderr
``img/grad/jvp=[True, False, True]``, 2026-08-19).

Compares d(loss)/d(xyz) across reduction/impl variants on the bench's
exact parity scene, each against the tiled-XLA gradient (whose backward
is a plain scatter-add, the per-row-exact reduction order):

  pallas+scatter  : Pallas backward kernel, XLA scatter-add reduction.
  pallas+sortseg  : Pallas backward kernel, sort + two-level compensated
                    segment sum (ops/rasterize_pallas.py:185-240).

If pallas+scatter matches tiled at 1e-4 but pallas+sortseg doesn't, the
failure is the sortseg f32 precision envelope (documented 3.6e-3 worst
case, scripts/bench_scatter.py) and the fix is tolerance/precision work,
not a lowering bug. If BOTH fail, the Pallas backward kernel itself
miscompiles on hardware (tests only run it in interpreter mode).

Prints per-variant max-abs and max-rel error plus the gradient scale.
"""
from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gslm_tpu.models.cameras import camera_from_meta
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.renderer import render
    from gslm_tpu.utils.synthetic import make_camera, random_gaussians

    pp, pa = random_gaussians(np.random.default_rng(7), n=2048,
                              capacity=2048, num_images=1)
    pcam = camera_from_meta(make_camera(height=160, width=192))
    base = RasterConfig(dup_capacity=1 << 14, max_per_tile=512,
                        tile_chunk=16)
    pgt = jnp.asarray(
        np.random.default_rng(8).uniform(0, 1, (3, 160, 192)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    def grad_xyz(cfg):
        def loss(p):
            img = render(p, pcam, bg, config=cfg, alive=pa.alive).render
            return jnp.sum((img - pgt) ** 2)
        return jax.jit(jax.grad(loss))(pp).xyz

    g_ref = np.asarray(grad_xyz(base.replace(impl="tiled")), np.float64)
    scale = np.abs(g_ref).max()
    print(f"grad scale (max |g_tiled|): {scale:.6g}")
    for name, cfg in (
            ("pallas+scatter", base.replace(impl="pallas",
                                            bwd_reduce="scatter")),
            ("pallas+sortseg", base.replace(impl="pallas",
                                            bwd_reduce="sortseg")),
    ):
        g = np.asarray(grad_xyz(cfg), np.float64)
        d = np.abs(g - g_ref)
        rel = d / (np.abs(g_ref) + 1e-4 * scale)
        i = int(np.argmax(d))
        print(f"{name}: max_abs={d.max():.6g} max_rel={rel.max():.6g} "
              f"argmax row={i // 3} |g_ref|={np.abs(g_ref).flat[i]:.6g} "
              f"allclose(1e-4)={bool(np.allclose(g, g_ref, atol=1e-4, rtol=1e-4))}")


if __name__ == "__main__":
    main()
