"""TPU-scale quality run: Adam-with-densification to a plateau, then
LM vs Adam at equal render budget (tests/quality_harness.py at larger
shapes). Produces the README numbers.

Usage: python scripts/quality_lm_vs_adam.py [--small]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import gslm_tpu.config as cfg_mod  # noqa: E402
from tests.quality_harness import (build_problem, eval_psnr,  # noqa: E402
                                   lm_cost_in_adam_steps, run_adam, run_lm)


def main():
    small = "--small" in sys.argv
    if small:
        kw = dict(n_rich=400, n_init=60, capacity=1024, n_views=6, hw=64)
        iters, dens_until, extra = 1400, 900, 200
    else:
        # plateau regime: capacity-bounded model on a hard scene, long
        # Adam schedule so first-order progress has actually stalled
        kw = dict(n_rich=6000, n_init=400, capacity=2048, n_views=8,
                  hw=128, dup_capacity=1 << 20)
        iters, dens_until, extra = 6000, 1500, 400

    params, aux, cams, rcfg, bg = build_problem(**kw)
    p_init = eval_psnr(params, aux, cams, rcfg, bg)
    from gslm_tpu.renderer import batch_render_jit
    import jax.numpy as jnp
    ovf = batch_render_jit(params, cams, bg, config=rcfg,
                           alive=aux.alive)
    print(f"scene {kw}  init PSNR {p_init:.2f}  "
          f"dups {int(ovf.n_duplicates)} overflow {int(ovf.overflow)}",
          flush=True)

    t0 = time.time()
    params, aux = run_adam(params, aux, cams, rcfg, bg, iters=iters,
                           densify_every=100, densify_from=100,
                           densify_until=dens_until)
    p_plat = eval_psnr(params, aux, cams, rcfg, bg)
    print(f"adam@{iters}: {p_plat:.3f} dB  "
          f"alive {int(np.asarray(aux.alive).sum())}  "
          f"({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    pa, aa = run_adam(params, aux, cams, rcfg, bg, iters=extra,
                      start_iter=iters, densify_until=0)
    p_adam = eval_psnr(pa, aa, cams, rcfg, bg)
    t_adam = time.time() - t0
    print(f"adam +{extra}: {p_adam:.3f} dB (+{p_adam - p_plat:.3f}) "
          f"({t_adam:.0f}s)", flush=True)

    lm = cfg_mod.LMParams(num_images=4, num_val_views=4, val_view_stride=1,
                          cg_max_iter=2, cg_restart_iter=1,
                          line_search_steps=6, mask_xyz=False)
    n_lm = max(1, round(extra / lm_cost_in_adam_steps(lm)))
    t0 = time.time()
    pl_ = run_lm(params, aux, cams, rcfg, bg, steps=n_lm, lm=lm)
    p_lm = eval_psnr(pl_, aux, cams, rcfg, bg)
    t_lm = time.time() - t0
    print(f"lm +{n_lm} (equal render budget): {p_lm:.3f} dB "
          f"(+{p_lm - p_plat:.3f}) ({t_lm:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
