"""TPU-scale quality run: Adam-with-densification to a plateau, then
LM vs Adam at equal render budget (tests/quality_harness.py at larger
shapes), repeated over several seeds so the README claim carries error
bars (VERDICT r2 weak #6). Produces the README numbers.

Usage: python scripts/quality_lm_vs_adam.py [--small] [--large]
                                            [--seeds N]
                                            [--win W --cg K --ls S]
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


def run_one(seed: int, kw: dict, iters: int, dens_until: int, extra: int,
            lm=None):
    params, aux, cams, rcfg, bg = build_problem(seed=seed, **kw)
    p_init = eval_psnr(params, aux, cams, rcfg, bg)

    t0 = time.time()
    params, aux = run_adam(params, aux, cams, rcfg, bg, iters=iters,
                           densify_every=100, densify_from=100,
                           densify_until=dens_until, seed=seed + 1)
    p_plat = eval_psnr(params, aux, cams, rcfg, bg)
    n_alive = int(np.asarray(aux.alive).sum())
    print(f"[seed {seed}] init {p_init:.2f} -> adam@{iters} {p_plat:.3f} dB"
          f"  alive {n_alive}  ({time.time() - t0:.0f}s)", flush=True)

    pa, aa = run_adam(params, aux, cams, rcfg, bg, iters=extra,
                      start_iter=iters, densify_until=0, seed=seed + 2)
    p_adam = eval_psnr(pa, aa, cams, rcfg, bg)

    lm = lm or cfg_mod.LMParams(num_images=4, num_val_views=4,
                                val_view_stride=1, cg_max_iter=2,
                                cg_restart_iter=1, line_search_steps=6,
                                mask_xyz=False)
    n_lm = max(1, round(extra / lm_cost_in_adam_steps(lm)))
    pl_ = run_lm(params, aux, cams, rcfg, bg, steps=n_lm, lm=lm,
                 seed=seed + 3)
    p_lm = eval_psnr(pl_, aux, cams, rcfg, bg)
    print(f"[seed {seed}] plateau {p_plat:.3f}  adam+{extra} {p_adam:.3f} "
          f"(+{p_adam - p_plat:.3f})  lm+{n_lm} {p_lm:.3f} "
          f"(+{p_lm - p_plat:.3f})", flush=True)
    return p_plat, p_adam, p_lm


def main():
    small = "--small" in sys.argv
    large = "--large" in sys.argv
    n_seeds = 3
    if "--seeds" in sys.argv:
        n_seeds = int(sys.argv[sys.argv.index("--seeds") + 1])

    def argval(flag, default):
        return (int(sys.argv[sys.argv.index(flag) + 1])
                if flag in sys.argv else default)

    lm = None
    if any(f in sys.argv for f in ("--win", "--cg", "--ls")):
        # r3 finding (README): in the capacity-starved regime narrow
        # windows with cg 2 trail Adam; full-window normal equations
        # (window 8 / cg 4) win. Expose the knobs so the on-chip defense
        # runs at the winning settings (VERDICT r3 next #7).
        lm = cfg_mod.LMParams(
            num_images=argval("--win", 8), num_val_views=8,
            val_view_stride=1, cg_max_iter=argval("--cg", 4),
            cg_restart_iter=1, line_search_steps=argval("--ls", 6),
            mask_xyz=False)
    if small:
        kw = dict(n_rich=400, n_init=60, capacity=1024, n_views=6, hw=64)
        iters, dens_until, extra = 1400, 900, 200
    elif large:
        # VERDICT r2 #7: >=256^2, >=100k Gaussians on hardware
        kw = dict(n_rich=120_000, n_init=8_000, capacity=131_072,
                  n_views=8, hw=256, dup_capacity=1 << 21)
        iters, dens_until, extra = 6000, 1500, 400
    else:
        # plateau regime: capacity-bounded model on a hard scene, long
        # Adam schedule so first-order progress has actually stalled
        kw = dict(n_rich=6000, n_init=400, capacity=2048, n_views=8,
                  hw=128, dup_capacity=1 << 20)
        iters, dens_until, extra = 6000, 1500, 400

    if lm is not None:
        print(f"LM settings: window {lm.num_images} / cg {lm.cg_max_iter} "
              f"/ ls {lm.line_search_steps}")
    rows = [run_one(s, kw, iters, dens_until, extra, lm=lm)
            for s in range(n_seeds)]
    plat, adam, lm = (np.array(c) for c in zip(*rows))
    d_adam, d_lm = adam - plat, lm - plat
    print(f"\n=== {n_seeds} seeds, scene {kw} ===")
    print(f"plateau      {plat.mean():.3f} ± {plat.std():.3f} dB")
    print(f"adam delta  +{d_adam.mean():.3f} ± {d_adam.std():.3f} dB")
    print(f"lm delta    +{d_lm.mean():.3f} ± {d_lm.std():.3f} dB")
    print(f"lm - adam   {(d_lm - d_adam).mean():+.3f} "
          f"± {(d_lm - d_adam).std():.3f} dB")


if __name__ == "__main__":
    main()
