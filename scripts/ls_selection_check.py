"""Selection-equality evidence for the resolution-staged line search.

``LMParams.ls_val_scale=2`` ranks the line-search alphas on val views
rendered at half resolution and re-scores only the winner at full
resolution. The deviation from the reference-faithful path is the
RANKING only — this script measures, on the quality-harness plateau
problem, how often the half-res ranking picks the same alpha as the
full-res ranking across many independent LM outer steps (different
windows), and the full-res val-loss regret when it differs.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
         python scripts/ls_selection_check.py [--steps 10] [--scale 2]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    import gslm_tpu.config as cfg_mod
    from gslm_tpu.train_lm import lm_outer_step
    from tests.quality_harness import build_problem, run_adam

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # hw=128: the Pallas SSIM blur needs 128-aligned widths on TPU (the
    # quality-defense runs use the same shape)
    params, aux, cams, rcfg, bg = build_problem(
        seed=args.seed, n_rich=6000, n_init=400, capacity=2048, n_views=8,
        hw=128, dup_capacity=1 << 20)
    params, aux = run_adam(params, aux, cams, rcfg, bg, iters=1500,
                           densify_every=100, densify_from=100,
                           densify_until=900, seed=args.seed + 1)
    n = cams.world_view.shape[0]
    lm = cfg_mod.LMParams(num_images=4, micro_batch=4, num_val_views=n,
                          val_view_stride=1, cg_max_iter=4,
                          cg_restart_iter=1, line_search_steps=6,
                          mask_xyz=False)
    lm_r = dataclasses.replace(lm, ls_val_scale=args.scale)

    rng = np.random.default_rng(args.seed + 7)
    same = 0
    regrets = []
    for i in range(args.steps):
        start = int(rng.integers(0, n - 4))
        win = jax.tree.map(lambda x: x[start:start + 4], cams)
        _, info_f = lm_outer_step(params, aux.alive, win, cams, bg,
                                  rcfg=rcfg, lm=lm, active_sh_degree=3,
                                  use_exp=False)
        _, info_r = lm_outer_step(params, aux.alive, win, cams, bg,
                                  rcfg=rcfg, lm=lm_r, active_sh_degree=3,
                                  use_exp=False)
        a_f = float(info_f["best_alpha"])
        a_r = float(info_r["best_alpha"])
        # full-res losses of every alpha come from the faithful run
        losses_f = np.asarray(info_f["val_losses"])
        alphas = [lm.line_search_alpha0 * 0.5 ** k
                  for k in range(lm.line_search_steps + 1)]
        regret = (losses_f[alphas.index(a_r)] - losses_f.min()) \
            / max(losses_f.min(), 1e-12)
        same += a_f == a_r
        regrets.append(regret)
        print(f"step {i}: full-res alpha {a_f:.4f}  half-res alpha "
              f"{a_r:.4f}  regret {regret:.2e}", flush=True)
        # advance the state a little so steps see different parameters
        params, _ = lm_outer_step(params, aux.alive, win, cams, bg,
                                  rcfg=rcfg, lm=lm, active_sh_degree=3,
                                  use_exp=False)
    print(f"\nselection equality: {same}/{args.steps}; mean relative "
          f"full-res val-loss regret of half-res choice: "
          f"{np.mean(regrets):.3e} (max {np.max(regrets):.3e})", flush=True)


if __name__ == "__main__":
    main()
