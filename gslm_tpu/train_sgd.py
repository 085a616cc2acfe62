"""SGD-batch trainer: first-order steps over strided multi-view windows.

Equivalent of the reference's train_sgd.py:71-215 — per iteration, a
random-stride (1..3) contiguous window of ``--num_images`` views is fit
with one first-order step. Where the reference loops ``loss.backward()``
per view to accumulate gradients (train_sgd.py:158-160), here the window
is one batched render and one jitted step (the view axis vmaps, and under
a (data, model) mesh it shards).

Deviations from the reference, on purpose:
- per-view losses are averaged, not summed, so learning rates don't scale
  with the batch size;
- densification uses the working masked implementation (the reference's
  SGD densify branch reads undefined variables and would crash,
  train_sgd.py:187-196 — SURVEY.md §2.1).

Usage: python -m gslm_tpu.train_sgd -s <dataset> -m <output> [--num_images N]
"""

from __future__ import annotations

import numpy as np


def main():
    from gslm_tpu.train import build_parser, training

    parser = build_parser()   # --num_images comes from the LM param group
    args = parser.parse_args()
    args.save_iterations.append(args.iterations)
    args.sgd_batch = True
    print("Optimizing " + args.model_path
          + f" (SGD windows of {args.num_images})")
    training(args)
    print("\nTraining complete.")


def select_window(num_cams: int, num_images: int,
                  rng: np.random.Generator) -> list[int]:
    """Random-stride contiguous window (reference train_sgd.py:138-150)."""
    n = min(num_images, num_cams)
    stride = int(rng.integers(1, 4))
    hi = max(num_cams - n * stride, 1)
    start = int(rng.integers(0, hi))
    return [min(start + i * stride, num_cams - 1) for i in range(n)]


if __name__ == "__main__":
    main()
