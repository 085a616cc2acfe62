#!/usr/bin/env python
"""CLI wrapper: SSIM/PSNR/LPIPS metrics (reference metrics.py surface).

python metrics.py -m <model_path> [<model_path> ...]
"""
from gslm_tpu.eval.metrics import main

if __name__ == "__main__":
    main()
