#!/usr/bin/env python
"""CLI wrapper: two-phase LM trainer (reference train_jvp.py surface).

python train_jvp.py -s <dataset> -m <output> [--jvp_start N] [flags]
"""
from gslm_tpu.train_lm import main

if __name__ == "__main__":
    main()
