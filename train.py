#!/usr/bin/env python
"""CLI wrapper: first-order Adam trainer (reference train.py surface).

python train.py -s <dataset> -m <output> [flags]
"""
from gslm_tpu.train import main

if __name__ == "__main__":
    main()
