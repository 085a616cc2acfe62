#!/usr/bin/env python
"""CLI wrapper: SGD-batch trainer (reference train_sgd.py surface).

python train_sgd.py -s <dataset> -m <output> [--num_images N]
"""
from gslm_tpu.train_sgd import main

if __name__ == "__main__":
    main()
