#!/usr/bin/env python
"""CLI wrapper: render trained model views (reference render.py surface).

python render.py -m <model> [--iteration N] [--skip_train] [--skip_test]
"""
from gslm_tpu.eval.render_sets import main

if __name__ == "__main__":
    main()
