#!/usr/bin/env python
"""CLI wrapper: full multi-scene benchmark (reference full_eval.py surface).

python full_eval.py -m360 <mipnerf360> -tat <t&t> -db <deepblending>
"""
from gslm_tpu.eval.full_eval import main

if __name__ == "__main__":
    main()
