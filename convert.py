#!/usr/bin/env python
"""CLI wrapper: COLMAP dataset converter (reference convert.py surface).

python convert.py -s <location> [--resize] [--no_gpu]
"""
from gslm_tpu.tools.convert import main

if __name__ == "__main__":
    main()
