#!/usr/bin/env python
"""Top-level CLI (the run_FourierGrid.py equivalent).

Usage: python run_unbounded.py --config configs/nerf/lego.py --program train
"""
from unboundednerfpytorch_tpu.cli.main import main

if __name__ == "__main__":
    raise SystemExit(main())
