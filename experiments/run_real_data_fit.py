"""Kinesin-II real-data validation fit (fit_over_real_data.py).

Usage: python experiments/run_real_data_fit.py [--outdir DIR]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

from hydrolim_tpu.fit.real_data import main as fit_main

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="real_data_out")
    a = p.parse_args()
    fit_main(a.outdir)
