#!/usr/bin/env python
"""Wrapper matching the reference path evaluation/dtu_eval.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from uforecon_tpu.cli.dtu_eval import main

if __name__ == "__main__":
    main()
