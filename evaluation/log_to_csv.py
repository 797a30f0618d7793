#!/usr/bin/env python
"""Wrapper matching the reference path evaluation/log_to_csv.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from uforecon_tpu.cli.log_to_csv import main

if __name__ == "__main__":
    main()
