#!/usr/bin/env python
"""Wrapper matching the reference path evaluation/clean_mesh.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from uforecon_tpu.cli.clean_mesh import main

if __name__ == "__main__":
    main()
