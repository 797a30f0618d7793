#!/usr/bin/env python
"""Root-level wrapper matching the reference script name (colmap2mvsnet.py)."""
from uforecon_tpu.cli.colmap2mvsnet import main

if __name__ == "__main__":
    main()
