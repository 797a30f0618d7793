#!/usr/bin/env python
"""Root-level wrapper matching the reference script name (tsdf_fusion.py)."""
from uforecon_tpu.cli.tsdf_fusion import main

if __name__ == "__main__":
    main()
