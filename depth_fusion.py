#!/usr/bin/env python
"""Root-level wrapper for depth fusion (the reference's script/depth_fusion.sh
pointed at a missing root-level file, SURVEY.md §2.6 — this provides it)."""
from uforecon_tpu.cli.depth_fusion import main

if __name__ == "__main__":
    main()
