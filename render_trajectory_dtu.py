#!/usr/bin/env python
"""Root-level wrapper matching the reference name (render_trajectory_dtu.py)."""
from uforecon_tpu.cli.render_trajectory import main

if __name__ == "__main__":
    main()
