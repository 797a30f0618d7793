#!/usr/bin/env python
"""UFORecon-TPU entry shim — keeps the reference invocation working.

The reference is driven as ``python main.py ...`` (reference main.py:106-230);
the real dispatch lives in the installable package at
``uforecon_tpu/cli/run.py`` (also exposed as the ``uforecon`` console
script). This shim only forwards.
"""
from uforecon_tpu.cli.run import main

if __name__ == "__main__":
    main()
