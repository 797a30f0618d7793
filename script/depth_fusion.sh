#!/bin/bash
# Geometric-consistency depth fusion (fixed reference script/depth_fusion.sh).
python depth_fusion.py --out_dir "${OUT_DIR:-./outputs_unfavorable}" --n_view 3 "$@"
