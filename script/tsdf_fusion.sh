#!/bin/bash
# TSDF fusion over the rendered depth maps (reference script/tsdf_fusion.sh).
python tsdf_fusion.py --out_dir "${OUT_DIR:-./outputs_unfavorable}" \
  --n_view 3 --voxel_size 1.5 "$@"
