#!/bin/bash
# Mask/frustum mesh cleaning (reference script/clean_mesh.sh).
python evaluation/clean_mesh.py --out_dir "${OUT_DIR:-./outputs_unfavorable}" \
  --root_dir "$DTU_TEST_ROOT" --n_view 3 --test_ref_view 1 16 36 "$@"
