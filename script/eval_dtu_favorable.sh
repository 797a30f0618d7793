#!/bin/bash
# Favorable 3-view depth rendering (reference script/eval_dtu_favorable.sh).
python main.py --extract_geometry --set 0 \
  --volume_type correlation --volume_reso 96 \
  --depth_pos_encoding --mvs_depth_guide 1 --explicit_similarity \
  --test_n_view 3 --test_ray_num 800 --test_ref_view 23 24 33 \
  --root_dir "$DTU_TEST_ROOT" --out_dir ./outputs_favorable \
  --load_ckpt "$CKPT" "$@"
