#!/bin/bash
# Unfavorable 3-view depth rendering (reference script/eval_dtu_unfavorable.sh).
python main.py --extract_geometry --set 0 \
  --volume_type correlation --volume_reso 96 \
  --depth_pos_encoding --mvs_depth_guide 1 --explicit_similarity \
  --test_n_view 3 --test_ray_num 800 --test_ref_view 1 16 36 \
  --root_dir "$DTU_TEST_ROOT" --out_dir ./outputs_unfavorable \
  --load_ckpt "$CKPT" "$@"
