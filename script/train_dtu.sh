#!/bin/bash
# Training on DTU (reference script/train_dtu.sh equivalent).
python main.py \
  --max_epochs 16 --batch_size 1 --uforecon_lr 0.0001 \
  --train_ray_num 1024 --train_n_view 5 \
  --view_selection_type best \
  --volume_type correlation --volume_reso 96 \
  --mvs_depth_guide 1 --depth_pos_encoding --explicit_similarity \
  --root_dir "$DTU_TRAIN_ROOT" --logdir ./logdir "$@"
