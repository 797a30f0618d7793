#!/bin/bash
# Chamfer scoring against the DTU SampleSet GT (reference script/eval_dtu_result.sh).
python evaluation/dtu_eval.py --mesh_dir "${OUT_DIR:-./outputs_unfavorable}/mesh/final" \
  --dataset_dir "$DTU_SAMPLESET_ROOT" --log_dir . "$@"
python evaluation/log_to_csv.py --log eval_final.log --out out.csv
