#!/bin/bash
# Evaluate the AR bbox-predictor baseline (rollout + mask-IoU) — parity
# with the reference's demo_eval_trajeglish_baseline.sh (3 cond frames,
# batch 1, map embedding on).
DATASET="${DATASET:-kitti}"
python tools/eval_bbox_baseline.py \
    dataset="$DATASET" \
    data_root=./datasets \
    seed=0 \
    initial_frames_condition_num=3 \
    val_batch_size=1 \
    map_embedding=true "$@"
