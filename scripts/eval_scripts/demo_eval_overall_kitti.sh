#!/bin/bash
# Overall two-stage eval on KITTI — canonical protocol
# (50 steps, guidance 1->5, 200 samples; parity with
# demo_eval_overall_kitti.sh).
python tools/eval_overall.py \
    --dataset_name kitti \
    --data_root ./datasets \
    --clip_length 25 \
    --num_inference_steps 50 \
    --min_guidance_scale 1 --max_guidance_scale 5 \
    --num_demo_samples 200 \
    --output_dir output/eval_overall_kitti "$@"
