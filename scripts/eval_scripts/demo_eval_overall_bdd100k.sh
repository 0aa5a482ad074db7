#!/bin/bash
# Overall two-stage eval on BDD100K (50 steps, guidance 1->5, 400 samples).
python tools/eval_overall.py \
    --dataset_name bdd100k \
    --data_root ./datasets \
    --clip_length 25 \
    --num_inference_steps 50 \
    --min_guidance_scale 1 --max_guidance_scale 5 \
    --num_demo_samples 400 \
    --output_dir output/eval_overall_bdd100k "$@"
