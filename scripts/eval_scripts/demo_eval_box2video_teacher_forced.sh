#!/bin/bash
# Teacher-forced Box2Video eval (GT boxes as conditioning).
python tools/eval_video_controlnet.py \
    --dataset_name bdd100k \
    --data_root ./datasets \
    --clip_length 25 \
    --num_inference_steps 25 \
    --min_guidance_scale 1 --max_guidance_scale 3 \
    --num_demo_samples 200 \
    --output_dir output/eval_box2video_tf "$@"
