#!/bin/bash
# SVD full/temporal finetune on driving clips (lr 1e-5).
python tools/train_video_diffusion.py \
    --dataset_name kitti \
    --data_root ./datasets \
    --learning_rate 1e-5 \
    --gradient_accumulation_steps 5 \
    --train_batch_size 1 \
    --clip_length 25 \
    --enable_gradient_checkpointing \
    --output_dir output/svd_finetune "$@"
