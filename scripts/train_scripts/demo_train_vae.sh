#!/bin/bash
# VAE decoder finetune (image MSE).
python tools/train_vae_finetuning.py \
    --dataset_name kitti \
    --data_root ./datasets \
    --learning_rate 1e-5 \
    --train_batch_size 1 \
    --clip_length 25 \
    --output_dir output/vae_finetune "$@"
