#!/bin/bash
# Stage-2 denoiser training (reference scripts/train_denoiser.sh: 4-GPU DDP, batch 64/device).
python train_denoiser.py \
    data.data_dir=pc_data/everyday/train \
    data.data_val_dir=pc_data/everyday/val \
    data.batch_size=256 \
    denoiser.epochs=2000 \
    denoiser.encoder_ckpt_path=output/everyday/vqvae/ckpt/latest \
    trainer.experiment_name=everyday "$@"
