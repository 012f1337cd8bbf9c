#!/bin/bash
# Stage-1 VQ-VAE training (reference scripts/train_vqvae.sh: 4-GPU DDP, per-device batch 45).
# Data parallelism is automatic over all local TPU devices; batch_size is the GLOBAL batch.
python train_vqvae.py \
    data.data_dir=pc_data/everyday/train \
    data.data_val_dir=pc_data/everyday/val \
    data.batch_size=180 \
    ae.epochs=2000 \
    trainer.experiment_name=everyday "$@"
