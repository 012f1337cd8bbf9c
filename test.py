"""Inference entry point (reference test.py): full auto-agglomerative denoise-verify loop.

python test.py data.data_val_dir=... data.matching_data_path=... denoiser.ckpt_path=... \
               verifier.ckpt_path=... denoiser.encoder_ckpt_path=...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from puzzlefusion_plusplus_tpu.inference.run import main

if __name__ == "__main__":
    main()
