"""Stage-2 entry point (reference train_denoiser.py): frozen encoder ckpt via denoiser.encoder_ckpt_path=..."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from puzzlefusion_plusplus_tpu.training.denoiser import main

if __name__ == "__main__":
    main()
