"""Stage-1 entry point (reference train_vqvae.py): python train_vqvae.py data.data_dir=... ae.epochs=..."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from puzzlefusion_plusplus_tpu.training.vqvae import main

if __name__ == "__main__":
    main()
