"""Stage-3 entry point (reference train_verifier.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from puzzlefusion_plusplus_tpu.training.verifier import main

if __name__ == "__main__":
    main()
