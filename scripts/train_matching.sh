#!/bin/bash
# Jigsaw matcher training (reference Jigsaw_matching experiments: 250 epochs, bs 1, cosine 1e-3).
python -c "
import sys; sys.path.insert(0, '.')
from puzzlefusion_plusplus_tpu.matching.train import main
main(sys.argv[1:])
" data_dir=pc_data/everyday/train epochs=250 batch_size=1 "$@"
