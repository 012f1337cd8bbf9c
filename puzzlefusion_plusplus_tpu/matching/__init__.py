from puzzlefusion_plusplus_tpu.matching.alignment import (
    chordal_rotation_averaging,
    global_alignment,
    ransac_transform,
    spanning_tree_alignment,
    weighted_horn,
)
from puzzlefusion_plusplus_tpu.matching.dataset import AllPieceMatchingDataset
from puzzlefusion_plusplus_tpu.matching.model import JigsawModel
from puzzlefusion_plusplus_tpu.matching.sinkhorn import hungarian, sinkhorn_log

__all__ = [
    "AllPieceMatchingDataset",
    "JigsawModel",
    "chordal_rotation_averaging",
    "global_alignment",
    "hungarian",
    "ransac_transform",
    "sinkhorn_log",
    "spanning_tree_alignment",
    "weighted_horn",
]
