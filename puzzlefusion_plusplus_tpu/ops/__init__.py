from puzzlefusion_plusplus_tpu.ops.chamfer import (
    chamfer_distance_default,
    chamfer_distance_mean,
    chamfer_distance_per_point,
    nn_distance,
)
from puzzlefusion_plusplus_tpu.ops.fps import farthest_point_sample
from puzzlefusion_plusplus_tpu.ops.grouping import (
    index_points,
    knn_points,
    query_ball_point,
    sample_and_group,
    square_distance,
)
from puzzlefusion_plusplus_tpu.ops.normals import estimate_pointcloud_normals

__all__ = [
    "chamfer_distance_default",
    "chamfer_distance_mean",
    "chamfer_distance_per_point",
    "nn_distance",
    "farthest_point_sample",
    "index_points",
    "knn_points",
    "query_ball_point",
    "sample_and_group",
    "square_distance",
    "estimate_pointcloud_normals",
]
