from puzzlefusion_plusplus_tpu.renderer.artifacts import (
    compose_render_transform,
    load_inference_dir,
    trajectory_world_points,
)
from puzzlefusion_plusplus_tpu.renderer.pc_renderer import render_results, render_trajectory

__all__ = [
    "compose_render_transform",
    "load_inference_dir",
    "trajectory_world_points",
    "render_results",
    "render_trajectory",
]
