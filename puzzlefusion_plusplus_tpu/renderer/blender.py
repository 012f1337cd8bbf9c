"""Blender mesh renderer (gated on ``bpy``; the reference renderer/myrenderer.py capability).

Renders the original part .obj meshes animated along the saved pose trajectory. Requires a
Blender-as-module python (``bpy``) on the host — not part of the TPU image, so this module
only defines the pipeline and raises a clear error otherwise. The math (pose composition) is
shared with the headless renderer (renderer/artifacts.compose_render_transform), which is the
tested implementation of myrenderer.compute_final_transformation:240-260.
"""

from __future__ import annotations

import os

import numpy as np

from puzzlefusion_plusplus_tpu.renderer.artifacts import (
    compose_render_transform,
    load_inference_dir,
)


def _require_bpy():
    try:
        import bpy  # noqa: F401

        return bpy
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "Blender rendering needs the bpy module (Blender-as-python). Use "
            "renderer.pc_renderer for the dependency-free point-cloud renderer."
        ) from e


def render_mesh_trajectory(
    sample_dir: str,
    mesh_root: str,
    out_dir: str,
    resolution: tuple[int, int] = (720, 720),
    every: int = 5,
) -> list[str]:  # pragma: no cover - requires bpy
    """Load the part meshes named by mesh_file_path.txt, key-frame them along the saved
    trajectory with compose_render_transform, and render PNG frames."""
    bpy = _require_bpy()
    art = load_inference_dir(sample_dir)
    mesh_dir = os.path.join(mesh_root, art["mesh_file_path"])
    objs = sorted(f for f in os.listdir(mesh_dir) if f.endswith(".obj"))

    bpy.ops.wm.read_factory_settings(use_empty=True)
    scene = bpy.context.scene
    scene.render.resolution_x, scene.render.resolution_y = resolution
    parts = []
    for f in objs:
        bpy.ops.wm.obj_import(filepath=os.path.join(mesh_dir, f))
        parts.append(bpy.context.selected_objects[0])

    os.makedirs(out_dir, exist_ok=True)
    written = []
    T = art["trajectory"].shape[0]
    for fi, step in enumerate(range(0, T, every)):
        for p, obj in enumerate(parts):
            m = compose_render_transform(
                art["init_pose"], art["gt"][p], art["trajectory"][step, p]
            )
            obj.matrix_world = np.asarray(m).T.tolist()
        scene.render.filepath = os.path.join(out_dir, f"{fi:04d}.png")
        bpy.ops.render.render(write_still=True)
        written.append(scene.render.filepath)
    return written
