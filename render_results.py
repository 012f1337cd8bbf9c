"""Rendering entry point (reference renderer/render_results.py).

python render_results.py inference_dir=output/everyday/inference/results \
                         pc_data_dir=pc_data/everyday/val num_samples=4
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    if "mesh_root" in args:
        # mesh mode: z-buffer rasterizer over the original part meshes (the reference's
        # Blender path, renderer/myrenderer.py:100-176), no bpy required
        from puzzlefusion_plusplus_tpu.renderer import render_mesh_trajectory

        inf_dir = args["inference_dir"]
        samples = sorted(
            d for d in os.listdir(inf_dir) if os.path.isdir(os.path.join(inf_dir, d))
        )
        n = int(args.get("num_samples", -1))
        if n > 0:
            samples = samples[:n]
        written = []
        for s in samples:
            written += render_mesh_trajectory(
                os.path.join(inf_dir, s),
                args["mesh_root"],
                os.path.join(args.get("out_dir", "render_out"), s),
                every=int(args.get("every", 5)),
            )
        print(f"wrote {len(written)} files")
        for w in written[:10]:
            print(" ", w)
        return
    from puzzlefusion_plusplus_tpu.renderer import render_results

    written = render_results(
        args["inference_dir"],
        args["pc_data_dir"],
        num_samples=int(args.get("num_samples", -1)),
        every=int(args.get("every", 5)),
    )
    print(f"wrote {len(written)} files")
    for w in written[:10]:
        print(" ", w)


if __name__ == "__main__":
    main()
