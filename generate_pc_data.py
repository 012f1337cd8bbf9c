"""Preprocessing entry point (reference generate_pc_data.py).

Two modes:
  * real meshes:  python generate_pc_data.py mesh_root=/path/to/breaking_bad out=pc_data/everyday
  * synthetic:    python generate_pc_data.py synthetic=1 out=/tmp/synth num_shapes=64
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    out = args.get("out", "pc_data/everyday")
    if args.get("synthetic"):
        from puzzlefusion_plusplus_tpu.data.synthetic import generate_dataset

        n = int(args.get("num_shapes", 64))
        generate_dataset(out, num_shapes=n, seed=int(args.get("seed", 0)), split="train")
        generate_dataset(out, num_shapes=max(1, n // 4), seed=int(args.get("seed", 0)) + 1,
                         split="val")
        print(f"wrote synthetic dataset to {out}")
    else:
        from puzzlefusion_plusplus_tpu.data.preprocess import generate_pc_data

        mesh_root = args["mesh_root"]
        for split in ("train", "val"):
            n = generate_pc_data(os.path.join(mesh_root, split), out, split,
                                 num_points=int(args.get("num_points", 1000)))
            print(f"{split}: {n} shapes")


if __name__ == "__main__":
    main()
