"""Matching-model evaluation / matching-data generation entry
(reference Jigsaw_matching/eval_matching.py + eval.sh).

python eval_matching.py data_dir=pc_data/everyday/val ckpt=output/matching/ckpt/latest \
                        out_dir=matching_data/everyday
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    from puzzlefusion_plusplus_tpu.matching.generate import generate_matching_data
    from puzzlefusion_plusplus_tpu.matching.train import make_model
    from puzzlefusion_plusplus_tpu.training.state import load_checkpoint

    model = make_model(
        pc_feat_dim=int(args.get("pc_feat_dim", 128)),
        aff_feat_dim=int(args.get("aff_feat_dim", 512)),
    )
    restored = load_checkpoint(args["ckpt"])
    results = generate_matching_data(
        model, restored["params"], restored.get("batch_stats", {}),
        args["data_dir"], args.get("out_dir", "matching_data/everyday"),
        num_points=int(args.get("num_points", 5000)),
        max_samples=int(args["max_samples"]) if "max_samples" in args else None,
    )
    n_edges = sum(r["num_edges"] for r in results)
    print(f"{len(results)} shapes, {n_edges} total matching edges written")


if __name__ == "__main__":
    main()
