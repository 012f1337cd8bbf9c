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
    if int(args.get("oracle", 0)):
        # metric-ceiling mode: no model — report the best F1 any distance-informed matcher
        # can score on this data at this sampling density (matching/oracle.py)
        import json

        from puzzlefusion_plusplus_tpu.matching.oracle import oracle_matching_stats

        stats = oracle_matching_stats(
            args["data_dir"],
            num_points=int(args.get("num_points", 1000)),
            max_num_part=int(args.get("max_num_part", 20)),
            num_shapes=int(args["max_samples"]) if "max_samples" in args else None,
        )
        print(json.dumps(stats))
        return
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
