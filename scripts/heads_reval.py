"""Re-run the GT-material evaluation for already-trained baseline heads.

Loads each head's saved checkpoint (exps/Mat{Inv,Neilf,Rec}Syn-<expname>)
and recomputes evaluate_head_materials_syn — used after metric changes
(e.g. adding mapped-texel columns) without retraining.  Merges the new
material metrics into results/heads.json (re-render/novel entries kept).

Usage: python scripts/heads_reval.py [--heads ...] [--out results/heads.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONF_OF_HEAD = {
    "invrender": "configs/reference/syn_invrender.conf",
    "neilf": "configs/reference/syn_neilf.conf",
    "recmlp": "configs/reference/syn_rec.conf",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", default="invrender,neilf,recmlp")
    ap.add_argument("--out", default="results/heads.json")
    ap.add_argument("--expname", default="quality")
    args = ap.parse_args()
    os.chdir(REPO)

    from texir_code_tpu.config import parse_file
    from texir_code_tpu.train import checkpoints as ckpt
    from texir_code_tpu.train.heads import (
        BaselineHeadSynRunner,
        evaluate_head_materials_syn,
    )

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for head in [h.strip() for h in args.heads.split(",") if h.strip()]:
        conf = parse_file(CONF_OF_HEAD[head])
        runner = BaselineHeadSynRunner(
            conf, head, expname=args.expname, exps_root="exps",
            is_continue=True, eval_spp=None,
        )
        restored = ckpt.restore_checkpoint(
            runner.exp.checkpoints_dir, {"params": runner.params}
        )
        assert restored is not None, f"no checkpoint for {head}"
        runner.params = restored["params"]
        m = evaluate_head_materials_syn(runner)
        results.setdefault(head, {}).update(m)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("REVAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
