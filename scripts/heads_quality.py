"""Baseline-head converged-quality runs (VERDICT r5 task #1).

Trains the three baseline material heads (InvRender / NeILF / recMLP) on the
material-consistent synthetic apartment dataset at the REFERENCE schedules
(configs/reference/syn_{invrender,neilf,rec}.conf — epochs / lr / scheduler
mirror reference configs/syn_*.conf) and records, per head:

  * re-render MSE/PSNR/SSIM over the training views at eval spp 256
    (reference train_material_{invrender,neilf,recMLP}_syn.py:431-435),
  * held-out novel-view metrics,
  * GT albedo/roughness PSNR/SSIM with the scale fit + emitter
    postprocessing (reference train_material_syn.py:394-523 contract).

Reuses the quality dataset exported by scripts/quality_run.py (demo_data +
the baked irt.hdr) — identical inputs to the flagship MatSyn quality table,
so the head table is directly comparable.

Usage: python scripts/heads_quality.py [--heads invrender,neilf,recmlp]
                                       [--max-epochs N] [--out results/heads.json]
"""

import argparse
import json
import os
import sys
import time

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
    ap.add_argument("--max-epochs", type=int, default=None,
                    help="cap epochs (wall-clock); default = the conf's "
                         "reference schedule")
    ap.add_argument("--eval-spp", type=int, default=256)
    ap.add_argument("--out", default="results/heads.json")
    ap.add_argument("--expname", default="quality")
    args = ap.parse_args()

    os.chdir(REPO)
    from texir_code_tpu.config import parse_file
    from texir_code_tpu.train.heads import BaselineHeadSynRunner

    results = {}
    for head in [h.strip() for h in args.heads.split(",") if h.strip()]:
        conf_path = CONF_OF_HEAD[head]
        conf = parse_file(conf_path)
        t0 = time.time()
        runner = BaselineHeadSynRunner(
            conf, head, expname=args.expname, exps_root="exps",
            conf_path=conf_path, max_epochs=args.max_epochs,
            eval_spp=args.eval_spp,
        )
        runner.run()
        dt = time.time() - t0
        results[head] = dict(runner.metrics, wall_s=dt,
                             epochs=runner.nepochs)
        print(f"== {head} done in {dt:.0f}s: {runner.metrics}", flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("HEADS_RESULTS " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
