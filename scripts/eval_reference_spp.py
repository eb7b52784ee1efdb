"""Reference-spp evaluation drive (VERDICT r2 #5): Error + Relighting on TPU.

Runs the two CLI test stages at the REFERENCE eval sample counts
(configs/test_synthetic.conf mirrors reference configs/test.conf:10 —
sample_light = [1024, 256]) over the full 256x512 pano on the apartment
dataset produced by scripts/quality_run.py, and records wall-clock + the
TPU memory high-water mark (evidence the chunked shading path
(ops/chunking.py::map_chunked, eval/renderer.py shade_chunk=4096) holds
memory at reference spp).

Usage: python scripts/eval_reference_spp.py [--expname quality]
Requires: a prior quality_run (demo_data + exps/Mat-<expname>).
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _device_peak_mb():
    """TPU peak bytes in use (high-water), if the backend exposes it."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return None
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return peak / 2**20 if peak else None


def run_stage(stage, expname, extra=()):
    """Run one CLI test stage.

    Stages run in a SUBPROCESS (the CLI path users take); the per-stage
    device memory high-water is probed in-process by a follow-up flag on
    the CLI when available, so this wrapper reports wall-clock and the
    child prints its own peak via TEXIR_PRINT_MEMORY=1."""
    cmd = [
        sys.executable, "-m", "texir_code_tpu.cli", "test",
        "--conf", "configs/test_synthetic.conf",
        "--expname", expname, "--teststage", stage, *extra,
    ]
    print(f"== {stage}: {' '.join(cmd)}", flush=True)
    # TEXIR_TIME_DEVICE: the Error tester appends a single-view
    # device-vs-relay split (replayed-dispatch method, eval/runners.py)
    env = dict(os.environ, TEXIR_PRINT_MEMORY="1", TEXIR_TIME_DEVICE="1")
    t0 = time.time()
    subprocess.run(cmd, cwd=REPO, check=True, env=env)
    dt = time.time() - t0
    print(f"== {stage} wall-clock: {dt:.1f}s", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--expname", default="quality")
    args = ap.parse_args()

    t_err = run_stage("Error", args.expname)
    t_rel = run_stage("Relighting", args.expname)
    print(
        f"reference-spp eval complete: Error {t_err:.1f}s, "
        f"Relighting(emitter, diffuse spp 1024) {t_rel:.1f}s "
        f"(full 256x512 pano, sample_light=[1024, 256])",
        flush=True,
    )


if __name__ == "__main__":
    main()
