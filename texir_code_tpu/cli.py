"""Command-line entry points — the exp_runner equivalents.

Train (reference trainer/exp_runner.py):
    python -m texir_code_tpu.cli train --conf configs/x.conf --expname N \
        --trainstage {IRF,IRRF,PIL,IrrT,Mat,MatSyn,MatInv,MatNeilf,MatRec,...} \
        [--is_continue] [--timestamp T] [--max_epochs E]

Test (reference tester/exp_runner.py):
    python -m texir_code_tpu.cli test --conf configs/x.conf --expname N \
        --teststage {Editing,View,Relighting,Error}

Demo (no dataset needed — exports a synthetic scan first):
    python -m texir_code_tpu.cli demo --out /tmp/demo

The reference pins one GPU via GPUtil (exp_runner.py:47-52); device selection
here is jax's (the TPU runtime owns its chips).  The reference also enables
torch anomaly detection globally (:24); pass --debug_nans for the JAX
equivalent.
"""

from __future__ import annotations

import argparse
import os
import sys


TRAIN_STAGES = {}


def _train_stage(name):
    def deco(fn):
        TRAIN_STAGES[name] = fn
        return fn

    return deco


@_train_stage("IRRF")
def _irrf(conf, args):
    from texir_code_tpu.train.irrf import IRRFTrainRunner

    return IRRFTrainRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        is_continue=args.is_continue, timestamp=args.timestamp,
        conf_path=args.conf, max_epochs=args.max_epochs,
    ).run()


@_train_stage("IRF")
def _irf(conf, args):
    from texir_code_tpu.train.irf_pil import IRFTrainRunner

    return IRFTrainRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        is_continue=args.is_continue, timestamp=args.timestamp,
        conf_path=args.conf, max_epochs=args.max_epochs,
    ).run()


@_train_stage("PIL")
def _pil(conf, args):
    from texir_code_tpu.train.irf_pil import PILTrainRunner

    return PILTrainRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        is_continue=args.is_continue, timestamp=args.timestamp,
        conf_path=args.conf, max_epochs=args.max_epochs,
    ).run()


@_train_stage("IrrT")
def _irrt(conf, args):
    from texir_code_tpu.train.irt import IrrTextureRunner

    return IrrTextureRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        conf_path=args.conf, texture_res=args.irt_res,
    ).run()


@_train_stage("Mat")
def _mat(conf, args):
    from texir_code_tpu.train.material import MatTrainRunner

    return MatTrainRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        is_continue=args.is_continue, timestamp=args.timestamp,
        conf_path=args.conf, max_epochs=args.max_epochs,
    ).run()


@_train_stage("MatSyn")
def _mat_syn(conf, args):
    from texir_code_tpu.train.material_syn import MatTrainSynRunner

    return MatTrainSynRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        is_continue=args.is_continue, timestamp=args.timestamp,
        conf_path=args.conf, max_epochs=args.max_epochs,
    ).run()


_HEAD_OF_STAGE = {
    # this CLI's names + the reference exp_runner's (trainer/exp_runner.py:55-66)
    "MatInv": "invrender", "Inv": "invrender",
    "MatNeilf": "neilf", "Neilf": "neilf",
    "MatRec": "recmlp", "RecMLP": "recmlp",
}
_SYN_HEAD_OF_STAGE = {
    "MatInvSyn": "invrender", "InvSyn": "invrender",
    "MatNeilfSyn": "neilf", "NeilfSyn": "neilf",
    "MatRecSyn": "recmlp", "RecMLPSyn": "recmlp",
}


def _head(name):
    @_train_stage(name)
    def _run(conf, args, _name=name):
        from texir_code_tpu.train.heads import BaselineHeadRunner

        return BaselineHeadRunner(
            conf, _HEAD_OF_STAGE[_name], expname=args.expname,
            exps_root=args.exps_folder,
            conf_path=args.conf, max_epochs=args.max_epochs,
        ).run()


def _head_syn(name):
    @_train_stage(name)
    def _run(conf, args, _name=name):
        from texir_code_tpu.train.heads import BaselineHeadSynRunner

        return BaselineHeadSynRunner(
            conf, _SYN_HEAD_OF_STAGE[_name], expname=args.expname,
            exps_root=args.exps_folder,
            conf_path=args.conf, max_epochs=args.max_epochs,
        ).run()


for _n in _HEAD_OF_STAGE:
    _head(_n)
for _n in _SYN_HEAD_OF_STAGE:
    _head_syn(_n)


TEST_STAGES = {}


def _test_stage(name):
    def deco(fn):
        TEST_STAGES[name] = fn
        return fn

    return deco


@_test_stage("Editing")
def _editing(conf, args):
    from texir_code_tpu.eval.runners import MatEditingRunner

    return MatEditingRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        timestamp=args.timestamp,
    ).run_from_conf()


@_test_stage("View")
def _view(conf, args):
    from texir_code_tpu.eval.runners import NovelViewRunner

    return NovelViewRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        timestamp=args.timestamp,
    ).run(num=args.num_frames)


@_test_stage("Relighting")
def _relighting(conf, args):
    from texir_code_tpu.eval.runners import RelightingRunner

    return RelightingRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        timestamp=args.timestamp,
    ).run(mode=args.relight_mode)


@_test_stage("Error")
def _error(conf, args):
    from texir_code_tpu.eval.runners import MatErrorRunner

    return MatErrorRunner(
        conf, expname=args.expname, exps_root=args.exps_folder,
        timestamp=args.timestamp,
    ).run()


def main(argv=None):
    parser = argparse.ArgumentParser(prog="texir_code_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    pt = sub.add_parser("train")
    pt.add_argument("--conf", required=True)
    pt.add_argument("--expname", default="default")
    pt.add_argument("--trainstage", required=True, choices=sorted(TRAIN_STAGES))
    pt.add_argument("--exps_folder", default="exps")
    pt.add_argument("--is_continue", action="store_true")
    pt.add_argument("--timestamp", default="latest")
    pt.add_argument("--max_epochs", type=int, default=None)
    pt.add_argument("--irt_res", type=int, default=1024)
    pt.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                    dest="overrides",
                    help="conf override (repeatable), e.g. "
                         "--set train.path_mesh_open3d=./data/mesh/out1.obj")
    pt.add_argument("--debug_nans", action="store_true")
    # multi-host (pod-slice / multi-process) launch: every host runs the
    # same command with its own --process_id (parallel/multihost.py)
    pt.add_argument("--coordinator", default=None,
                    help="jax.distributed coordinator address host:port")
    pt.add_argument("--num_processes", type=int, default=None)
    pt.add_argument("--process_id", type=int, default=None)

    pe = sub.add_parser("test")
    pe.add_argument("--conf", required=True)
    pe.add_argument("--expname", default="default")
    pe.add_argument("--teststage", required=True, choices=sorted(TEST_STAGES))
    pe.add_argument("--exps_folder", default="exps")
    pe.add_argument("--timestamp", default="latest")
    pe.add_argument("--num_frames", type=int, default=60)
    pe.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                    dest="overrides", help="conf override (repeatable)")
    pe.add_argument("--relight_mode", default="emitter",
                    choices=["emitter", "pathtrace"])
    pe.add_argument("--debug_nans", action="store_true")

    pd = sub.add_parser("demo")
    pd.add_argument("--out", required=True)
    pd.add_argument("--views", type=int, default=4)
    pd.add_argument("--atlas_res", type=int, default=96)

    args = parser.parse_args(argv)

    if args.command == "demo":
        from texir_code_tpu.data.export import export_reference_layout
        from texir_code_tpu.data.synthetic import make_scene

        scene = make_scene(atlas_res=args.atlas_res)
        path_mesh = export_reference_layout(scene, args.out, n_views=args.views)
        print(f"synthetic dataset exported; path_mesh_open3d = {path_mesh}")
        return 0

    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)

    if getattr(args, "coordinator", None) or getattr(args, "num_processes", None):
        from texir_code_tpu.parallel.multihost import initialize_multihost

        pidx, pcnt = initialize_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        print(f"multihost: process {pidx}/{pcnt}")

    from texir_code_tpu.config import ConfigFactory

    conf = ConfigFactory.parse_file(args.conf)
    for kv in getattr(args, "overrides", []) or []:
        key, _, val = kv.partition("=")
        if not _:
            raise SystemExit(f"--set expects KEY=VAL, got {kv!r}")
        from texir_code_tpu.config import _parse_value

        conf.put(key.strip(), _parse_value(val.strip()))
    if args.command == "train":
        TRAIN_STAGES[args.trainstage](conf, args)
    else:
        TEST_STAGES[args.teststage](conf, args)
    if os.environ.get("TEXIR_PRINT_MEMORY"):
        # device memory high-water (scripts/eval_reference_spp.py probes
        # the chunked-eval memory envelope at reference spp)
        import jax

        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
            if peak:
                print(f"device memory high-water: {peak/2**20:.0f} MiB")
        except Exception:
            pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
