"""Baseline-head stage runners: InvRender / NeILF / nvdiffrec.

Rebuilds the three single-stage baseline trainers (reference trainer/
train_material_invrender.py, train_material_neilf.py,
train_material_recMLP.py — structurally identical loops differing only in
model class + loss) as one parameterized runner.  Stage names match the
reference CLI ('MatInv', 'MatNeilf', 'MatRec', trainer/exp_runner.py:59-66).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

from texir_code_tpu.config import Config
from texir_code_tpu.data import hdrio
from texir_code_tpu.data.datasets import ImageCubeDerived
from texir_code_tpu.train import checkpoints as ckpt
from texir_code_tpu.train.exp import ExperimentDir, seed_everything


def make_lr_schedule(lr, sched_step, factor, steps_per_epoch):
    """StepLR / MultiStepLR equivalent, per optimizer step.

    A scalar `sched_step` is the reference's StepLR period in epochs; a
    list is MultiStepLR milestones (the reference head trainers:
    trainer/train_material_neilf.py:126-128 default [30, 30],
    syn_neilf.conf [20, 20]).  Duplicate milestones compound the gamma,
    matching torch's milestone-count semantics."""
    import optax

    if isinstance(sched_step, (list, tuple)):
        boundaries: Dict[int, float] = {}
        for m in sched_step:
            b = int(m) * steps_per_epoch
            boundaries[b] = boundaries.get(b, 1.0) * factor
        return optax.piecewise_constant_schedule(lr, boundaries)
    return optax.exponential_decay(
        lr, transition_steps=int(sched_step) * steps_per_epoch,
        decay_rate=factor, staircase=True,
    )


class BaselineHeadRunner:
    """Single-stage trainer over one of the baseline material heads.

    head: 'invrender' | 'neilf' | 'recmlp'.
    """

    STAGE_NAMES = {"invrender": "MatInv", "neilf": "MatNeilf", "recmlp": "MatRec"}

    def __init__(
        self,
        conf: Config,
        head: str,
        expname: str = "default",
        exps_root: str = "exps",
        is_continue: bool = False,
        timestamp: Optional[str] = None,
        conf_path: Optional[str] = None,
        max_epochs: Optional[int] = None,
        dataset=None,
        model=None,
    ):
        import jax
        import optax

        from texir_code_tpu.geometry import load_obj
        from texir_code_tpu.models import fields
        from texir_code_tpu.models.material_heads import (
            InvRenderMaterialModel,
            NeILFMaterialModel,
            NvDiffRecMaterialModel,
        )

        self.head = head.lower()
        if self.head not in self.STAGE_NAMES:
            raise ValueError(f"unknown head {head!r}")
        self.conf = conf
        self.expname = expname
        self.exp = ExperimentDir(
            exps_root, self.STAGE_NAMES[self.head], expname,
            is_continue, timestamp, conf_path,
        )
        self.writer = self.exp.writer()
        self.key = seed_everything(666)

        path_mesh = conf.get_string("train.path_mesh_open3d")
        pano_res = tuple(conf.get_list("train.pano_img_res", default=[256, 512]))
        hdr_exposure = conf.get_float("train.hdr_exposure", default=0.0)
        self.dataset = dataset or ImageCubeDerived(
            path_mesh, resolution=pano_res, hdr_exposure=hdr_exposure
        )

        if model is None:
            mesh = load_obj(path_mesh)
            hdr_tex = hdrio.read_hdr(
                path_mesh.replace("out1.obj", "hdr_texture.hdr"), flip=True
            )
            irt = hdrio.read_hdr(path_mesh.replace("out1.obj", "irt.hdr"), flip=True)
            common = dict(
                pano_res=pano_res,
                sample_light=tuple(conf.get_list("train.sample_light", default=[32, 16])),
                hdr_exposure=hdr_exposure,
            )
            if self.head == "invrender":
                model = InvRenderMaterialModel(mesh, hdr_tex, irt, **common)
            elif self.head == "neilf":
                model = NeILFMaterialModel(mesh, hdr_tex, irt, **common)
            else:
                model = NvDiffRecMaterialModel(mesh, hdr_tex, irt, **common)
        self.model = model
        self.params = model.init_params(self.key)

        self.nepochs = max_epochs or conf.get_int("train.mat_epoch", default=40)
        lr = conf.get_float("train.mat_learning_rate", default=3e-2)
        sched_step = conf.get("train.mat_sched_step", 20)
        factor = conf.get_float("train.mat_sched_factor", default=0.8)
        steps_per_epoch = max(1, len(self.dataset))
        schedule = make_lr_schedule(lr, sched_step, factor, steps_per_epoch)
        self.optimizer = optax.adam(schedule)
        self.opt_state = self.optimizer.init(self.params)
        self._raw_step = self._make_step()
        self._step = jax.jit(self._raw_step)

    def _make_step(self):
        import jax
        import optax

        from texir_code_tpu.models import losses

        model = self.model
        head = self.head
        optimizer = self.optimizer
        loss_conf = self.conf.get_config("loss", default=None)

        def step(params, opt_state, mvp, cam_pos, gt, rgb_grad, iteration, key,
                 view=None):
            def loss_fn(p):
                out = model._forward(p, mvp, cam_pos, key, view=view)
                if head == "invrender":
                    kw = {}
                    if loss_conf is not None:
                        kw = dict(
                            sg_rgb_weight=loss_conf.get_float("sg_rgb_weight", default=1.0),
                            kl_weight=loss_conf.get_float("kl_weight", default=0.01),
                            latent_smooth_weight=loss_conf.get_float(
                                "latent_smooth_weight", default=0.1
                            ),
                        )
                    return losses.inv_loss(
                        out, gt, out["latent_pre_sigmoid"], **kw
                    )["loss"]
                if head == "neilf":
                    return losses.neilf_loss(out, gt, rgb_grad)
                return losses.nvdiffrec_loss(out, gt, iteration)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def _run_epochs(self, idxs, tag: str):
        """Train `self.nepochs` epochs over views `idxs`, one jitted
        lax.scan dispatch per epoch (per-view dispatch pays the tunneled
        relay's heavy-tailed round trip on every small step; the scanned
        epoch is numerically identical — same fold_in key sequence)."""
        import jax
        import jax.numpy as jnp

        cols = {"mvp": [], "pos": [], "gt": [], "grad": []}
        for i in idxs:
            item = self.dataset[i]
            cols["mvp"].append(item["cam_to_world"])
            cols["pos"].append(item["cam_position"])
            cols["gt"].append(item["color"])
            cols["grad"].append(item["rgb_grad"])
        xs = tuple(jnp.asarray(np.stack(v)) for v in cols.values())
        # camera-only constants (G-buffer + IrT irradiance) hoisted out of
        # the step: traced once per view, carried through the epoch scan
        pre = jax.jit(self.model.precompute_view)
        views = [pre(m, p) for m, p in zip(xs[0], xs[1])]
        xs = xs + (jax.tree_util.tree_map(lambda *a: jnp.stack(a), *views),)
        step = self._raw_step
        base_key = self.key

        def train_epoch(params, opt_state, xs, iter0):
            def body(carry, inp):
                p, o = carry
                (mvp, pos, gt, gg, view), it = inp
                k = jax.random.fold_in(base_key, it)
                p, o, loss = step(
                    p, o, mvp, pos, gt, gg, it.astype(jnp.float32), k,
                    view=view,
                )
                return (p, o), loss

            its = iter0 + jnp.arange(len(idxs), dtype=jnp.int32)
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (xs, its)
            )
            return params, opt_state, losses

        epoch_fn = jax.jit(train_epoch, donate_argnums=(0, 1))

        cur_iter = 0
        for epoch in range(self.nepochs):
            t0 = time.time()
            self.params, self.opt_state, losses = epoch_fn(
                self.params, self.opt_state, xs, jnp.int32(cur_iter)
            )
            losses = np.asarray(losses)
            dt = (time.time() - t0) / len(idxs)
            for bi, i in enumerate(idxs):
                print(
                    f"{self.expname} [{epoch}] ({i}/{len(idxs)}): "
                    f"{tag} = {losses[bi]:.6f}, "
                    f"batch cost time : {dt:.4f}s"
                )
                self.writer.add_scalar(tag, float(losses[bi]), cur_iter + bi)
            cur_iter += len(idxs)

    def run(self):
        self._run_epochs(list(range(len(self.dataset))), f"{self.head}_loss")
        ckpt.save_checkpoint(
            self.exp.checkpoints_dir, self.nepochs, {"params": self.params}
        )
        return self.params


def evaluate_head_materials_syn(
    runner: "BaselineHeadRunner", texture_res: Optional[int] = None
) -> Dict[str, float]:
    """Synthetic-GT evaluation for the baseline heads (the reference's
    train_material_{invrender,neilf,recMLP}_syn.py variants): query the
    material field at atlas texel positions, compare against the GT atlases
    with the same scale-invariant albedo + roughness metrics as MatSyn."""
    import jax.numpy as jnp

    from texir_code_tpu.data.datasets import ImageCubeSyn
    from texir_code_tpu.models.losses import ssim
    from texir_code_tpu.models.tracer_irt import bake_geometry_textures
    from texir_code_tpu.ops.shading import mse_to_psnr
    from texir_code_tpu.train.material_syn import scale_compute

    ds = runner.dataset
    if not isinstance(ds, ImageCubeSyn) or ds.gt_albedo is None:
        raise ValueError("synthetic evaluation needs an ImageCubeSyn dataset with GT")

    if texture_res is None:
        texture_res = ds.gt_albedo.shape[0]  # query the field at GT res
    geom = bake_geometry_textures(runner.model.mesh, texture_res)
    vr, vc = np.nonzero(geom.valid)
    pts = jnp.asarray(geom.position[vr, vc])
    albedo_f, rough_f = runner.model.query_materials(runner.params, pts)
    albedo = np.zeros((texture_res, texture_res, 3), np.float32)
    rough = np.zeros((texture_res, texture_res, 1), np.float32)
    albedo[vr, vc] = np.asarray(albedo_f)
    rough[vr, vc] = np.asarray(rough_f)

    def resample(x, hw):
        rows = (np.arange(hw[0]) * x.shape[0]) // hw[0]
        cols = (np.arange(hw[1]) * x.shape[1]) // hw[1]
        return x[rows][:, cols]

    gt_a, gt_r = ds.gt_albedo, ds.gt_roughness
    albedo = resample(albedo, gt_a.shape[:2])
    rough = resample(rough, gt_r.shape[:2])
    # mapped mask resampled alongside: gutter texels map no triangle, the
    # field is never queried there (pred stays 0) and the value is
    # unobservable by construction — mapped-only metrics are the
    # apples-to-apples column against the flagship's (PERF.md round 3)
    valid = resample(
        np.asarray(geom.valid).astype(np.float32)[..., None], gt_a.shape[:2]
    )[..., 0] > 0
    s = scale_compute(gt_a, albedo)
    albedo_s = np.clip(albedo * s, 0, 1)

    def metrics(pred, gt):
        p = jnp.asarray(pred[None])
        g = jnp.asarray(gt[None])
        if p.shape[-1] == 1:
            p, g = jnp.repeat(p, 3, -1), jnp.repeat(g, 3, -1)
        m = float(jnp.mean((p - g) ** 2))
        return m, float(mse_to_psnr(jnp.asarray(m))), float(ssim(p, g))

    a = metrics(albedo_s, gt_a)
    r = metrics(rough, gt_r)
    m_a = float(np.mean((albedo_s - gt_a)[valid] ** 2))
    m_r = float(np.mean((rough - gt_r)[valid] ** 2))
    out = {
        "albedo_scale": s,
        "albedo_mse": a[0], "albedo_psnr": a[1], "albedo_ssim": a[2],
        "roughness_mse": r[0], "roughness_psnr": r[1], "roughness_ssim": r[2],
        "mapped_fraction": float(valid.mean()),
        "albedo_mse_mapped": m_a,
        "albedo_psnr_mapped": float(mse_to_psnr(jnp.asarray(m_a))),
        "roughness_mse_mapped": m_r,
        "roughness_psnr_mapped": float(mse_to_psnr(jnp.asarray(m_r))),
    }
    print(f"{runner.head} material eval:", out)
    return out


class BaselineHeadSynRunner(BaselineHeadRunner):
    """Synthetic-GT variant of the baseline-head trainers.

    Rebuild of reference trainer/train_material_{invrender,neilf,recMLP}
    _syn.py (3×434 LoC, again structurally identical): train the head on
    the synthetic split only (novel views held out), then evaluate at
    high specular spp — re-render MSE/PSNR/SSIM over train AND novel
    views (reference train_material_invrender_syn.py:245-374,387-433)
    plus GT albedo/roughness metrics with the scale fit and emitter
    postprocessing (:291-292 scale_compute + postprocessing_materials).
    """

    SYN_STAGE_NAMES = {
        "invrender": "MatInvSyn", "neilf": "MatNeilfSyn", "recmlp": "MatRecSyn"
    }

    def __init__(self, conf, head, eval_spp: Optional[int] = 256, **kw):
        from texir_code_tpu.data.datasets import ImageCubeSyn

        path_mesh = conf.get_string("train.path_mesh_open3d")
        pano_res = tuple(conf.get_list("train.pano_img_res", default=[256, 512]))
        hdr_exposure = conf.get_float("train.hdr_exposure", default=0.0)
        dataset = kw.pop("dataset", None) or ImageCubeSyn(
            path_mesh, resolution=pano_res, hdr_exposure=hdr_exposure
        )
        self.eval_spp = eval_spp
        super().__init__(conf, head, dataset=dataset, **kw)
        # distinct exp-dir stage prefix for the syn variants
        self.exp = ExperimentDir(
            kw.get("exps_root", "exps"), self.SYN_STAGE_NAMES[self.head],
            self.expname, kw.get("is_continue", False), kw.get("timestamp"),
            kw.get("conf_path"),
        )
        self.writer = self.exp.writer()

    def _train_indices(self):
        ds = self.dataset
        train_ids = getattr(ds, "train_ids", None) or ds.ids
        return [i for i, vid in enumerate(ds.ids) if vid in train_ids]

    def run(self):
        self._run_epochs(self._train_indices(), f"{self.head}_syn_loss")
        ckpt.save_checkpoint(
            self.exp.checkpoints_dir, self.nepochs, {"params": self.params}
        )
        self.metrics = self.evaluate()
        return self.params

    def evaluate(self) -> Dict[str, float]:
        """High-spp re-render + GT material metrics (reference :431-435:
        `self.model.sample_l[1] = 256; self.plot_to_disk_cube(stage=0)`)."""
        import jax
        import jax.numpy as jnp

        from texir_code_tpu.models.losses import ssim
        from texir_code_tpu.ops.shading import mse_to_psnr, tonemap

        if self.eval_spp:
            self.model.sample_light = (
                self.model.sample_light[0], self.eval_spp
            )
            self.model._jitted.clear()

        ds = self.dataset
        novel = set(getattr(ds, "novel_ids", []) or [])

        def render_metrics(indices, tag):
            if not indices:
                return {}
            mse = psnr = ssim_v = 0.0
            for i in indices:
                item = ds[i]
                out = self.model.forward(
                    self.params, jnp.asarray(item["cam_to_world"]),
                    jnp.asarray(item["cam_position"]),
                    jax.random.fold_in(self.key, 30_000 + i),
                )
                pred = tonemap(out["rgb"])
                gt = tonemap(jnp.asarray(item["color"]))
                m = float(jnp.mean((pred - gt) ** 2))
                mse += m
                psnr += float(mse_to_psnr(jnp.asarray(m)))
                ssim_v += float(ssim(pred, gt))
            n = len(indices)
            out = {
                f"{tag}_mse": mse / n, f"{tag}_psnr": psnr / n,
                f"{tag}_ssim": ssim_v / n,
            }
            print(f"{self.head} {tag} re-rendering error:", out)
            return out

        train_idx = self._train_indices()
        novel_idx = [i for i, vid in enumerate(ds.ids) if vid in novel]
        metrics = {}
        metrics.update(render_metrics(train_idx, "rerender"))
        metrics.update(render_metrics(novel_idx, "novel"))
        try:
            metrics.update(evaluate_head_materials_syn(self))
        except ValueError as e:
            # Surface a broken GT load instead of silently omitting half the
            # metric keys: log it and emit NaN placeholders so downstream
            # consumers see the absence.
            print(f"{self.head} material eval FAILED: {e}")
            metrics.update({
                k: float("nan") for k in (
                    "albedo_scale", "albedo_mse", "albedo_psnr", "albedo_ssim",
                    "roughness_mse", "roughness_psnr", "roughness_ssim",
                    "albedo_psnr_mapped", "roughness_psnr_mapped",
                )
            })
        return metrics


def InvRenderTrainRunner(conf, **kw):
    return BaselineHeadRunner(conf, "invrender", **kw)


def NeILFTrainRunner(conf, **kw):
    return BaselineHeadRunner(conf, "neilf", **kw)


def NvDiffRecTrainRunner(conf, **kw):
    return BaselineHeadRunner(conf, "recmlp", **kw)


def MatInvTrainSynRunner(conf, **kw):
    return BaselineHeadSynRunner(conf, "invrender", **kw)


def MatNeilfTrainSynRunner(conf, **kw):
    return BaselineHeadSynRunner(conf, "neilf", **kw)


def MatRecMLPTrainSynRunner(conf, **kw):
    return BaselineHeadSynRunner(conf, "recmlp", **kw)
