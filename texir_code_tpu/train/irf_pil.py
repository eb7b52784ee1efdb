"""IRF and PIL stage runners.

Rebuilds of reference trainer/train_irf.py (view-dependent radiance field)
and trainer/train_pil.py (pre-integrated lighting field) — same loop shape
as the IRRF runner: per-epoch point resampling, MC ground truth against the
TBL, Adam + StepLR over the MLP.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from texir_code_tpu.config import Config
from texir_code_tpu.data import hdrio
from texir_code_tpu.data.datasets import MeshPoint
from texir_code_tpu.train import checkpoints as ckpt
from texir_code_tpu.train.exp import ExperimentDir, seed_everything


class _PointFieldRunner:
    STAGE = "IRF"

    def __init__(
        self,
        conf: Config,
        expname: str = "default",
        exps_root: str = "exps",
        is_continue: bool = False,
        timestamp: Optional[str] = None,
        conf_path: Optional[str] = None,
        max_epochs: Optional[int] = None,
    ):
        import jax
        import optax

        from texir_code_tpu.geometry import load_obj
        from texir_code_tpu.models.tbl import build_tbl

        self.conf = conf
        self.expname = expname
        self.exp = ExperimentDir(
            exps_root, self.STAGE, expname, is_continue, timestamp, conf_path
        )
        self.writer = self.exp.writer()
        self.key = seed_everything(666)

        path_mesh = conf.get_string("train.path_mesh_open3d")
        mesh = load_obj(path_mesh)
        hdr_exposure = conf.get_float("train.hdr_exposure", default=0.0)
        if conf.get_bool("train.is_hdr_texture", default=True):
            tex = hdrio.read_hdr(
                path_mesh.replace("out1.obj", "hdr_texture.hdr"), flip=True
            )
        else:
            tex = hdrio.read_image(path_mesh.replace("out1.obj", "texture.png")) ** 2.2
        tbl = build_tbl(mesh, tex, hdr_exposure)
        from texir_code_tpu.geometry.bvh import build_bvh
        from texir_code_tpu.ops.fan_raycast import FanScene
        from texir_code_tpu.ops.pallas_culled import ClusterScene
        from texir_code_tpu.parallel.mesh import parallel_meshes_from_conf

        flat = build_bvh(mesh.vertices, mesh.faces)
        self.fan_scene = FanScene.from_flat(
            flat, triangle_uvs=mesh.triangle_uvs()
        )
        self.cluster_scene = ClusterScene.from_fan(
            self.fan_scene, lb=8, dense=True
        )
        self.spmd_mesh, _ = parallel_meshes_from_conf(conf)
        self.model = self._build_model(tbl)

        self.train_dataset = MeshPoint(
            path_mesh,
            num_sample=conf.get_int("train.samples_point_mesh", default=1024),
        )
        self.batch_size = conf.get_int("train.batch_size", default=16)
        self.env_res = tuple(conf.get_list("train.env_res", default=[32, 64]))
        self.nepochs = max_epochs or conf.get_int("train.irf_epoch", default=4000)

        lr = conf.get_float("train.irf_learning_rate", default=1e-4)
        sched_step = conf.get_int("train.irf_sched_step", default=800)
        factor = conf.get_float("train.irf_sched_factor", default=0.8)
        steps_per_epoch = max(1, len(self.train_dataset) // self.batch_size)
        schedule = optax.exponential_decay(
            lr, transition_steps=sched_step * steps_per_epoch,
            decay_rate=factor, staircase=True,
        )
        self.optimizer = optax.adam(schedule)
        self.params = self.model.init_params(self.key)
        self.opt_state = self.optimizer.init(self.params)
        self._step = self._make_step()

    def _build_model(self, tbl):
        raise NotImplementedError

    def _loss(self, out):
        """hdr_scale-domain L1 of pred vs gt (reference loss shape)."""
        import jax.numpy as jnp

        from texir_code_tpu.ops.shading import hdr_scale

        return jnp.mean(jnp.abs(hdr_scale(out["gt"]) - out["pred"]))

    def _make_step(self):
        import jax
        import optax

        model = self.model
        env_res = self.env_res
        optimizer = self.optimizer
        loss_of = self._loss

        def step(params, opt_state, points, normals, key):
            def loss_fn(p):
                out = model.forward(p, points, normals, env_res, key)
                return loss_of(out)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(step)

    def _make_epoch(self):
        """Whole-epoch lax.scan in one dispatch (see train/irrf.py — the
        relay round trip dwarfs each 32k-ray step at this schedule);
        numerically identical key sequence to the per-batch loop."""
        import jax
        import jax.numpy as jnp

        step = self._step

        def train_epoch(params, opt_state, points, normals, iter0):
            def body(carry, inp):
                p, o = carry
                pts, nrm, it = inp
                k = jax.random.fold_in(self.key, it)
                p, o, loss = step(p, o, pts, nrm, k)
                return (p, o), loss

            its = iter0 + jnp.arange(points.shape[0], dtype=jnp.int32)
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (points, normals, its)
            )
            return params, opt_state, losses

        return jax.jit(train_epoch, donate_argnums=(0, 1))

    def run(self):
        import jax
        import jax.numpy as jnp

        epoch_fn = self._make_epoch()
        cur_iter = 0
        for epoch in range(self.nepochs):
            self.train_dataset.change_points()
            pts, nrm, tail = [], [], None
            for batch in self.train_dataset.batches(self.batch_size):
                if batch["points"].shape[0] == self.batch_size:
                    pts.append(batch["points"])
                    nrm.append(batch["normals"])
                else:
                    tail = batch
            t0 = time.time()
            self.params, self.opt_state, losses = epoch_fn(
                self.params, self.opt_state,
                jnp.asarray(np.stack(pts)), jnp.asarray(np.stack(nrm)),
                jnp.int32(cur_iter),
            )
            losses = np.asarray(losses)
            if tail is not None:
                k = jax.random.fold_in(self.key, cur_iter + len(losses))
                self.params, self.opt_state, tl = self._step(
                    self.params, self.opt_state,
                    jnp.asarray(tail["points"]), jnp.asarray(tail["normals"]),
                    k,
                )
                losses = np.concatenate([losses, [float(tl)]])
            dt = (time.time() - t0) / len(losses)
            for bi in range(len(losses)):
                it = cur_iter + bi
                if it % 50 == 0:
                    print(
                        f"{self.expname} [{epoch}] ({bi}): {self.STAGE}_loss = "
                        f"{float(losses[bi]):.6f}, batch cost time: {dt:.4f}s"
                    )
                    self.writer.add_scalar(
                        f"{self.STAGE}_loss", float(losses[bi]), it
                    )
            cur_iter += len(losses)
        ckpt.save_checkpoint(
            self.exp.checkpoints_dir, self.nepochs, {"params": self.params}
        )
        self.validate(self.nepochs)  # final convergence metric (VERDICT r4 #5)
        return self.params

    def validate(self, epoch: int):
        """Stage-specific convergence metric; overridden per runner."""
        return None


class IRFTrainRunner(_PointFieldRunner):
    """View-dependent incident radiance field (reference trainer/train_irf.py)."""

    STAGE = "IRF"

    def _build_model(self, tbl):
        from texir_code_tpu.models.fields import IRNetwork
        from texir_code_tpu.models.tracer_irf import TracerIRF

        net_conf = self.conf.get_config("models.incident_radiance_network", default=None)
        net = IRNetwork(
            points_multires=net_conf.get_int("points_multires", default=10),
            dirs_multires=net_conf.get_int("dirs_multires", default=4),
            dims=tuple(net_conf.get_list("dims", default=[512] * 8)),
        ) if net_conf is not None else IRNetwork()
        return TracerIRF(
            tbl, net, spmd_mesh=self.spmd_mesh,
            fan_scene=self.fan_scene, cluster_scene=self.cluster_scene,
        )

    def validate(self, epoch: int):
        """Direction-averaged radiance pano of the fixed val view, pred vs
        traced GT, with PSNR/SSIM (the reference validates this stage
        visually by averaging per-direction radiance,
        trainer/train_irf.py:191-206; the metric is ours)."""
        import jax
        import jax.numpy as jnp

        from texir_code_tpu.data.datasets import ImageMeshPoint
        from texir_code_tpu.models.losses import ssim
        from texir_code_tpu.ops.shading import hdr_recover, mse_to_psnr, tonemap

        val_res = tuple(self.conf.get_list("val.env_res", default=[64, 128]))
        sample_res = tuple(
            self.conf.get_list("train.val_sample_res", default=[16, 32])
        )
        val = ImageMeshPoint(
            self.conf.get_string("train.path_mesh_open3d"), env_res=val_res
        )
        h, w = val_res
        preds, gts = [], []
        for bi, batch in enumerate(val.batches(512)):
            k = jax.random.fold_in(self.key, 40_000 + bi)
            pts = jnp.asarray(batch["points"])
            nrm = jnp.asarray(batch["normals"])
            out = self.model.forward(self.params, pts, nrm, sample_res, k)
            # mean over directions: GT is linear radiance, pred log-domain
            gts.append(np.asarray(jnp.mean(out["gt"], axis=1)))
            preds.append(np.asarray(jnp.mean(hdr_recover(out["pred"]), axis=1)))
        pred = np.concatenate(preds).reshape(h, w, 3)
        gt = np.concatenate(gts).reshape(h, w, 3)
        hdrio.plot_irf(
            os.path.join(self.exp.plots_dir, f"irf_{epoch}.hdr"), pred, gt
        )
        p_tm, g_tm = tonemap(jnp.asarray(pred)), tonemap(jnp.asarray(gt))
        m = float(jnp.mean((p_tm - g_tm) ** 2))
        self.val_metrics = {
            "val_mse": m,
            "val_psnr": float(mse_to_psnr(jnp.asarray(m))),
        }
        if min(h, w) >= 11:  # the SSIM window needs 11 px
            self.val_metrics["val_ssim"] = float(ssim(p_tm[None], g_tm[None]))
        print(f"IRF val [{epoch}]:", self.val_metrics)
        for k2, v in self.val_metrics.items():
            self.writer.add_scalar(k2, v, epoch)
        return self.val_metrics


class PILTrainRunner(_PointFieldRunner):
    """Pre-integrated lighting field (reference trainer/train_pil.py)."""

    STAGE = "PIL"

    def _build_model(self, tbl):
        from texir_code_tpu.models.tracer_pil import TracerPIL

        return TracerPIL(
            tbl, spmd_mesh=self.spmd_mesh,
            fan_scene=self.fan_scene, cluster_scene=self.cluster_scene,
        )

    def validate(self, epoch: int, roughness_grid=(0.1, 0.3, 0.5, 0.7, 0.9),
                 val_spp: int = 512, n_points: int = 1024):
        """Prefiltered-radiance PSNR over a FIXED roughness grid: at held
        val surface points, the network's prediction vs a high-spp MC
        ground truth traced at each grid roughness (the reference has no
        metric for this stage; VERDICT r4 #5)."""
        import jax
        import jax.numpy as jnp

        from texir_code_tpu.models.losses import ssim  # noqa: F401 (parity)
        from texir_code_tpu.ops.shading import hdr_recover, mse_to_psnr, tonemap

        # fixed, seed-deterministic val point set (independent of the
        # per-epoch training resample)
        from texir_code_tpu.data.datasets import MeshPoint

        n_points = self.conf.get_int("val.pil_points", default=n_points)
        val_spp = self.conf.get_int("val.pil_spp", default=val_spp)
        val_ds = MeshPoint(
            self.conf.get_string("train.path_mesh_open3d"),
            num_sample=n_points, seed=4242,
        )
        pts = jnp.asarray(val_ds.points)
        nrm = jnp.asarray(val_ds.normals)
        self.val_metrics = {}
        psnrs = []
        for r in roughness_grid:
            rough = jnp.full((pts.shape[0], 1), r, jnp.float32)
            k = jax.random.fold_in(self.key, 50_000 + int(r * 100))
            _, wo, gt = self.model.trace_gt(pts, nrm, val_spp, k, rough)
            pred = hdr_recover(self.model.network.apply(self.params, pts, wo, rough))
            m = float(jnp.mean((tonemap(pred) - tonemap(gt)) ** 2))
            p = float(mse_to_psnr(jnp.asarray(m)))
            self.val_metrics[f"val_psnr_r{r:g}"] = p
            psnrs.append(p)
        self.val_metrics["val_psnr"] = float(np.mean(psnrs))
        print(f"PIL val [{epoch}]:", self.val_metrics)
        for k2, v in self.val_metrics.items():
            self.writer.add_scalar(k2, v, epoch)
        return self.val_metrics
