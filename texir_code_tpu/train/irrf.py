"""IRRF stage runner — NIrF training loop.

Rebuild of reference trainer/train_irrf.py:28-276: per epoch, resample
surface points, trace MC irradiance ground truth against the TBL, fit the
log-domain MLP; periodically validate by rendering an irradiance pano of a
fixed view (GT traced once and cached, :187-231) and checkpoint.

Config knobs honored (reference configs/irrf_hdrhouse.conf): irf_epoch,
irf_learning_rate, irf_sched_step/factor (StepLR → staircase exponential
decay over optimizer steps), samples_point_mesh, batch_size, env_res,
val_sample_res, std_jit, hdr_exposure, is_hdr_texture, plot_freq, ckpt_freq.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from texir_code_tpu.config import Config
from texir_code_tpu.data import hdrio
from texir_code_tpu.data.datasets import ImageMeshPoint, MeshPoint
from texir_code_tpu.train import checkpoints as ckpt
from texir_code_tpu.train.exp import ExperimentDir, seed_everything


class IRRFTrainRunner:
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
        import jax.numpy as jnp
        import optax

        from texir_code_tpu.geometry import load_obj
        from texir_code_tpu.models.losses import irf_loss
        from texir_code_tpu.models.fields import MatNetwork
        from texir_code_tpu.models.tbl import build_tbl
        from texir_code_tpu.models.tracer_irrf import TracerIRRF

        self.conf = conf
        self.expname = expname
        self.exp = ExperimentDir(
            exps_root, "IRRF", expname, is_continue, timestamp, conf_path
        )
        self.writer = self.exp.writer()
        self.key = seed_everything(666)

        path_mesh = conf.get_string("train.path_mesh_open3d")
        self.path_mesh = path_mesh
        hdr_exposure = conf.get_float("train.hdr_exposure", default=0.0)
        mesh = load_obj(path_mesh)
        if conf.get_bool("train.is_hdr_texture", default=True):
            tex = hdrio.read_hdr(
                path_mesh.replace("out1.obj", "hdr_texture.hdr"), flip=True
            )
        else:
            tex = hdrio.read_image(path_mesh.replace("out1.obj", "texture.png")) ** 2.2
        tbl = build_tbl(mesh, tex, hdr_exposure)

        net_conf = conf.get_config("models.irrf_network")
        network = MatNetwork(
            points_multires=net_conf.get_int("points_multires", default=10),
            dims=tuple(net_conf.get_list("dims", default=[512] * 4)),
            p_out_dim=net_conf.get_int("p_out_dim", default=3),
        )
        from texir_code_tpu.geometry.bvh import build_bvh
        from texir_code_tpu.ops.fan_raycast import FanScene
        from texir_code_tpu.ops.pallas_culled import ClusterScene

        flat = build_bvh(mesh.vertices, mesh.faces)
        fan = FanScene.from_flat(flat, triangle_uvs=mesh.triangle_uvs())
        from texir_code_tpu.parallel.mesh import parallel_meshes_from_conf

        spmd_mesh, _ = parallel_meshes_from_conf(conf)
        self.model = TracerIRRF(
            tbl, network,
            std_jit=conf.get_float("train.std_jit", default=5e-2),
            fan_scene=fan,
            cluster_scene=ClusterScene.from_fan(fan, lb=8, dense=True),
            spmd_mesh=spmd_mesh,
        )

        self.train_dataset = MeshPoint(
            path_mesh,
            num_sample=conf.get_int("train.samples_point_mesh", default=1024),
        )
        self.batch_size = conf.get_int("train.batch_size", default=16)
        self.env_res = tuple(conf.get_list("train.env_res", default=[32, 64]))
        self.val_res = tuple(conf.get_list("val.env_res", default=[64, 128]))
        self.nepochs = max_epochs or conf.get_int("train.irf_epoch", default=4000)
        self.plot_freq = conf.get_int("train.plot_freq", default=10000)
        self.ckpt_freq = conf.get_int("train.ckpt_freq", default=20000)

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
        self.start_epoch = 0
        if self.exp.continued:
            restored = ckpt.restore_checkpoint(
                self.exp.checkpoints_dir,
                {"params": self.params, "opt_state": self.opt_state, "epoch": 0},
            )
            if restored is not None:
                self.params = restored["params"]
                self.opt_state = restored["opt_state"]
                self.start_epoch = int(restored["epoch"]) + 1

        # jitted train step
        model = self.model
        env_res = self.env_res
        optimizer = self.optimizer

        def train_step(params, opt_state, points, normals, key):
            gt = model.trace_gt(points, normals, env_res, key)

            def loss_fn(p):
                pred = model.network.apply(p, points)
                return irf_loss(gt, pred, conf.get_string("irf_loss.loss_type", default="L1"))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = jax.jit(train_step)

        # whole-epoch step: lax.scan over the epoch's batches in ONE
        # dispatch.  The tunneled-relay round trip (~tens of ms, heavy
        # tailed) dwarfs each 32k-ray step; at the reference schedule
        # (4000 epochs x 64 batches) per-batch dispatch costs hours.
        # Numerically identical to the per-batch loop: same key sequence
        # (fold_in of the global iter), same scan order.
        def train_epoch(params, opt_state, points, normals, iter0):
            def body(carry, inp):
                p, o = carry
                pts, nrm, it = inp
                k = jax.random.fold_in(self.key, it)
                p, o, loss = train_step(p, o, pts, nrm, k)
                return (p, o), loss

            its = iter0 + jnp.arange(points.shape[0], dtype=jnp.int32)
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (points, normals, its)
            )
            return params, opt_state, losses

        self._train_epoch = jax.jit(train_epoch, donate_argnums=(0, 1))
        self._val_gt = None

    # ------------------------------------------------------------------
    def validate(self, epoch: int):
        """Render an irradiance pano of the fixed val view; trace GT once and
        cache it (reference :187-231).  Beyond the reference's visual-only
        validation, computes the pano's PSNR/SSIM (tonemapped, the same
        transform the Mat re-render metrics use) and logs them — the
        field-stage convergence metric (VERDICT r4 #5)."""
        import jax
        import jax.numpy as jnp

        from texir_code_tpu.models.losses import ssim
        from texir_code_tpu.ops.shading import hdr_recover, mse_to_psnr, tonemap

        val = ImageMeshPoint(self.path_mesh, env_res=self.val_res)
        h, w = self.val_res
        if self._val_gt is None:
            gts = []
            for batch in val.batches(512):
                k = jax.random.fold_in(self.key, len(gts))
                gts.append(
                    np.asarray(
                        self.model.trace_gt(
                            jnp.asarray(batch["points"]),
                            jnp.asarray(batch["normals"]),
                            tuple(self.conf.get_list("train.val_sample_res", default=[32, 64])),
                            k,
                        )
                    )
                )
            self._val_gt = np.concatenate(gts).reshape(h, w, 3)
        pred = np.asarray(
            hdr_recover(self.model.network.apply(self.params, jnp.asarray(val.points)))
        ).reshape(h, w, 3)
        hdrio.plot_irf(
            os.path.join(self.exp.plots_dir, f"irrf_{epoch}.hdr"), pred, self._val_gt
        )
        p_tm = tonemap(jnp.asarray(pred))
        g_tm = tonemap(jnp.asarray(self._val_gt))
        m = float(jnp.mean((p_tm - g_tm) ** 2))
        self.val_metrics = {
            "val_mse": m,
            "val_psnr": float(mse_to_psnr(jnp.asarray(m))),
        }
        if min(h, w) >= 11:  # the SSIM window needs 11 px
            self.val_metrics["val_ssim"] = float(ssim(p_tm[None], g_tm[None]))
        print(f"IRRF val [{epoch}]:", self.val_metrics)
        for k2, v in self.val_metrics.items():
            self.writer.add_scalar(k2, v, epoch)
        return pred, self._val_gt

    def run(self):
        import jax
        import jax.numpy as jnp

        steps_per_epoch = max(1, len(self.train_dataset) // self.batch_size)
        cur_iter = self.start_epoch * steps_per_epoch
        for epoch in range(self.start_epoch, self.nepochs + 1):
            self.train_dataset.change_points()  # reference :238
            # stack the epoch's batches -> ONE scanned dispatch (a ragged
            # final batch, if any, runs through the per-batch step)
            pts, nrm, tail = [], [], None
            for batch in self.train_dataset.batches(self.batch_size):
                if batch["points"].shape[0] == self.batch_size:
                    pts.append(batch["points"])
                    nrm.append(batch["normals"])
                else:
                    tail = batch
            t0 = time.time()
            self.params, self.opt_state, losses = self._train_epoch(
                self.params, self.opt_state,
                jnp.asarray(np.stack(pts)), jnp.asarray(np.stack(nrm)),
                jnp.int32(cur_iter),
            )
            losses = np.asarray(losses)
            if tail is not None:
                k = jax.random.fold_in(self.key, cur_iter + len(losses))
                self.params, self.opt_state, tl = self._train_step(
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
                        f"{self.expname} [{epoch}] ({bi}): irf_loss = "
                        f"{float(losses[bi]):.6f}, batch cost time: {dt:.4f}s"
                    )
                    self.writer.add_scalar("irf_loss", float(losses[bi]), it)
            # validation cadence: once per epoch containing a plot_freq
            # multiple (the reference validates mid-epoch at the exact iter)
            if (
                self.plot_freq > 0
                and epoch > self.start_epoch
                and (cur_iter // self.plot_freq)
                != ((cur_iter + len(losses)) // self.plot_freq)
            ):
                self.validate(epoch)
            cur_iter += len(losses)
            if epoch % max(self.ckpt_freq // max(1, len(self.train_dataset) // self.batch_size), 1) == 0:
                ckpt.save_checkpoint(
                    self.exp.checkpoints_dir, epoch,
                    {"params": self.params, "opt_state": self.opt_state, "epoch": epoch},
                )
        ckpt.save_checkpoint(
            self.exp.checkpoints_dir, self.nepochs,
            {"params": self.params, "opt_state": self.opt_state, "epoch": self.nepochs},
        )
        self.validate(self.nepochs)  # final convergence metric, always logged
        return self.params
