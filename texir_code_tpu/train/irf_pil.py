"""IRF and PIL stage runners.

Rebuilds of reference trainer/train_irf.py (view-dependent radiance field)
and trainer/train_pil.py (pre-integrated lighting field) — same loop shape
as the IRRF runner: per-epoch point resampling, MC ground truth against the
TBL, Adam + StepLR over the MLP.
"""

from __future__ import annotations

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
        return self.params


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
        return TracerIRF(tbl, net)


class PILTrainRunner(_PointFieldRunner):
    """Pre-integrated lighting field (reference trainer/train_pil.py)."""

    STAGE = "PIL"

    def _build_model(self, tbl):
        from texir_code_tpu.models.tracer_pil import TracerPIL

        return TracerPIL(tbl)
