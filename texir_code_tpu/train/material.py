"""Mat stage runner — SVBRDF texture optimization with the 3-substage
schedule.

Rebuild of reference trainer/train_material.py:31-611:

  * first-val mask build (:245-318): render each view at stage -1 (VHL
    emitter) → per-view highlight mask; seg-class ids from the dataset with
    the floor class eroded 15×15 (:258-260, eroded-out pixels drop out of
    every class); optional per-room ids sampled from the roomseg occupancy
    image at world xz (:274-282).
  * run (:408-605): three sequential substages over `mat_epoch` epochs ×
    views each — 0: albedo (Lambertian), 1: roughness (highlight-masked,
    fresh Adam), 2: joint (fresh Adam); per-step clamps roughness [1e-2,0.8]
    and albedo ≥ 0 (:458,477,592); StepLR(mat_sched_step, mat_sched_factor)
    per epoch; per-step loss logging + "batch cost time" prints (:462-464);
    periodic pano plots and re-render metrics (:359-406).

The training step itself is one jitted function per stage (forward render +
loss + grad + Adam update + clamp), with all masks as device arrays.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np

from texir_code_tpu.config import Config
from texir_code_tpu.data import hdrio
from texir_code_tpu.data.datasets import ImageCubeDerived
from texir_code_tpu.parallel.mesh import parallel_meshes_from_conf
from texir_code_tpu.train import checkpoints as ckpt
from texir_code_tpu.train.exp import ExperimentDir, seed_everything

NUM_SEG_CLASSES = 49  # the reference's seg tag range 0..48 (train_material.py:188)
FLOOR_CLASS = 46      # seg_tag[-3] (train_material.py:258)


def parse_roomseg(path: str):
    """Room-segmentation metadata + id image (reference utils/general.py:115-125).

    Returns (scale, w, h, x_min, z_min, room_img [H, W]) or None if absent."""
    meta = os.path.join(path, "originOccupancyGrid_f0.meta")
    img = os.path.join(path, "roomSegs_uchar_f0.png")
    if not (os.path.exists(meta) and os.path.exists(img)):
        return None
    with open(meta) as f:
        first = f.readline().strip().split(" ")
    scale, w, h, x_min, z_min = (float(x) for x in first[:5])
    room = hdrio.read_gray(img)
    return scale, w, h, x_min, z_min, room


def room_ids_at(roomseg, positions: np.ndarray) -> np.ndarray:
    """Nearest room id at world xz (reference train_material.py:274-282)."""
    scale, w, h, x_min, z_min, img = roomseg
    u = (positions[..., 0] - x_min) / scale / w
    v = (positions[..., 2] - z_min) / scale / h
    cols = np.clip((u * img.shape[1]).astype(int), 0, img.shape[1] - 1)
    rows = np.clip((v * img.shape[0]).astype(int), 0, img.shape[0] - 1)
    return img[rows, cols].astype(np.int32)


class MatTrainRunner:
    def __init__(
        self,
        conf: Config,
        expname: str = "default",
        exps_root: str = "exps",
        is_continue: bool = False,
        timestamp: Optional[str] = None,
        conf_path: Optional[str] = None,
        max_epochs: Optional[int] = None,
        dataset=None,
        model=None,
        albedo_res: int = 2048,
        roughness_res: int = 4096,
    ):
        import jax

        from texir_code_tpu.geometry import load_obj
        from texir_code_tpu.models.material import (
            MaterialModel,
            init_material_params,
        )

        self.conf = conf
        self.expname = expname
        self.exp = ExperimentDir(
            exps_root, "Mat", expname, is_continue, timestamp, conf_path
        )
        self.writer = self.exp.writer()
        self.key = seed_everything(666)

        path_mesh = conf.get_string("train.path_mesh_open3d")
        self.pano_res = tuple(conf.get_list("train.pano_img_res", default=[256, 512]))
        hdr_exposure = conf.get_float("train.hdr_exposure", default=0.0)

        self.dataset = dataset or ImageCubeDerived(
            path_mesh, resolution=self.pano_res, hdr_exposure=hdr_exposure
        )

        if model is None:
            from texir_code_tpu.models.material import render_knobs_from_conf

            knobs = render_knobs_from_conf(conf)
            # training defaults (conf models.render.* overrides; eval/
            # testers keep the exact paths):
            #  * stochastic-LOD + stochastic-BILINEAR mip sampling — one
            #    texture gather per tap, unbiased; quality-validated
            #    end-to-end against exact trilinear AND LOD-only
            #    stochastic (all three within ±0.4 dB on every metric,
            #    PERF.md round 4); Mat step 4.78 → 5.37 iters/s
            #  * proven rectangular occluders — exact candidate-list PVS,
            #    +2% apartment / +12% scan-scale steps (PERF.md round 4)
            knobs.setdefault("mip_stochastic", True)
            if knobs.get("mip_stochastic"):
                # bilinear rides the stochastic-LOD rng columns — only
                # default it on when LOD sampling is stochastic too
                # (setting it alone is a conf error, models/material.py)
                knobs.setdefault("bilinear_stochastic", True)
            knobs.setdefault("use_occluders", True)
            mesh = load_obj(path_mesh)
            hdr_tex = hdrio.read_hdr(
                path_mesh.replace("out1.obj", "hdr_texture.hdr"), flip=True
            )
            irt = hdrio.read_hdr(path_mesh.replace("out1.obj", "irt.hdr"), flip=True)
            spmd_mesh, atlas_mesh = parallel_meshes_from_conf(conf)
            model = MaterialModel(
                mesh, hdr_tex, irt,
                pano_res=self.pano_res,
                sample_light=tuple(conf.get_list("train.sample_light", default=[32, 16])),
                sample_type=tuple(
                    conf.get_list("models.render.sample_type", default=["uniform", "importance"])
                ),
                hdr_exposure=hdr_exposure,
                spmd_mesh=spmd_mesh,
                atlas_mesh=atlas_mesh,
                render_knobs=knobs,
            )
        self.model = model
        self.params = init_material_params(albedo_res, roughness_res)
        if getattr(self.model, "atlas_mesh", None) is not None:
            from texir_code_tpu.parallel.atlas_tp import shard_atlas

            self.params = jax.tree.map(
                lambda t: shard_atlas(self.model.atlas_mesh, t), self.params
            )
        if self.exp.continued:
            import jax.numpy as jnp

            restored = ckpt.restore_checkpoint(
                self.exp.checkpoints_dir,
                {
                    "albedo": np.asarray(self.params.albedo),
                    "roughness": np.asarray(self.params.roughness),
                },
            )
            if restored is not None:
                from texir_code_tpu.models.material import MaterialParams

                self.params = MaterialParams(
                    albedo=jnp.asarray(restored["albedo"]),
                    roughness=jnp.asarray(restored["roughness"]),
                )

        # per-view G-buffer/LOD cache HBM budget (ADVICE r2: the stacked
        # cache grows linearly with n_views · cube_res²; ~5 MB/view at the
        # reference pano 256×512, so the 2 GiB default covers ~400 views)
        self.view_cache_budget = int(
            conf.get_float("train.view_cache_budget_mb", default=2048.0) * 2**20
        )
        self.nepochs = max_epochs or conf.get_int("train.mat_epoch", default=40)
        self.lr = conf.get_float("train.mat_learning_rate", default=3e-2)
        self.sched_step = conf.get_int("train.mat_sched_step", default=20)
        self.sched_factor = conf.get_float("train.mat_sched_factor", default=0.8)
        self.plot_freq = conf.get_int("train.plot_freq", default=10)
        self.loss_type = conf.get_string("render_loss.loss_type", default="L1")
        # diagnostic scale on the stage-1/2 roughness prior terms
        # (models/losses.py::render_loss); 1.0 = reference parity
        self.seg_weight_scale = conf.get_float(
            "render_loss.seg_weight_scale", default=1.0
        )
        # EDT nearest-mapped fill of chart-gutter texels on the SAVED
        # atlases (written as *_padding.hdr beside the raw files, the
        # reference's own suffix convention).  The reference applies this
        # postprocess to IrT (README.md:70, tools/padding_texture.py:49-87:
        # "black regions ... due to the error of UV mapping ... we do a
        # simple padding"); material atlases have the same unobservable
        # gutter (~22% of texels frozen at init), and bilinear/mip taps at
        # chart boundaries read it, so the padded copies are the artifacts
        # a downstream consumer should texture with.
        self.pad_materials = conf.get_bool("train.pad_materials", default=True)

        roomseg_dir = os.path.join(
            os.path.dirname(os.path.dirname(path_mesh)), "roomseg"
        )
        self.roomseg = parse_roomseg(roomseg_dir)

        self.masks: Dict[str, Dict[str, np.ndarray]] = {}
        # per-resolution mapped-texel masks (depend only on mesh + res);
        # baking one is a full texture-space rasterization, so cache across
        # textures and repeated save/eval calls (ADVICE r4)
        self._valid_cache: Dict[int, np.ndarray] = {}

    def _valid_mask(self, res: int) -> np.ndarray:
        """[res, res] bool mapped-texel mask, cached per resolution."""
        cached = self._valid_cache.get(res)
        if cached is None:
            from texir_code_tpu.models.tracer_irt import bake_geometry_textures

            cached = np.asarray(
                bake_geometry_textures(self.model.mesh, res).valid
            ).astype(bool)
            self._valid_cache[res] = cached
        return cached

    # ------------------------------------------------------------------
    def _train_indices(self):
        """Dataset indices used for TRAINING: synthetic datasets hold out
        the novel views listed in info/novel.txt (reference
        train_material_invrender_syn.py-style split); every other dataset
        trains on all views.  The held-out views are still rendered by
        evaluate_novel_views — training on them would taint that metric."""
        ds = self.dataset
        train_ids = getattr(ds, "train_ids", None)
        if train_ids is None:
            return list(range(len(ds)))
        return [i for i, vid in enumerate(ds.ids) if vid in set(train_ids)]

    def build_masks(self):
        """First-val pass (reference :245-318): VHL render per view →
        highlight masks; seg ids with eroded floor; room ids."""
        import jax
        import jax.numpy as jnp
        from scipy import ndimage

        from texir_code_tpu.ops.shading import rgb_to_intensity

        for i in self._train_indices():
            item = self.dataset[i]
            vid = item["id"]
            out = self.model.forward(
                self.params,
                jnp.asarray(item["cam_to_world"]),
                jnp.asarray(item["cam_position"]),
                -1,
                jax.random.fold_in(self.key, i),
            )
            intensity = np.asarray(rgb_to_intensity(jnp.abs(out["rgb"])))
            highlight = (intensity > 0.0).astype(np.float32)  # (:286-290)

            seg_id = item["segs"][..., 0].astype(np.int32)
            seg_id = np.clip(seg_id, 0, NUM_SEG_CLASSES - 1)
            # erode the floor class 15×15; eroded-out pixels leave every class
            floor = (seg_id == FLOOR_CLASS).astype(np.uint8)
            if floor.any():
                er = np.stack(
                    [ndimage.grey_erosion(f, size=(15, 15)) for f in floor]
                )
                seg_id = np.where(
                    (floor > 0) & (er == 0), NUM_SEG_CLASSES, seg_id
                )
            region = (seg_id < NUM_SEG_CLASSES).astype(np.float32)[..., None]

            positions = np.asarray(out["position"])
            if self.roomseg is not None:
                room_id = room_ids_at(self.roomseg, positions)
                n_rooms = int(room_id.max()) + 1
            else:
                room_id = np.zeros(seg_id.shape, np.int32)
                n_rooms = 1

            self.masks[vid] = {
                "highlight": highlight,
                "seg_id": seg_id.astype(np.int32),
                "seg_region": region,
                "room_id": room_id,
                "n_rooms": n_rooms,
            }
        if self.roomseg is not None and self.masks:
            n = max(m["n_rooms"] for m in self.masks.values())
            print(
                f"roomseg active: n_rooms={n} — stage-2 seg prior runs "
                f"per (room x class) [mode 2]", flush=True,
            )

    # ------------------------------------------------------------------
    def _make_step(self, stage: int, optimizer):
        """Raw (unjitted) train step; `n_rooms` must be a Python int."""
        import jax
        import optax

        from texir_code_tpu.models.losses import render_loss
        from texir_code_tpu.models.material import clamp_material_params

        model = self.model
        loss_type = self.loss_type
        seg_weight_scale = self.seg_weight_scale
        num_classes = NUM_SEG_CLASSES + 1  # +1 ignore bucket (eroded floor rim)

        def step(params, opt_state, mvp, cam_pos, gt, gt_mask, seg_id,
                 highlight, seg_region, room_id, n_rooms, key, view=None):
            def loss_fn(p):
                # an empty dict stands for "no cache" in the epoch scan
                # (None can't ride through lax.scan xs)
                out = model._forward(p, mvp, cam_pos, key, stage=stage,
                                     view=view if view else None)
                total, seg_term = render_loss(
                    gt, out, gt_mask, seg_id, num_classes, stage,
                    highlight=highlight, seg_region=seg_region,
                    room_id=room_id, num_rooms=n_rooms,
                    loss_type=loss_type, seg_weight_scale=seg_weight_scale,
                )
                return total, seg_term

            (loss, seg_term), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return clamp_material_params(params), opt_state, loss, seg_term

        return step

    def _stack_epoch_data(self, indices):
        """Stack the training views' tensors along a leading view axis for
        the scanned epoch dispatch.  Returns (xs tuple of [V, ...] arrays,
        scene-global n_rooms).  The room count is the max over views — the
        roomseg image is scene-level (reference utils/general.py:115-125),
        so the mode-2 seg loss normalizes by the scene's room count for
        every view rather than a per-view maximum."""
        import jax.numpy as jnp

        cols = {k: [] for k in (
            "mvp", "pos", "gt", "mask", "seg", "hl", "region", "room")}
        n_rooms = 1
        ids = []
        for i in indices:
            item = self.dataset[i]
            m = self.masks[item["id"]]
            cols["mvp"].append(item["cam_to_world"])
            cols["pos"].append(item["cam_position"])
            cols["gt"].append(item["color"])
            cols["mask"].append(item["mask"])
            cols["seg"].append(m["seg_id"])
            cols["hl"].append(m["highlight"])
            cols["region"].append(m["seg_region"])
            cols["room"].append(m["room_id"])
            n_rooms = max(n_rooms, m["n_rooms"])
            ids.append(item["id"])
        xs = tuple(jnp.asarray(np.stack(v)) for v in cols.values())

        # views are fixed across all epochs: trace each view's G-buffer +
        # LODs ONCE (the primary trace is ~30% of a stage-2 step) and carry
        # the stacked per-view cache through the epoch scan.  Numerically
        # equivalent to retracing in-step (same ops, same inputs; separate
        # jit).  Memory: ~12 fp32/pixel → n_views · 6 · cube_res² · 48 B
        # (~5 MB/view at the reference pano 256×512); above
        # view_cache_budget bytes the runner falls back to in-step G-buffer
        # recompute (view=None) instead of pressuring HBM.
        import jax

        n_views = len(indices)
        res = self.model.cube_res
        cache_bytes = n_views * 6 * res * res * 12 * 4
        if cache_bytes > self.view_cache_budget:
            print(
                f"per-view cache {cache_bytes/2**20:.0f} MiB exceeds budget "
                f"{self.view_cache_budget/2**20:.0f} MiB — recomputing "
                f"G-buffers in-step"
            )
            return xs + (None,), n_rooms, ids
        pre = jax.jit(self.model.precompute_view)
        views = [pre(self.params, m, p) for m, p in zip(xs[0], xs[1])]
        views = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *views)
        return xs + (views,), n_rooms, ids

    def _substage(self, stage: int, epochs: int, cur_iter: int) -> int:
        """One substage: `epochs` epochs over the training views, each epoch
        a SINGLE jitted dispatch that lax.scan's the per-view step (the
        tunneled-relay per-dispatch cost is heavy-tailed — seconds,
        occasionally — so per-view dispatch dominates small steps; see
        PERF.md).  Numerically identical to the per-view loop: same fold_in
        key sequence, same view order."""
        import jax
        import jax.numpy as jnp
        import optax

        indices = self._train_indices()
        steps_per_epoch = max(1, len(indices))
        schedule = optax.exponential_decay(
            self.lr, transition_steps=self.sched_step * steps_per_epoch,
            decay_rate=self.sched_factor, staircase=True,
        )
        optimizer = optax.adam(schedule)
        opt_state = optimizer.init(self.params)
        step = self._make_step(stage, optimizer)
        xs, n_rooms, view_ids = self._stack_epoch_data(indices)
        base_key = self.key

        def train_epoch(params, opt_state, xs, iter0):
            def body(carry, inp):
                p, o = carry
                (mvp, pos, gt, mask, seg, hl, region, room, view), it = inp
                k = jax.random.fold_in(base_key, it)
                p, o, loss, seg_term = step(
                    p, o, mvp, pos, gt, mask, seg, hl, region, room, n_rooms,
                    k, view=view,
                )
                return (p, o), (loss, seg_term)

            # view=None (cache over budget): scan without the view leaf —
            # the step recomputes the G-buffer in-step
            if xs[-1] is None:
                xs = xs[:-1] + ({},)  # empty pytree scans as "no view data"

            its = iter0 + jnp.arange(len(indices), dtype=jnp.int32)
            (params, opt_state), (losses, seg_terms) = jax.lax.scan(
                body, (params, opt_state), (xs, its)
            )
            return params, opt_state, losses, seg_terms

        epoch_fn = jax.jit(train_epoch, donate_argnums=(0, 1))

        for epoch in range(epochs):
            t0 = time.time()
            self.params, opt_state, losses, seg_terms = epoch_fn(
                self.params, opt_state, xs, jnp.int32(cur_iter)
            )
            losses = np.asarray(losses)
            seg_terms = np.asarray(seg_terms)
            dt = (time.time() - t0) / len(indices)
            for bi, i in enumerate(indices):
                print(
                    f"{self.expname} [{epoch}] ({i}/{len(self.dataset)}): "
                    f"img_loss_stage{stage} ({self.loss_type}) = {losses[bi]:.6f}, "
                    f"seg_loss = {seg_terms[bi]:.6f}, id = {view_ids[bi]}, "
                    f"batch cost time : {dt:.4f}s"
                )
                self.writer.add_scalar(
                    f"img_loss_{self.loss_type}_stage{stage}", float(losses[bi]),
                    cur_iter + bi,
                )
                self.writer.add_scalar(
                    f"seg_loss_{self.loss_type}_stage{stage}", float(seg_terms[bi]),
                    cur_iter + bi,
                )
            cur_iter += len(indices)
            if self.plot_freq and (epoch + 1) % self.plot_freq == 0:
                self.plot_to_disk(stage, f"s{stage}_e{epoch}")
        return cur_iter

    # ------------------------------------------------------------------
    def plot_to_disk(self, stage: int, tag: str):
        """Periodic pano plots of GT vs prediction (reference
        plot_to_disk_cube, :323-346): render each view, warp cube faces to a
        pano, write a stacked pred/gt HDR grid."""
        import jax
        import jax.numpy as jnp

        from texir_code_tpu.ops.pano import PanoCubeWarp

        res = self.model.cube_res
        warp = PanoCubeWarp(self.pano_res[0], self.pano_res[1], res)
        for i in range(len(self.dataset)):
            item = self.dataset[i]
            out = self.model.forward(
                self.params,
                jnp.asarray(item["cam_to_world"]),
                jnp.asarray(item["cam_position"]),
                stage,
                jax.random.fold_in(self.key, 30_000 + i),
            )
            pred = np.asarray(warp.to_pano(out["rgb"]))
            gt = np.asarray(warp.to_pano(jnp.asarray(item["color"])))
            hdrio.plot_irf(
                os.path.join(self.exp.plots_dir, f"{i}_{tag}.hdr"), pred, gt
            )

    def save_materials(self, tag: str = "final"):
        """Write the optimized atlases to plots/ (the artifact checkpoints
        the testers consume, reference models/test_nvdiffrast.py:119-130)
        and an orbax checkpoint."""
        albedo = np.asarray(self.params.albedo)
        rough = np.asarray(self.params.roughness)
        hdrio.write_hdr(os.path.join(self.exp.plots_dir, f"mat_albedo_{tag}.hdr"), albedo)
        hdrio.write_hdr(os.path.join(self.exp.plots_dir, f"mat_roughness_{tag}.hdr"), rough)
        if self.pad_materials:
            from texir_code_tpu.ops.postprocess import pad_texture

            for name, tex in (("albedo", albedo), ("roughness", rough)):
                valid = self._valid_mask(tex.shape[0])
                hdrio.write_hdr(
                    os.path.join(
                        self.exp.plots_dir, f"mat_{name}_{tag}_padding.hdr"
                    ),
                    pad_texture(tex, valid),
                )
        ckpt.save_checkpoint(
            self.exp.checkpoints_dir, 0,
            {"albedo": albedo, "roughness": rough},
        )

    def render_calculate(self, stage: int = 2) -> Dict[str, float]:
        """Tonemapped re-render MSE/PSNR/SSIM over training views
        (reference :359-406)."""
        import jax
        import jax.numpy as jnp

        from texir_code_tpu.models.losses import ssim
        from texir_code_tpu.ops.shading import mse_to_psnr, tonemap

        mse = psnr = ssim_v = 0.0
        n = len(self.dataset)
        for i in range(n):
            item = self.dataset[i]
            out = self.model.forward(
                self.params,
                jnp.asarray(item["cam_to_world"]),
                jnp.asarray(item["cam_position"]),
                stage,
                jax.random.fold_in(self.key, 10_000 + i),
            )
            pred = tonemap(out["rgb"])
            gt = tonemap(jnp.asarray(item["color"]))
            m = float(jnp.mean((pred - gt) ** 2))
            mse += m
            psnr += float(mse_to_psnr(jnp.asarray(m)))
            ssim_v += float(ssim(pred, gt))
        metrics = {"mse": mse / n, "psnr": psnr / n, "ssim": ssim_v / n}
        print(
            "re-rendering error: mse: {mse}, psnr: {psnr}, ssim: {ssim}".format(**metrics)
        )
        return metrics

    def run(self):
        print("training...")
        self.build_masks()  # the reference's plot_to_disk_cube(stage=0) VHL pass
        cur_iter = 0
        # stage 0: albedo only (Lambertian init)
        cur_iter = self._substage(0, self.nepochs, cur_iter)
        # stage 1: roughness via highlights, fresh Adam (reference :471-476)
        cur_iter = self._substage(1, self.nepochs, cur_iter)
        # stage 2: joint, fresh Adam (reference :538-)
        cur_iter = self._substage(2, self.nepochs, cur_iter)
        self.save_materials()
        self.render_calculate(2)
        return self.params
