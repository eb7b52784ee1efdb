"""Tester runners: editing, novel view, relighting, re-render error.

Rebuilds of the reference tester stage runners (tester/exp_runner.py:42-47):

  * MatEditingRunner   — tester/test_editing.py: seg-driven material edits,
                         with `change_color` linear interpolation frames.
  * NovelViewRunner    — tester/test_novel.py: render the ImageCubeNovel
                         dolly trajectory.
  * RelightingRunner   — tester/test_relighting.py: path-traced re-lighting
                         with quad lights (see eval/path_tracer.py).
  * MatErrorRunner     — tester/test_error.py: re-render MSE/PSNR/SSIM over
                         the training views.

Each runner loads the optimized atlases from the newest Mat experiment
(plots dir), exactly like the reference's `sort_res` artifact pickup.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from texir_code_tpu.config import Config
from texir_code_tpu.data import hdrio
from texir_code_tpu.data.datasets import ImageCubeDerived, ImageCubeNovel
from texir_code_tpu.eval.renderer import EvalMaterialModel, load_optimized_materials
from texir_code_tpu.train.exp import ExperimentDir, seed_everything


def _find_mat_plots(exps_root: str, expname: str, timestamp: Optional[str] = None) -> str:
    base = os.path.join(exps_root, f"Mat-{expname}")
    stamps = sorted(os.listdir(base))
    if timestamp and timestamp != "latest":
        stamp = timestamp
    else:
        stamp = stamps[-1]
    return os.path.join(base, stamp, "plots")


class _TesterBase:
    STAGE = "Test"

    def __init__(
        self,
        conf: Config,
        expname: str = "default",
        exps_root: str = "exps",
        timestamp: Optional[str] = None,
        conf_path: Optional[str] = None,
        dataset=None,
        model=None,
        params=None,
        seg_texture: Optional[np.ndarray] = None,
        sample_light: Optional[Sequence[int]] = None,
    ):
        from texir_code_tpu.geometry import load_obj

        self.conf = conf
        self.expname = expname
        self.exp = ExperimentDir(exps_root, self.STAGE, expname, conf_path=conf_path)
        self.key = seed_everything(666)

        path_mesh = conf.get_string("train.path_mesh_open3d")
        self.path_mesh = path_mesh
        self.pano_res = tuple(conf.get_list("train.pano_img_res", default=[256, 512]))
        hdr_exposure = conf.get_float("train.hdr_exposure", default=0.0)
        sl = sample_light or conf.get_list("train.sample_light", default=[1024, 256])

        if model is None:
            mesh = load_obj(path_mesh)
            hdr_tex = hdrio.read_hdr(
                path_mesh.replace("out1.obj", "hdr_texture.hdr"), flip=True
            )
            irt = hdrio.read_hdr(path_mesh.replace("out1.obj", "irt.hdr"), flip=True)
            if seg_texture is None:
                seg_path = path_mesh.replace("out1.obj", "0_seg_gray.png")
                if os.path.exists(seg_path):
                    seg_texture = hdrio.read_gray(seg_path)[::-1]  # v-up
            from texir_code_tpu.models.material import (
                render_knobs_from_conf,
            )

            knobs = render_knobs_from_conf(conf)
            # occluder PVS on the bulk secondary rays (exact; pays at the
            # reference eval spp of 1024/256 — PERF.md round 4); the
            # stochastic sampling knobs stay OFF here: eval is exact
            knobs.setdefault("use_occluders", True)
            model = EvalMaterialModel(
                mesh, hdr_tex, irt,
                pano_res=self.pano_res, sample_light=tuple(sl),
                hdr_exposure=hdr_exposure, seg_texture=seg_texture,
                render_knobs=knobs,
            )
        self.model = model
        if params is None:
            plots = _find_mat_plots(exps_root, expname, timestamp)
            params = load_optimized_materials(plots)
        self.params = params
        self.dataset = dataset

    def _default_dataset(self):
        return ImageCubeDerived(
            self.path_mesh, resolution=self.pano_res,
            hdr_exposure=self.conf.get_float("train.hdr_exposure", default=0.0),
        )

    def _render(self, item, stage=2, **kw):
        import jax
        import jax.numpy as jnp

        return self.model.forward(
            self.params,
            jnp.asarray(item["cam_to_world"]),
            jnp.asarray(item["cam_position"]),
            stage,
            jax.random.fold_in(self.key, 0),
            **kw,
        )


def expand_keyframes(
    keyframes: Sequence, frames_per_segment: int
) -> List[np.ndarray]:
    """Piecewise-linear keyframe expansion, matching the reference's
    `change_color` (tester/test_editing.py:173-206): the first keyframe,
    then `frames_per_segment` linspace(0,1)-inclusive samples per segment
    (so segment boundaries repeat, exactly like the reference)."""
    kfs = [np.asarray(k, np.float32) for k in keyframes]
    out = [kfs[0]]
    for i in range(1, len(kfs)):
        for t in np.linspace(0.0, 1.0, frames_per_segment):
            out.append(((1 - t) * kfs[i - 1] + t * kfs[i]).astype(np.float32))
    return out


def parse_editing_conf(conf: Config):
    """Read a `test.editing` conf block into keyframe tracks.

    Schema (conf-driven version of the hard-coded specs in
    tester/test_editing.py:236-281):

        test { editing {
            frames_per_segment = 5
            views = [0]              # view indices; absent/[] = all views
            classes = [1, 2]
            albedo_1 = [[r,g,b], [r,g,b], ...]   # keyframes for seg class 1
            roughness_2 = [0.01, 0.2, ...]       # scalar keyframes
        }}

    Returns (keyframes, views, frames_per_segment) or None when the conf has
    no editing block.
    """
    classes = conf.get_list("test.editing.classes", default=None)
    if classes is None:
        return None
    fps = conf.get_int("test.editing.frames_per_segment", default=5)
    views = conf.get_list("test.editing.views", default=[]) or None
    keyframes: Dict[int, Dict[str, list]] = {}
    for cls in classes:
        spec = {}
        a = conf.get_list(f"test.editing.albedo_{cls}", default=None)
        r = conf.get_list(f"test.editing.roughness_{cls}", default=None)
        if a is not None:
            spec["albedo"] = a
        if r is not None:
            spec["roughness"] = [[v] if np.isscalar(v) else v for v in r]
        keyframes[int(cls)] = spec
    return keyframes, views, fps


class MatEditingRunner(_TesterBase):
    STAGE = "Editing"

    def _render_edit(self, params, item, key) -> np.ndarray:
        import jax.numpy as jnp

        out = self.model.forward(
            params, jnp.asarray(item["cam_to_world"]),
            jnp.asarray(item["cam_position"]), 2, key,
        )
        return np.asarray(out["rgb"])

    def run(
        self,
        edits: Optional[Dict[int, Dict[str, object]]] = None,
        num_frames: int = 1,
        end_edits: Optional[Dict[int, Dict[str, object]]] = None,
        views: Optional[Sequence[int]] = None,
    ) -> List[np.ndarray]:
        """Render edited materials; with `end_edits`, linearly interpolate
        edit values across frames (the reference's change_color animation,
        tester/test_editing.py:174-206).  `views` selects which dataset
        views to render per frame (default: view 0, like the reference's
        plot_to_disk_varying; the reference's plot_to_disk_cube loop over
        every view is `views=range(len(ds))`)."""
        import jax

        ds = self.dataset or self._default_dataset()
        edits = edits or {}
        view_ids = list(views) if views is not None else [0]
        frames = []
        for f in range(num_frames):
            t = f / max(num_frames - 1, 1)
            cur = {}
            for cls, spec in edits.items():
                cur[cls] = dict(spec)
                if end_edits and cls in end_edits:
                    for k, v in end_edits[cls].items():
                        a = np.asarray(spec.get(k, v), np.float32)
                        b = np.asarray(v, np.float32)
                        cur[cls][k] = (1 - t) * a + t * b
            params = self.model.edited_params(self.params, cur) if cur else self.params
            for v in view_ids:
                item = ds[v]
                img = self._render_edit(params, item, jax.random.fold_in(self.key, f))
                frames.append(img)
                name = (
                    f"edit_{f:03d}.hdr" if len(view_ids) == 1
                    else f"edit_{f:03d}_v{v}.hdr"
                )
                hdrio.plot_mat(
                    os.path.join(self.exp.plots_dir, name),
                    img, np.asarray(item["color"]),
                )
        return frames

    def run_keyframes(
        self,
        keyframes: Dict[int, Dict[str, Sequence]],
        frames_per_segment: int = 5,
        views: Optional[Sequence[int]] = None,
    ) -> List[np.ndarray]:
        """Keyframed edit animation (the reference's plot_to_disk_varying,
        tester/test_editing.py:236-316, with the hard-coded hdrhouse specs
        replaced by conf-driven tracks — see parse_editing_conf).

        keyframes: {seg_class: {"albedo": [kf, ...], "roughness": [kf, ...]}}.
        Every track is expanded with `expand_keyframes`; the animation length
        is the longest track, shorter tracks hold their final value.  All
        edited properties apply simultaneously per frame."""
        import jax

        ds = self.dataset or self._default_dataset()
        view_ids = list(views) if views is not None else list(range(len(ds)))
        tracks = {
            cls: {
                prop: expand_keyframes(kfs, frames_per_segment)
                for prop, kfs in spec.items() if kfs
            }
            for cls, spec in keyframes.items()
        }
        n_frames = max(
            (len(t) for spec in tracks.values() for t in spec.values()),
            default=0,
        )
        frames = []
        for f in range(n_frames):
            cur = {
                cls: {
                    prop: track[min(f, len(track) - 1)]
                    for prop, track in spec.items()
                }
                for cls, spec in tracks.items()
            }
            params = self.model.edited_params(self.params, cur)
            for v in view_ids:
                item = ds[v]
                img = self._render_edit(params, item, jax.random.fold_in(self.key, f))
                frames.append(img)
                hdrio.plot_mat(
                    os.path.join(self.exp.plots_dir, f"edit_{f:03d}_v{v}.hdr"),
                    img, np.asarray(item["color"]),
                )
        return frames

    def run_from_conf(self) -> List[np.ndarray]:
        """Drive the editing animation from the conf's test.editing block;
        falls back to an unedited render of every view when absent
        (the reference's plot_to_disk_cube)."""
        spec = parse_editing_conf(self.conf)
        if spec is None:
            ds = self.dataset or self._default_dataset()
            return self.run(num_frames=1, views=range(len(ds)))
        keyframes, views, fps = spec
        return self.run_keyframes(keyframes, frames_per_segment=fps, views=views)


class NovelViewRunner(_TesterBase):
    STAGE = "View"

    def run(self, num: int = 60, start_index: int = 0) -> List[np.ndarray]:
        ds = ImageCubeNovel(
            self.path_mesh, resolution=self.pano_res,
            start_index=start_index, num=num,
        )
        frames = []
        for i in range(len(ds)):
            out = self._render(ds[i])
            img = np.asarray(out["rgb"])
            frames.append(img)
            hdrio.write_hdr(
                os.path.join(self.exp.plots_dir, f"novel_{i:03d}.hdr"),
                np.concatenate(list(img), axis=1),
            )
        return frames


class RelightingRunner(_TesterBase):
    STAGE = "Relighting"

    def run(
        self,
        mode: str = "emitter",
        new_color: Sequence[float] = (1.0, 0.2, 0.2),
        pano_res=(64, 128),
        spp: int = 16,
        max_bounces: int = 3,
    ) -> List[np.ndarray]:
        """mode='emitter': recolor the scene's light sources and re-shade by
        live MC (reference test_nvdiffrast relighting branch).
        mode='pathtrace': full path tracing with a quad light per camera
        (reference test_redner)."""
        ds = self.dataset or self._default_dataset()
        frames = []
        if mode == "emitter":
            import jax
            import jax.numpy as jnp

            for i in range(len(ds)):
                item = ds[i]
                out = self.model.forward_relit(
                    self.params,
                    jnp.asarray(item["cam_to_world"]),
                    jnp.asarray(item["cam_position"]),
                    jax.random.fold_in(self.key, i),
                    new_color=tuple(new_color),
                )
                img = np.asarray(out["rgb"])
                frames.append(img)
                hdrio.write_hdr(
                    os.path.join(self.exp.plots_dir, f"relit_{i:03d}.hdr"),
                    np.concatenate(list(img), axis=1),
                )
            return frames

        # path-traced relighting with explicit quad lights
        import jax

        from texir_code_tpu.eval.path_tracer import (
            PathTracedMaterialModel,
            light_under_camera,
        )

        lights = [
            light_under_camera(ds[i]["cam_position"]) for i in range(len(ds))
        ]
        tracer = PathTracedMaterialModel(
            self.model.mesh,
            np.asarray(self.params.albedo),
            np.asarray(self.params.roughness),
            lights, max_bounces=max_bounces, spp=spp,
        )
        for i in range(len(ds)):
            img = tracer.render_pano(
                ds[i]["cam_position"], pano_res, jax.random.fold_in(self.key, i)
            )
            frames.append(img)
            hdrio.write_hdr(
                os.path.join(self.exp.plots_dir, f"pt_relit_{i:03d}.hdr"), img
            )
        return frames


class MatErrorRunner(_TesterBase):
    STAGE = "Error"

    def run(self) -> Dict[str, float]:
        """Tonemapped re-render MSE/PSNR/SSIM over the training views
        (reference tester/test_error.py:169-196)."""
        import jax.numpy as jnp

        from texir_code_tpu.models.losses import ssim
        from texir_code_tpu.ops.shading import mse_to_psnr, tonemap

        ds = self.dataset or self._default_dataset()
        mse = psnr = ssim_v = 0.0
        for i in range(len(ds)):
            item = ds[i]
            out = self._render(item)
            pred = tonemap(out["rgb"])
            gt = tonemap(jnp.asarray(item["color"]))
            m = float(jnp.mean((pred - gt) ** 2))
            mse += m
            psnr += float(mse_to_psnr(jnp.asarray(m)))
            ssim_v += float(ssim(pred, gt))
        n = len(ds)
        metrics = {"mse": mse / n, "psnr": psnr / n, "ssim": ssim_v / n}
        print("re-rendering error:", metrics)
        if os.environ.get("TEXIR_TIME_DEVICE"):
            metrics.update(self._probe_device_time(ds[0]))
        return metrics

    def _probe_device_time(self, item) -> Dict[str, float]:
        """Split one view's render wall-clock into device-compute vs relay
        overhead (VERDICT r4 weak #6: the stage wall-clock is claim-latency
        dominated on the tunneled axon backend, useless for round-over-round
        comparison).  Method: the relay replays byte-identical dispatches
        from cache (~0 device time), so
            t(fresh seed) ≈ relay + device,  t(repeat seed) ≈ relay,
        giving device ≈ t_fresh − t_repeat.  Single-view probe; multiply by
        n_views for the stage's device component."""
        import time as _time

        import jax
        import jax.numpy as jnp

        mvp = jnp.asarray(item["cam_to_world"])
        pos = jnp.asarray(item["cam_position"])

        def render(seed):
            out = self.model.forward(
                self.params, mvp, pos, 2, jax.random.fold_in(self.key, seed)
            )
            jax.block_until_ready(out["rgb"])

        render(90_001)  # warmup (compile + cache priming)
        t0 = _time.time(); render(90_002); t_fresh = _time.time() - t0
        t0 = _time.time(); render(90_002); t_repeat = _time.time() - t0
        probe = {
            "view_wall_s": t_fresh,
            "view_relay_s": t_repeat,
            "view_device_s": max(0.0, t_fresh - t_repeat),
        }
        print(
            f"device-time probe (1 view): wall {t_fresh:.2f}s = "
            f"device {probe['view_device_s']:.2f}s + relay ~{t_repeat:.2f}s",
            flush=True,
        )
        return probe
