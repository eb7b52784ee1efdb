"""Datasets over the reference's scan-data layout.

Rebuilds the six dataset classes of reference datasets/dataset.py against
the same on-disk layout:

    <root>/vrproc/hdr_texture/out1.obj(+hdr_texture.hdr, irt.hdr)   mesh+atlas
    <root>/info/aligned.txt                  view ids, one per line
    <root>/info/final_extrinsics.txt         header + 4 rows of 4 per view
    <root>/derived/<id>/panoImage_orig.jpg   LDR pano with alpha mask
    <root>/derived/<id>/panoImage_gray.png   semantic segmentation pano
    <root>/hdr/<id>/ccm.hdr                  HDR pano
    (synthetic) <root>/gt/<id>_albedo.hdr, _roughness.hdr, info/novel.txt

Classes (reference lines cited per class):
    MeshPoint          — per-epoch uniform surface resampling (:39-93)
    ImageMeshPoint     — one pano G-buffer for NIrF validation (:96-238)
    ImageDerived       — equirect HDR views (:242-349)
    ImageCubeDerived   — cube-face stacks + MVPs, the Mat input (:352-549)
    ImageCubeNovel     — synthesized dolly trajectory (:552-666)
    ImageCubeSyn       — + GT materials + held-out novel split (:669-893)

Items are dicts of numpy/jax arrays; batching is the trainer's concern (the
reference's DataLoader batch_size is 1 for image datasets anyway).
The cube MVP construction delegates to ops.gbuffer.cube_mvp (see its
docstring for the one deliberate convention difference from the reference).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from texir_code_tpu.data import hdrio
from texir_code_tpu.geometry import load_obj


def _root_from_mesh(path_mesh: str) -> str:
    """The reference derives the data root as dirname(dirname(mesh))
    (datasets/dataset.py:356)."""
    return os.path.dirname(os.path.dirname(path_mesh))


def read_ids(root: str) -> List[str]:
    with open(os.path.join(root, "info", "aligned.txt")) as f:
        return [ln.strip() for ln in f if ln.strip()]


def read_extrinsics(root: str) -> np.ndarray:
    """[N, 4, 4] camera-to-world matrices (header line skipped)."""
    with open(os.path.join(root, "info", "final_extrinsics.txt")) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    rows = [list(map(float, ln.split())) for ln in lines[1:]]
    arr = np.asarray(rows, np.float32)
    return arr.reshape(-1, 4, 4)


class MeshPoint:
    """Uniform surface points, resampled every epoch (reference :39-93)."""

    def __init__(
        self,
        path_mesh: str,
        num_sample: int = 1024,
        offset: float = 1e-2,
        seed: int = 666,
    ):
        self.mesh = load_obj(path_mesh)
        self.num_sample = num_sample
        self.offset = offset
        self._rng = np.random.default_rng(seed)
        self.aabb = self.mesh.aabb()
        self.points = np.zeros((0, 3), np.float32)
        self.normals = np.zeros((0, 3), np.float32)
        self.change_points()

    def change_points(self) -> None:
        """Resample the point set (reference :80-81, called per epoch at
        trainer/train_irrf.py:238)."""
        pts, nrm = self.mesh.sample_surface(self.num_sample, self._rng)
        self.points = pts + self.offset * nrm
        self.normals = nrm

    def __len__(self) -> int:
        return self.num_sample

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        return {"points": self.points[idx], "normals": self.normals[idx]}

    def batches(self, batch_size: int):
        for s in range(0, self.num_sample, batch_size):
            sl = slice(s, s + batch_size)
            yield {"points": self.points[sl], "normals": self.normals[sl]}


class ImageMeshPoint:
    """Pano G-buffer (position+normal) of one fixed view for NIrF validation
    (reference :96-238 renders it through pyredner; here it is ray cast)."""

    def __init__(
        self,
        path_mesh: str,
        env_res: Tuple[int, int] = (512, 1024),
        view_index: int = 0,
        offset: float = 1e-2,
    ):
        from texir_code_tpu.geometry.bvh import build_bvh
        from texir_code_tpu.ops.gbuffer import DeviceMesh
        from texir_code_tpu.ops.raycast import DeviceBVH, cast_rays
        import jax.numpy as jnp

        self.env_res = tuple(env_res)
        mesh = load_obj(path_mesh)
        root = _root_from_mesh(path_mesh)
        ext = read_extrinsics(root)[view_index]
        cam = ext[0:3, 3]

        h, w = self.env_res
        theta, phi = np.meshgrid(
            np.linspace(-np.pi, np.pi, w, dtype=np.float32),
            np.linspace(0.5 * np.pi, -0.5 * np.pi, h, dtype=np.float32),
        )
        dirs = np.stack(
            [np.cos(phi) * np.sin(theta), np.sin(phi), np.cos(phi) * np.cos(theta)],
            axis=-1,
        ).reshape(-1, 3)
        # rotate into world by the camera basis
        dirs = dirs @ ext[0:3, 0:3].T

        bvh = DeviceBVH.from_flat(build_bvh(mesh.vertices, mesh.faces))
        dm = DeviceMesh.from_mesh(mesh)
        origins = np.broadcast_to(cam, dirs.shape).astype(np.float32)
        hit = cast_rays(bvh, jnp.asarray(origins), jnp.asarray(dirs), t_min=1e-5)
        from texir_code_tpu.ops.gbuffer import interpolate_attributes

        pos, nrm, _ = interpolate_attributes(dm, hit)
        valid = np.asarray(hit.prim) >= 0
        self.points = (
            np.asarray(pos) + offset * np.asarray(nrm)
        ).astype(np.float32)
        self.normals = np.asarray(nrm).astype(np.float32)
        self.mask = valid.reshape(h, w)
        self.points[~valid] = 0
        self.normals[~valid] = 0

    def __len__(self) -> int:
        return self.points.shape[0]

    def batches(self, batch_size: int):
        n = len(self)
        for s in range(0, n, batch_size):
            sl = slice(s, s + batch_size)
            yield {"points": self.points[sl], "normals": self.normals[sl]}


class ImageDerived:
    """Equirect HDR views + masks (reference :242-349)."""

    def __init__(self, path_mesh: str, hdr_exposure: float = 5.0):
        self.root = _root_from_mesh(path_mesh)
        self.hdr_exposure = hdr_exposure
        self.ids = read_ids(self.root)
        ext = read_extrinsics(self.root)
        self.extrinsics = ext[: len(self.ids)]

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        vid = self.ids[index]
        ldr = hdrio.read_image(
            os.path.join(self.root, "derived", vid, "panoImage_orig.jpg")
        )
        mask = ldr[:, :, 3:4] if ldr.shape[-1] == 4 else np.ones_like(ldr[:, :, :1])
        import cv2

        mask8 = (mask[:, :, 0] * 255).astype(np.uint8)
        mask8 = cv2.erode(mask8, np.ones((7, 7), np.uint8))
        mask = (mask8.astype(np.float32) / 255.0)[..., None]

        color = hdrio.read_hdr(os.path.join(self.root, "hdr", vid, "ccm.hdr"))
        color = np.clip(color, 0.0, None) * (2.0 ** self.hdr_exposure)
        return {
            "color": color,
            "mask": mask,
            "cam_to_world": self.extrinsics[index],
            "cam_position": self.extrinsics[index][0:3, 3],
            "id": vid,
        }


class ImageCubeDerived:
    """Cube-face stacks + per-face MVPs — the Mat-stage input
    (reference :352-549)."""

    def __init__(
        self,
        path_mesh: str,
        resolution: Tuple[int, int] = (256, 512),
        hdr_exposure: float = 5.0,
    ):
        from texir_code_tpu.ops.pano import PanoCubeWarp

        self.root = _root_from_mesh(path_mesh)
        self.resolution = tuple(resolution)
        self.cube_res = int(resolution[1] // 4)
        self.hdr_exposure = hdr_exposure
        self.ids = read_ids(self.root)
        ext = read_extrinsics(self.root)
        self.extrinsics = ext[: len(self.ids)]
        self._warp = None  # lazy: pano size discovered from the first image

    def __len__(self) -> int:
        return len(self.ids)

    def _get_warp(self, h: int, w: int):
        from texir_code_tpu.ops.pano import PanoCubeWarp

        if self._warp is None or self._warp.pano_h != h:
            self._warp = PanoCubeWarp(h, w, self.cube_res)
        return self._warp

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import cv2
        import jax.numpy as jnp

        from texir_code_tpu.ops.gbuffer import cube_mvp

        vid = self.ids[index]
        ldr = hdrio.read_image(
            os.path.join(self.root, "derived", vid, "panoImage_orig.jpg")
        )
        h, w = ldr.shape[:2]
        mask = ldr[:, :, 3:4] if ldr.shape[-1] == 4 else np.ones((h, w, 1), np.float32)
        mask8 = (mask[:, :, 0] * 255).astype(np.uint8)
        mask8 = cv2.erode(mask8, np.ones((5, 5), np.uint8))
        mask = (mask8.astype(np.float32) / 255.0)[..., None]

        color = hdrio.read_hdr(os.path.join(self.root, "hdr", vid, "ccm.hdr"))
        color = np.clip(color, 0.0, None) * (2.0 ** self.hdr_exposure)

        gray = cv2.cvtColor(color, cv2.COLOR_RGB2GRAY)
        gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
        gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
        rgb_grad = cv2.magnitude(gx, gy)[..., None]

        seg_path = os.path.join(self.root, "derived", vid, "panoImage_gray.png")
        segs = hdrio.read_gray(seg_path)
        if segs.shape != (h, w):
            segs = cv2.resize(segs, (w, h), interpolation=cv2.INTER_NEAREST)
        segs = segs[..., None].astype(np.float32)

        # pano → 6 cube faces (nearest, like the reference :515)
        packed = np.concatenate([color, mask, segs, rgb_grad], axis=-1)
        warp = self._get_warp(h, w)
        cube = np.asarray(warp.to_cube(jnp.asarray(packed), mode="nearest"))

        mvp = np.asarray(cube_mvp(jnp.asarray(self.extrinsics[index])))
        return {
            "color": cube[..., 0:3],
            "mask": cube[..., 3:4],
            "segs": cube[..., 4:5],
            "rgb_grad": cube[..., 5:6],
            "cam_to_world": mvp,  # reference keeps the mvp under this key (:381)
            "cam_position": self.extrinsics[index][0:3, 3],
            "id": vid,
        }


class ImageCubeNovel:
    """Synthesized dolly trajectory (reference :552-666): `num` poses from
    view `start_index`, moving along `direction`."""

    def __init__(
        self,
        path_mesh: str,
        resolution: Tuple[int, int] = (256, 512),
        hdr_exposure: float = 5.0,
        start_index: int = 2,
        direction=(1.0, 0.0, 0.0),
        distance: float = 6.0,
        num: int = 60,
        start_offset=(-0.2, 0.0, -0.6),
    ):
        self.cube_res = int(resolution[1] // 4)
        root = _root_from_mesh(path_mesh)
        base = read_extrinsics(root)[start_index].copy()
        base[0:3, 3] += np.asarray(start_offset, np.float32)
        step = distance / num
        self.extrinsics = []
        for i in range(num):
            e = base.copy()
            e[0:3, 3] = e[0:3, 3] + np.asarray(direction, np.float32) * step * i
            self.extrinsics.append(e)

    def __len__(self) -> int:
        return len(self.extrinsics)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        from texir_code_tpu.ops.gbuffer import cube_mvp

        e = self.extrinsics[index]
        return {
            "cam_to_world": np.asarray(cube_mvp(jnp.asarray(e))),
            "cam_position": e[0:3, 3],
        }


class ImageCubeSyn(ImageCubeDerived):
    """Synthetic scenes: ImageCubeDerived + GT materials + novel split
    (reference :669-893)."""

    def __init__(
        self,
        path_mesh: str,
        resolution: Tuple[int, int] = (256, 512),
        hdr_exposure: float = 5.0,
    ):
        super().__init__(path_mesh, resolution, hdr_exposure)
        novel_path = os.path.join(self.root, "info", "novel.txt")
        self.novel_ids: List[str] = []
        if os.path.exists(novel_path):
            with open(novel_path) as f:
                self.novel_ids = [ln.strip() for ln in f if ln.strip()]
        self.train_ids = [i for i in self.ids if i not in self.novel_ids]
        gt_dir = os.path.join(self.root, "gt")
        self.gt_albedo = None
        self.gt_roughness = None
        if os.path.isdir(gt_dir):
            a = os.path.join(gt_dir, "albedo.hdr")
            r = os.path.join(gt_dir, "roughness.hdr")
            if os.path.exists(a):
                # sRGB→linear conversion as the reference does (:849)
                self.gt_albedo = np.power(hdrio.read_hdr(a), 2.2)
            if os.path.exists(r):
                self.gt_roughness = hdrio.read_hdr(r)[..., 0:1]
