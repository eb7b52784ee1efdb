"""Render the synthetic scene into the reference's on-disk dataset layout.

Produces a complete fake "scan" dataset — HDR panos photographed with our own
renderer, masks, segmentation panos, extrinsics, mesh + atlas — so the full
pipeline (NIrF → IrT → Mat → eval) runs hermetically in the exact directory
structure the reference expects (see data/datasets.py).  Doubles as the demo
dataset generator and the test fixture.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from texir_code_tpu.data import hdrio
from texir_code_tpu.data.synthetic import SyntheticScene
from texir_code_tpu.geometry.obj import save_obj


def pano_dirs(h: int, w: int, rotation: Optional[np.ndarray] = None) -> np.ndarray:
    """[h, w, 3] equirect directions (θ over width ∈ [-π, π], φ over height
    ∈ [π/2, -π/2] — the Cube2Pano convention)."""
    theta, phi = np.meshgrid(
        np.linspace(-np.pi, np.pi, w, dtype=np.float32),
        np.linspace(0.5 * np.pi, -0.5 * np.pi, h, dtype=np.float32),
    )
    d = np.stack(
        [np.cos(phi) * np.sin(theta), np.sin(phi), np.cos(phi) * np.cos(theta)],
        axis=-1,
    )
    if rotation is not None:
        d = d @ np.asarray(rotation, np.float32).T
    return d.astype(np.float32)


def render_pano(tbl, cam_position, res: Tuple[int, int]) -> np.ndarray:
    """HDR "photograph": per-pixel TBL radiance along pano rays [h, w, 3]."""
    import jax.numpy as jnp

    from texir_code_tpu.models.tbl import query_tbl

    h, w = res
    d = pano_dirs(h, w).reshape(-1, 3)
    o = np.broadcast_to(np.asarray(cam_position, np.float32), d.shape)
    out = query_tbl(tbl, jnp.asarray(o.copy()), jnp.asarray(d), t_valid=1e-5)
    return np.asarray(out).reshape(h, w, 3)


def render_seg_pano(tbl, seg_texture: np.ndarray, cam_position, res) -> np.ndarray:
    """Per-pixel segmentation id pano via nearest atlas lookup at the hit."""
    import jax.numpy as jnp

    from texir_code_tpu.ops.raycast import cast_rays

    h, w = res
    d = pano_dirs(h, w).reshape(-1, 3)
    o = np.broadcast_to(np.asarray(cam_position, np.float32), d.shape)
    hit = cast_rays(tbl.bvh, jnp.asarray(o.copy()), jnp.asarray(d), t_min=1e-5)
    prim = np.asarray(hit.prim)
    u = np.clip(np.asarray(hit.u), 0, 1)
    v = np.clip(np.asarray(hit.v), 0, 1)
    uv_u = np.asarray(tbl.uv_u)
    uv_v = np.asarray(tbl.uv_v)
    p = np.maximum(prim, 0)
    uu = uv_u[p * 3] * (1 - u - v) + uv_u[p * 3 + 1] * u + uv_u[p * 3 + 2] * v
    vv = uv_v[p * 3] * (1 - u - v) + uv_v[p * 3 + 1] * u + uv_v[p * 3 + 2] * v
    r = seg_texture.shape[0]
    rows = np.clip((vv * r).astype(int), 0, r - 1)
    cols = np.clip((uu * seg_texture.shape[1]).astype(int), 0, seg_texture.shape[1] - 1)
    seg = seg_texture[rows, cols].astype(np.float32)
    seg[prim < 0] = 0
    return seg.reshape(h, w)


def export_reference_layout(
    scene: SyntheticScene,
    out_dir: str,
    n_views: int = 4,
    pano_res: Tuple[int, int] = (128, 256),
    with_gt: bool = True,
) -> str:
    """Write the reference dataset layout; returns path_mesh (out1.obj)."""
    from texir_code_tpu.models.tbl import build_tbl

    root = out_dir
    mesh_dir = os.path.join(root, "mesh")
    for sub in ("info", "derived", "hdr", "mesh"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    path_mesh = os.path.join(mesh_dir, "out1.obj")
    save_obj(path_mesh, scene.mesh)
    # texture files live next to the mesh, v-up flipped back to image order
    hdrio.write_hdr(
        os.path.join(mesh_dir, "hdr_texture.hdr"), scene.hdr_texture, flip=True
    )

    tbl = build_tbl(scene.mesh, scene.hdr_texture)
    cams = scene.camera_positions(n_views)
    ids = [f"view{i:03d}" for i in range(n_views)]

    with open(os.path.join(root, "info", "aligned.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    with open(os.path.join(root, "info", "final_extrinsics.txt"), "w") as f:
        f.write(f"{n_views} views\n")
        for c in cams:
            e = np.eye(4, dtype=np.float32)
            e[0:3, 3] = c
            for row in e:
                f.write(" ".join(f"{x:.6f}" for x in row) + "\n")

    h, w = pano_res
    for vid, cam in zip(ids, cams):
        os.makedirs(os.path.join(root, "derived", vid), exist_ok=True)
        os.makedirs(os.path.join(root, "hdr", vid), exist_ok=True)
        color = render_pano(tbl, cam, pano_res)
        hdrio.write_hdr(os.path.join(root, "hdr", vid, "ccm.hdr"), color)
        # LDR preview with full-opacity alpha mask
        ldr = (hdrio.tonemap_to_ldr(color) * 255).astype(np.uint8)
        rgba = np.concatenate(
            [ldr, np.full((h, w, 1), 255, np.uint8)], axis=-1
        )
        import cv2

        cv2.imwrite(
            os.path.join(root, "derived", vid, "panoImage_orig.jpg"),
            np.ascontiguousarray(ldr[:, :, ::-1]),
        )
        # jpg drops alpha; the dataset treats missing alpha as full coverage
        seg = render_seg_pano(tbl, scene.seg_texture, cam, pano_res)
        cv2.imwrite(
            os.path.join(root, "derived", vid, "panoImage_gray.png"),
            seg.astype(np.uint8),
        )

    if with_gt:
        gt_dir = os.path.join(root, "gt")
        os.makedirs(gt_dir, exist_ok=True)
        # store albedo in sRGB so the dataset's **2.2 roundtrips (dataset.py:849)
        hdrio.write_hdr(
            os.path.join(gt_dir, "albedo.hdr"),
            np.power(np.clip(scene.gt_albedo, 0, 1), 1 / 2.2),
        )
        hdrio.write_hdr(os.path.join(gt_dir, "roughness.hdr"), scene.gt_roughness)
    return path_mesh
