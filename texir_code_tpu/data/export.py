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


def render_pano_material(
    mesh,
    tbl,
    irt_texture: np.ndarray,
    gt_albedo: np.ndarray,
    gt_roughness: np.ndarray,
    cam_position,
    res: Tuple[int, int],
    spp: int = 256,
    seed: int = 0,
    fan_scene=None,
    cluster_scene=None,
    chunk: int = 16384,
) -> np.ndarray:
    """GT pano rendered through the forward material model.

    Diffuse = IrT·albedo/π, specular = GGX importance-sampled Cook-Torrance
    MC against the TBL — the same shading equations the Mat stages optimize
    through (reference models/mat_nvdiffrast.py:203-279), evaluated at the
    GT atlases with high spp.  The exported views then carry real
    view-dependent specular signal and (gt_albedo, gt_roughness) is by
    construction an optimum of the Mat inverse problem — matching the
    reference's synthetic data, which is path-traced from GT materials
    (its OptixRenderer stage); a plain radiance-texture pano (render_pano)
    is view-independent, so roughness would be unrecoverable from it.
    """
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.models.tbl import query_tbl_auto
    from texir_code_tpu.ops.gbuffer import DeviceMesh, interpolate_attributes
    from texir_code_tpu.ops.raycast import cast_rays_soa
    from texir_code_tpu.ops.sampling import generate_dir_soa, reflect_soa
    from texir_code_tpu.ops.shading import specular_estimator_soa
    from texir_code_tpu.ops.texture import bilinear_sample

    h, w = res
    dm = DeviceMesh.from_mesh(mesh)
    d_all = pano_dirs(h, w).reshape(-1, 3)
    n_all = d_all.shape[0]
    cam = jnp.asarray(np.asarray(cam_position, np.float32))
    alb_t = jnp.asarray(gt_albedo)
    rgh_t = jnp.asarray(gt_roughness)
    irt_t = jnp.asarray(irt_texture)

    @jax.jit
    def shade(dx, dy, dz, key):
        n = dx.shape[0]
        o = tuple(jnp.broadcast_to(cam[k], (n,)) for k in range(3))
        hit = cast_rays_soa(tbl.bvh, o, (dx, dy, dz), t_min=1e-5)
        valid = hit.prim >= 0
        position, normal, uv = interpolate_attributes(dm, hit)
        albedo = bilinear_sample(alb_t, uv)
        rough = bilinear_sample(rgh_t, uv)[:, 0]
        irr = bilinear_sample(irt_t, uv)
        diffuse = irr * albedo / np.pi

        # the trainers shade from position + 1e-2·normal (reference :151)
        pts = position + 1e-2 * normal
        view_v = cam[None, :] - pts
        view_v = view_v / jnp.maximum(
            jnp.linalg.norm(view_v, axis=-1, keepdims=True), 1e-4
        )
        n_soa = tuple(normal[:, k] for k in range(3))
        v_soa = tuple(view_v[:, k] for k in range(3))
        half = generate_dir_soa(
            n_soa, spp, key, mode="importance", roughness=rough,
            pre_mode="independent",
        )
        light_dirs, _ = reflect_soa(v_soa, half)
        spec_o = tuple(
            jnp.broadcast_to(pts[:, k:k + 1], (n, spp)) for k in range(3)
        )
        lighting = query_tbl_auto(
            tbl, fan_scene, spec_o, light_dirs,
            cluster_scene=cluster_scene,
        )
        spec = specular_estimator_soa(
            lighting, half, n_soa, v_soa, light_dirs, rough
        )
        rgb = diffuse + jnp.stack(spec, axis=-1) / spp
        return jnp.where(valid[:, None], rgb, 0.0)

    out = np.zeros((n_all, 3), np.float32)
    key = None
    import jax as _jax

    for i0 in range(0, n_all, chunk):
        sl = slice(i0, min(i0 + chunk, n_all))
        m = sl.stop - sl.start
        pad = (-m) % 128
        d = np.concatenate([d_all[sl], np.zeros((pad, 3), np.float32)])
        key = _jax.random.fold_in(_jax.random.PRNGKey(seed), i0)
        rgb = shade(
            jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
            key,
        )
        out[sl] = np.asarray(rgb)[:m]
    return out.reshape(h, w, 3)


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
    gt_render: str = "radiance",
    gt_spp: int = 256,
    irt_spp: int = 512,
    cameras=None,
) -> str:
    """Write the reference dataset layout; returns path_mesh (out1.obj).

    gt_render: 'radiance' — photos are plain TBL lookups (view-independent;
        fine for pipeline plumbing, but carries NO specular signal, so
        gt_roughness is unrecoverable from such data); 'material' — photos
        are rendered through the forward material model from the GT atlases
        (render_pano_material), the synthetic-data contract the reference's
        Mat-syn metrics assume (path-traced GT from GT materials)."""
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

    if scene.roomseg is not None:
        # reference roomseg assets (utils/general.py:115-125): occupancy-
        # grid meta "scale w h x_min z_min" + uchar room-id image, consumed
        # by the Mat trainer's per-(room × class) seg prior
        # (trainer/train_material.py:274-282, models/loss.py:286-293)
        import cv2

        rdir = os.path.join(root, "roomseg")
        os.makedirs(rdir, exist_ok=True)
        scale, w, h, x_min, z_min, room_img = scene.roomseg
        with open(os.path.join(rdir, "originOccupancyGrid_f0.meta"), "w") as f:
            f.write(f"{scale} {int(w)} {int(h)} {x_min} {z_min}\n")
        cv2.imwrite(
            os.path.join(rdir, "roomSegs_uchar_f0.png"),
            np.ascontiguousarray(room_img.astype(np.uint8)),
        )

    tbl = build_tbl(scene.mesh, scene.hdr_texture)
    # explicit cameras override the default ring (multi-room scenes place
    # one camera per room so every room is photographed)
    cams = (
        np.asarray(cameras, np.float32) if cameras is not None
        else scene.camera_positions(n_views)
    )
    n_views = len(cams)
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

    gt_irt = None
    fan_scene = cluster_scene = None
    if gt_render == "material":
        import jax as _jax

        from texir_code_tpu.models.tracer_irt import (
            IrradianceTextureBaker,
            bake_geometry_textures,
        )
        from texir_code_tpu.ops.postprocess import pad_texture

        if _jax.default_backend() != "cpu":
            from texir_code_tpu.geometry.bvh import build_bvh
            from texir_code_tpu.ops.fan_raycast import FanScene
            from texir_code_tpu.ops.pallas_culled import ClusterScene

            fb = build_bvh(scene.mesh.vertices, scene.mesh.faces)
            fan_scene = FanScene.from_flat(
                fb, triangle_uvs=scene.mesh.triangle_uvs()
            )
            cluster_scene = ClusterScene.from_fan(fan_scene, lb=4, dense=True)
        res_irt = scene.hdr_texture.shape[0]
        baker = IrradianceTextureBaker(
            tbl, spp=irt_spp, texel_batch=4096,
            fan_scene=fan_scene, cluster_scene=cluster_scene,
            max_leaves=fan_scene.num_leaves if fan_scene is not None else 768,
        )
        geom = bake_geometry_textures(scene.mesh, res_irt)
        gt_irt = pad_texture(
            baker.bake(geom, _jax.random.PRNGKey(7)), geom.valid
        )
        hdrio.write_hdr(
            os.path.join(mesh_dir, "gt_irt.hdr"), gt_irt, flip=True
        )

    h, w = pano_res
    for vid, cam in zip(ids, cams):
        os.makedirs(os.path.join(root, "derived", vid), exist_ok=True)
        os.makedirs(os.path.join(root, "hdr", vid), exist_ok=True)
        if gt_render == "material":
            color = render_pano_material(
                scene.mesh, tbl, gt_irt, scene.gt_albedo,
                scene.gt_roughness, cam, pano_res, spp=gt_spp,
                seed=int(vid[-3:]),
                fan_scene=fan_scene, cluster_scene=cluster_scene,
            )
        else:
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
