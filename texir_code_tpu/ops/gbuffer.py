"""Primary visibility: ray-cast G-buffers for cube-face cameras.

Replaces nvdiffrast's rasterize/interpolate stage (reference
models/mat_nvdiffrast.py:119-126).  The reference detaches every G-buffer
(positions/normals, :149,179,182) and disables antialiasing (:124-125), so
primary visibility needs *forward* correctness only — and on TPU, casting one
ray per pixel through the same frustum is both simpler and faster than
emulating a hardware rasterizer: it reuses the BVH kernel, produces exact
per-pixel prim ids + barycentrics (what `dr.rasterize`'s rast_out carries),
and never touches the host.

Conventions:
  * `mvp` is the transposed (P @ W2C) per face, exactly what the reference's
    datasets emit (datasets/dataset.py:459-468): clip_row = vertex_row @ mvp.
  * Image row 0 = top of the face (the Pano2Cube face orientation); pixel
    centers at (j+0.5, i+0.5) map to NDC (x=+right, y=+up).
  * Background pixels get position (1,0,0) / normal (1,0,0) — the reference's
    fixed fill (models/mat_nvdiffrast.py:125).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from texir_code_tpu.ops.raycast import DeviceBVH, RayHit, cast_rays


@dataclasses.dataclass
class GBuffer:
    """Per-pixel geometry attributes for a stack of F faces at res×res."""

    position: jnp.ndarray  # [F, H, W, 3] world-space hit points
    normal: jnp.ndarray    # [F, H, W, 3] interpolated shading normals
    uv: jnp.ndarray        # [F, H, W, 2] texture coordinates
    prim: jnp.ndarray      # [F, H, W]    face index, -1 on background
    mask: jnp.ndarray      # [F, H, W, 1] 1.0 where geometry was hit
    t: jnp.ndarray         # [F, H, W]    hit distance


jax.tree_util.register_pytree_node(
    GBuffer,
    lambda g: ((g.position, g.normal, g.uv, g.prim, g.mask, g.t), None),
    lambda _, l: GBuffer(*l),
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceMesh:
    """Mesh attribute arrays needed for G-buffer interpolation, on device."""

    vertices: jnp.ndarray       # [V, 3]
    faces: jnp.ndarray          # [F, 3] int32
    vertex_normals: jnp.ndarray # [V, 3]
    triangle_uvs: jnp.ndarray   # [F*3, 2] per-corner uvs (o3d layout)

    def tree_flatten(self):
        return (self.vertices, self.faces, self.vertex_normals, self.triangle_uvs), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @classmethod
    def from_mesh(cls, mesh) -> "DeviceMesh":
        vn = mesh.vertex_normals
        if vn is None:
            vn = mesh.compute_vertex_normals()
        return cls(
            vertices=jnp.asarray(mesh.vertices),
            faces=jnp.asarray(mesh.faces, jnp.int32),
            vertex_normals=jnp.asarray(vn),
            triangle_uvs=jnp.asarray(mesh.triangle_uvs()),
        )


def pixel_ndc_grid(res: int, dtype=jnp.float32):
    """NDC (x, y) at pixel centers; row 0 = top (y=+1 side)."""
    xs = (jnp.arange(res, dtype=dtype) + 0.5) / res * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(res, dtype=dtype) + 0.5) / res * 2.0
    x, y = jnp.meshgrid(xs, ys, indexing="xy")  # [res(r), res(c)]
    return x, y


def ray_dirs_from_mvp(
    mvp: jnp.ndarray, cam_position: jnp.ndarray, res: int
) -> jnp.ndarray:
    """Per-pixel world-space ray directions for each face's MVP.

    Unprojects the pixel NDC through inv(mvp) (row-vector convention, see
    module docstring) and takes the direction from the camera position.

    The direction is built WITHOUT inverting the MVP: a world direction d
    projects to pixel (x, y) iff d·(col0 - x·col3) = 0 and
    d·(col1 - y·col3) = 0 (cols of the MVP's linear 3x4 block; row-vector
    convention clip = world·mvp, so homogeneous x = clip0/clip3).  The ray
    direction is the cross product of those two plane normals, oriented to
    positive clip w.  The previous formulation — unproject (x, y, 1, 1)
    through inv(mvp) and dehomogenize — is catastrophically ill-conditioned:
    w is the cancellation of ~1e4-magnitude inverse entries (near/far ratio
    conditions the inverse), which cost 3e-3 direction error on CPU and
    underflowed to w=0 → NaN dirs on TPU.  The cross form is exact linear
    fp32 (5e-8 vs an f64 oracle) and cheaper.

    Args:
        mvp: [F, 4, 4] transposed projection·view matrices.
        cam_position: [3] (unused; kept for call-site compatibility).
        res: face resolution.
    Returns:
        [F, res, res, 3] unit directions.
    """
    del cam_position
    x, y = pixel_ndc_grid(res)
    a = mvp[:, :3, :]                               # [F, 3(world), 4(clip)]
    a0 = a[:, None, None, :, 0]
    a1 = a[:, None, None, :, 1]
    a3 = a[:, None, None, :, 3]
    u = a0 - x[None, :, :, None] * a3               # plane of pixel column
    v = a1 - y[None, :, :, None] * a3               # plane of pixel row
    d = jnp.cross(u, v)
    w = jnp.sum(d * a3, axis=-1, keepdims=True)     # clip w of direction
    d = d * jnp.sign(w)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def interpolate_attributes(
    mesh: DeviceMesh, hit: RayHit
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Barycentric interpolation of position / normal / uv at hit points.

    Matches dr.interpolate over [position, normal] features
    (reference models/mat_nvdiffrast.py:122-123) and the uv interpolation
    rule index0·(1-u-v) + index1·u + index2·v used throughout the reference
    (e.g. models/mat_nvdiffrast.py:311).
    """
    prim_safe = jnp.maximum(hit.prim, 0)
    tri = jnp.take(mesh.faces, prim_safe, axis=0)            # [B, 3]
    w0 = (1.0 - hit.u - hit.v)[..., None]
    w1 = hit.u[..., None]
    w2 = hit.v[..., None]

    v0 = jnp.take(mesh.vertices, tri[..., 0], axis=0)
    v1 = jnp.take(mesh.vertices, tri[..., 1], axis=0)
    v2 = jnp.take(mesh.vertices, tri[..., 2], axis=0)
    position = v0 * w0 + v1 * w1 + v2 * w2

    n0 = jnp.take(mesh.vertex_normals, tri[..., 0], axis=0)
    n1 = jnp.take(mesh.vertex_normals, tri[..., 1], axis=0)
    n2 = jnp.take(mesh.vertex_normals, tri[..., 2], axis=0)
    normal = n0 * w0 + n1 * w1 + n2 * w2
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )

    base = prim_safe * 3
    t0 = jnp.take(mesh.triangle_uvs, base, axis=0)
    t1 = jnp.take(mesh.triangle_uvs, base + 1, axis=0)
    t2 = jnp.take(mesh.triangle_uvs, base + 2, axis=0)
    uv = t0 * w0 + t1 * w1 + t2 * w2
    return position, normal, uv


@partial(jax.jit, static_argnames=("res", "fan_block", "exit_rows",
                                   "row_width"))
def render_gbuffer(
    mesh: DeviceMesh,
    bvh: DeviceBVH,
    mvp: jnp.ndarray,
    cam_position: jnp.ndarray,
    res: int,
    fan_scene=None,
    cluster_scene=None,
    fan_block: int = 8,
    exit_rows: int = 0,
    row_width: int = 2048,
    proxy=None,
    occluders=None,
) -> GBuffer:
    """Render cube-face G-buffers by primary-ray casting.

    Args:
        mesh: DeviceMesh attribute arrays.
        bvh: DeviceBVH over the same mesh.
        mvp: [F, 4, 4] transposed MVPs (dataset convention).
        cam_position: [3].
        res: face resolution (reference cube_res = pano_w/4,
            models/mat_nvdiffrast.py:45).
        fan_scene: optional ops.fan_raycast.FanScene — the camera's pixels
            are one big shared-origin ray fan, so when given (and on TPU)
            primary visibility runs on the Pallas fan kernel.
        cluster_scene: optional ops.pallas_culled.ClusterScene — takes
            precedence over fan_scene: the culled kernel with shared-origin
            rows (pixel rows are raster-coherent direction cones, so the
            candidate lists are tight).
    """
    nfaces = mvp.shape[0]
    dirs = ray_dirs_from_mvp(mvp, cam_position, res)          # [F, r, r, 3]
    flat_dirs = dirs.reshape(-1, 3)
    n = flat_dirs.shape[0]
    if cluster_scene is not None and n % 128 == 0:
        from texir_code_tpu.ops.pallas_culled import cast_fans_culled
        from texir_code_tpu.ops.pallas_fan import resolve_interpret

        r_split = min(row_width, n)
        while n % r_split:
            r_split -= 128
        rows = n // r_split
        hit = cast_fans_culled(
            cluster_scene,
            tuple(jnp.broadcast_to(cam_position[k], (rows,)) for k in range(3)),
            tuple(flat_dirs[:, k].reshape(rows, r_split) for k in range(3)),
            t_min=1e-6,
            proxy=proxy,
            fan_block=fan_block,
            exit_rows=exit_rows,
            interpret=resolve_interpret(),
            occluders=occluders,
        )
        from texir_code_tpu.ops.raycast import RayHit

        hit = RayHit(
            t=hit.t.reshape(-1), prim=hit.prim.reshape(-1),
            u=hit.u.reshape(-1), v=hit.v.reshape(-1),
        )
    elif fan_scene is not None and n % 128 == 0:
        from texir_code_tpu.ops.pallas_fan import (
            cast_ray_fans_pallas,
            resolve_interpret,
        )

        r_split = min(2048, n)
        while n % r_split:
            r_split -= 128
        rows = n // r_split
        hit = cast_ray_fans_pallas(
            fan_scene,
            tuple(jnp.broadcast_to(cam_position[k], (rows,)) for k in range(3)),
            tuple(flat_dirs[:, k].reshape(rows, r_split) for k in range(3)),
            t_min=1e-6,
            interpret=resolve_interpret(),
        )
        from texir_code_tpu.ops.raycast import RayHit

        hit = RayHit(
            t=hit.t.reshape(-1), prim=hit.prim.reshape(-1),
            u=hit.u.reshape(-1), v=hit.v.reshape(-1),
        )
    else:
        origins = jnp.broadcast_to(cam_position, flat_dirs.shape)
        hit = cast_rays(bvh, origins, flat_dirs, t_min=1e-6)

    valid = hit.prim >= 0
    position, normal, uv = interpolate_attributes(mesh, hit)
    # reference background fill: position (1,0,0), normal (1,0,0)
    bg = jnp.array([1.0, 0.0, 0.0], position.dtype)
    position = jnp.where(valid[:, None], position, bg)
    normal = jnp.where(valid[:, None], normal, bg)
    uv = jnp.where(valid[:, None], uv, 0.0)

    shp = (nfaces, res, res)
    return GBuffer(
        position=position.reshape(shp + (3,)),
        normal=normal.reshape(shp + (3,)),
        uv=uv.reshape(shp + (2,)),
        prim=jnp.where(valid, hit.prim, -1).reshape(shp),
        mask=valid.astype(jnp.float32).reshape(shp + (1,)),
        t=hit.t.reshape(shp),
    )


def cube_face_w2c(extrinsic: jnp.ndarray) -> jnp.ndarray:
    """Six world→camera matrices for a cube rig at the given extrinsic.

    Reproduces the reference's face construction
    (datasets/dataset.py:419-459): face order matches Pano2Cube
    [left, front, right, back, top, bottom]; each face swaps the
    Right/Front/Up columns of the camera-to-world then inverts.

    Args:
        extrinsic: [4, 4] camera-to-world (columns: Right, Up, Front | pos).
    Returns:
        [6, 4, 4] world→camera matrices.
    """
    e = extrinsic
    right = e[0:3, 0]
    up_col = e[0:3, 1]
    front = e[0:3, 2]

    def compose(r, u, f):
        m = jnp.asarray(e)
        m = m.at[0:3, 0].set(r)
        m = m.at[0:3, 1].set(u)
        m = m.at[0:3, 2].set(f)
        return jnp.linalg.inv(m)

    # Note: the reference composes its top/bottom faces as (Right, ±Front,
    # ±cross(Right, Front)) (datasets/dataset.py:443-457 — its own comment:
    # "don't know how to explain this direction"), which matches its scan
    # pipeline's extrinsic handedness.  Here the rig is derived from the
    # Pano2Cube rotations directly so rendered faces line up with warped
    # ground-truth faces by construction for any right-handed y-up extrinsic.
    up = jnp.cross(front, right)
    faces = [
        compose(front, up_col, -right),   # 0 left
        jnp.linalg.inv(e),                # 1 front
        compose(-front, up_col, right),   # 2 right
        compose(-right, up_col, -front),  # 3 back
        compose(right, -front, up),       # 4 top (image-up = -front)
        compose(right, front, -up),       # 5 bottom (image-up = +front)
    ]
    return jnp.stack(faces, axis=0)


def gl_projection(fov_deg: float = 90.0, n: float = 1e-4, f: float = 100.0) -> jnp.ndarray:
    """The reference's +z-forward projection (datasets/dataset.py:544-549)."""
    t = 1.0 / jnp.tan(jnp.deg2rad(fov_deg) / 2.0)
    return jnp.asarray(
        [
            [t, 0.0, 0.0, 0.0],
            [0.0, t, 0.0, 0.0],
            [0.0, 0.0, (f + n) / (f - n), -(2 * f * n) / (f - n)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        jnp.float32,
    )


def cube_mvp(extrinsic: jnp.ndarray, fov_deg: float = 90.0) -> jnp.ndarray:
    """[6, 4, 4] transposed MVPs (the dataset item's `cam_to_world` key,
    reference datasets/dataset.py:461-468)."""
    w2c = cube_face_w2c(extrinsic)
    proj = gl_projection(fov_deg)
    mvp = jnp.einsum("jk,fkl->fjl", proj, w2c)
    return jnp.transpose(mvp, (0, 2, 1))
