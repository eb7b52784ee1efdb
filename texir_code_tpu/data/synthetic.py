"""Synthetic indoor scene for tests, demos, and benchmarks.

The reference's pipelines are exercised on proprietary scan data (available
by email request only, reference README.md:22-33) plus OptixRenderer-made
synthetic scenes.  This module builds a self-contained equivalent — a
uv-atlased "cornell room" with an emissive ceiling lamp baked into the HDR
atlas (the TBL emitter) and known ground-truth materials — so every stage
(NIrF, IrT, Mat) and benchmark runs hermetically.

Atlas layout: a 3×2 grid of face charts with margins; face k occupies cell
(k%3, k//3).  Each wall's uv spans its cell interior, so the one atlas
serves the TBL emitter, the IrT bake target, and the material textures,
exactly like the reference's single-texture scan meshes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from texir_code_tpu.geometry.mesh import Mesh

# wall order: floor(-y), ceiling(+y), -z, +z, -x, +x
_WALL_NAMES = ("floor", "ceiling", "back", "front", "left", "right")


def _cell_uv(face_idx: int, margin: float = 0.02) -> np.ndarray:
    """[4, 2] uv corners of face chart `face_idx` in the 3×2 atlas grid."""
    cx, cy = face_idx % 3, face_idx // 3
    u0 = cx / 3.0 + margin
    u1 = (cx + 1) / 3.0 - margin
    v0 = cy / 2.0 + margin
    v1 = (cy + 1) / 2.0 - margin
    return np.array([[u0, v0], [u1, v0], [u1, v1], [u0, v1]], np.float32)


def make_room_mesh(
    size: Tuple[float, float, float] = (4.0, 3.0, 5.0),
    subdiv: int = 1,
) -> Mesh:
    """Closed box room, inward-facing normals, one chart per wall.

    Args:
        subdiv: tessellate each wall into subdiv×subdiv quads
            (12·subdiv² triangles total) — scan meshes are dense, so
            benchmarks use subdiv ≫ 1 to give the BVH realistic depth.
    """
    sx, sy, sz = size
    lo = np.array([0.0, 0.0, 0.0], np.float32)
    hi = np.array([sx, sy, sz], np.float32)

    def wall(corners):
        return np.asarray(corners, np.float32)

    # each wall: 4 corners counter-clockwise when seen from inside
    walls = [
        wall([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
              [hi[0], lo[1], hi[2]], [lo[0], lo[1], hi[2]]]),   # floor (+y normal)
        wall([[lo[0], hi[1], lo[2]], [lo[0], hi[1], hi[2]],
              [hi[0], hi[1], hi[2]], [hi[0], hi[1], lo[2]]]),   # ceiling (-y)
        wall([[lo[0], lo[1], lo[2]], [lo[0], hi[1], lo[2]],
              [hi[0], hi[1], lo[2]], [hi[0], lo[1], lo[2]]]),   # back z=0 (+z)
        wall([[lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
              [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]]),   # front z=sz (-z)
        wall([[lo[0], lo[1], lo[2]], [lo[0], lo[1], hi[2]],
              [lo[0], hi[1], hi[2]], [lo[0], hi[1], lo[2]]]),   # left x=0 (+x)
        wall([[hi[0], lo[1], lo[2]], [hi[0], hi[1], lo[2]],
              [hi[0], hi[1], hi[2]], [hi[0], lo[1], hi[2]]]),   # right (-x)
    ]

    vertices, faces, uvs, uv_faces = [], [], [], []
    for k, corners in enumerate(walls):
        uv4 = _cell_uv(k)
        # bilinear lattice over the wall and its uv chart
        n = subdiv
        for iy in range(n + 1):
            for ix in range(n + 1):
                s, t = ix / n, iy / n
                p = (
                    (1 - s) * (1 - t) * corners[0]
                    + s * (1 - t) * corners[1]
                    + s * t * corners[2]
                    + (1 - s) * t * corners[3]
                )
                q = (
                    (1 - s) * (1 - t) * uv4[0]
                    + s * (1 - t) * uv4[1]
                    + s * t * uv4[2]
                    + (1 - s) * t * uv4[3]
                )
                vertices.append(p.astype(np.float32))
                uvs.append(q.astype(np.float32))
        base = len(vertices) - (n + 1) * (n + 1)
        ubase = len(uvs) - (n + 1) * (n + 1)
        for iy in range(n):
            for ix in range(n):
                a = base + iy * (n + 1) + ix
                b = a + 1
                c = a + (n + 1) + 1
                d = a + (n + 1)
                ua, ub, uc, ud = (
                    ubase + iy * (n + 1) + ix,
                    ubase + iy * (n + 1) + ix + 1,
                    ubase + (iy + 1) * (n + 1) + ix + 1,
                    ubase + (iy + 1) * (n + 1) + ix,
                )
                faces.append([a, b, c])
                faces.append([a, c, d])
                uv_faces.append([ua, ub, uc])
                uv_faces.append([ua, uc, ud])

    mesh = Mesh(
        vertices=np.asarray(vertices, np.float32),
        faces=np.asarray(faces, np.int32),
        uvs=np.asarray(uvs, np.float32),
        uv_faces=np.asarray(uv_faces, np.int32),
    )
    # scan meshes of rooms are inward-facing; shading offsets p+ε·n assume it
    mesh.orient_faces_toward((lo + hi) / 2.0)
    mesh.compute_vertex_normals()
    return mesh


def _chart_slice(face_idx: int, res: int) -> Tuple[slice, slice]:
    """Texture rows/cols of face chart `face_idx` (v-up row order: row index
    grows with v)."""
    cx, cy = face_idx % 3, face_idx // 3
    rows = slice(cy * res // 2, (cy + 1) * res // 2)
    cols = slice(cx * res // 3, (cx + 1) * res // 3)
    return rows, cols


@dataclasses.dataclass
class SyntheticScene:
    mesh: Mesh
    hdr_texture: np.ndarray      # [R, R, 3] emitter atlas (TBL)
    gt_albedo: np.ndarray        # [R, R, 3] ground-truth albedo
    gt_roughness: np.ndarray     # [R, R, 1]
    seg_texture: np.ndarray      # [R, R] int32 per-texel seg class (=wall id)
    lamp_radiance: float
    size: Tuple[float, float, float]

    def camera_positions(self, n: int = 4) -> np.ndarray:
        """n interior camera positions on a ring."""
        sx, sy, sz = self.size
        t = np.linspace(0, 2 * np.pi, n, endpoint=False)
        return np.stack(
            [
                sx / 2 + 0.25 * sx * np.cos(t),
                np.full_like(t, sy * 0.5),
                sz / 2 + 0.25 * sz * np.sin(t),
            ],
            axis=-1,
        ).astype(np.float32)


def make_scene(
    atlas_res: int = 96,
    lamp_radiance: float = 20.0,
    size: Tuple[float, float, float] = (4.0, 3.0, 5.0),
    seed: int = 666,
    subdiv: int = 1,
) -> SyntheticScene:
    """Build the synthetic room.

    The HDR atlas approximates an already-lit scan: walls carry moderate
    radiosity values per wall color; the ceiling chart contains a small very
    bright lamp patch (the only texels above the VHL threshold).
    """
    rng = np.random.default_rng(seed)
    mesh = make_room_mesh(size, subdiv=subdiv)

    wall_colors = np.array(
        [
            [0.60, 0.55, 0.50],  # floor
            [0.85, 0.85, 0.85],  # ceiling
            [0.70, 0.30, 0.30],  # back (red-ish)
            [0.30, 0.70, 0.35],  # front (green-ish)
            [0.75, 0.75, 0.45],  # left
            [0.45, 0.55, 0.80],  # right
        ],
        np.float32,
    )
    wall_rough = np.array([0.5, 0.7, 0.35, 0.6, 0.25, 0.45], np.float32)

    r = atlas_res
    hdr = np.zeros((r, r, 3), np.float32)
    gt_albedo = np.zeros((r, r, 3), np.float32)
    gt_rough = np.full((r, r, 1), 0.5, np.float32)
    seg = np.zeros((r, r), np.int32)
    for k in range(6):
        rows, cols = _chart_slice(k, r)
        # mild spatial variation so texture gradients are informative
        noise = 1.0 + 0.1 * rng.standard_normal((rows.stop - rows.start,
                                                 cols.stop - cols.start, 1))
        hdr[rows, cols] = wall_colors[k] * 0.3 * noise
        gt_albedo[rows, cols] = wall_colors[k]
        gt_rough[rows, cols] = wall_rough[k]
        seg[rows, cols] = k

    # lamp: central patch of the ceiling chart (face 1)
    rows, cols = _chart_slice(1, r)
    h0 = (rows.start + rows.stop) // 2
    w0 = (cols.start + cols.stop) // 2
    lamp = (slice(h0 - r // 24, h0 + r // 24), slice(w0 - r // 24, w0 + r // 24))
    hdr[lamp[0], lamp[1]] = lamp_radiance

    return SyntheticScene(
        mesh=mesh,
        hdr_texture=hdr,
        gt_albedo=gt_albedo,
        gt_roughness=gt_rough,
        seg_texture=seg,
        lamp_radiance=lamp_radiance,
        size=size,
    )
