"""Triangle mesh container with the attributes the pipeline needs.

Replaces the mesh services the reference gets from Open3D + pyredner:

  * per-triangle uv corners (`triangle_uvs`) — reference
    models/mat_nvdiffrast.py:97 (``np.asarray(trianglemesh.triangle_uvs)``)
  * vertex normal computation — reference models/tracer_o3d_irrf.py:44
    (``trianglemesh.compute_vertex_normals()``)
  * AABB — reference datasets/dataset.py:62
  * uniform surface point sampling (per-epoch resampling for NIrF) —
    reference datasets/dataset.py:80-81 / models/tracer_o3d_irrf.py
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Mesh:
    """Indexed triangle mesh (host-side, numpy).

    Attributes:
        vertices: [V, 3] float32 positions.
        faces: [F, 3] int32 vertex indices.
        uvs: [U, 2] float32 texture coordinates (0..1, v-up convention of the
            source OBJ; texture row 0 = v=0 handling lives in ops.texture).
        uv_faces: [F, 3] int32 indices into `uvs` per face corner
            (pyredner's `uv_indices`).
        vertex_normals: [V, 3] float32 (computed on demand).
        material_ids: [F] int32 per-face material/object id (0 if single).
        material_names: material id → name.
    """

    vertices: np.ndarray
    faces: np.ndarray
    uvs: Optional[np.ndarray] = None
    uv_faces: Optional[np.ndarray] = None
    vertex_normals: Optional[np.ndarray] = None
    material_ids: Optional[np.ndarray] = None
    material_names: Optional[List[str]] = None

    # ------------------------------------------------------------------
    @property
    def num_vertices(self) -> int:
        return int(self.vertices.shape[0])

    @property
    def num_faces(self) -> int:
        return int(self.faces.shape[0])

    def triangle_corners(self) -> np.ndarray:
        """[F, 3, 3] triangle corner positions."""
        return self.vertices[self.faces]

    def triangle_uvs(self) -> np.ndarray:
        """[F*3, 2] per-corner uvs in face order (Open3D's triangle_uvs
        layout, which the reference indexes with prim_id*3+k at
        models/mat_nvdiffrast.py:307-310)."""
        if self.uvs is None or self.uv_faces is None:
            raise ValueError("mesh has no uv parametrization")
        return self.uvs[self.uv_faces.reshape(-1)]

    def face_normals(self, normalized: bool = True) -> np.ndarray:
        """[F, 3] geometric normals (right-handed winding)."""
        tri = self.triangle_corners()
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        if normalized:
            n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        return n.astype(np.float32)

    def compute_vertex_normals(self) -> np.ndarray:
        """Area-weighted vertex normals (Open3D's convention)."""
        tri = self.triangle_corners()
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])  # area-weighted
        vn = np.zeros_like(self.vertices)
        for k in range(3):
            np.add.at(vn, self.faces[:, k], fn)
        vn = vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
        self.vertex_normals = vn.astype(np.float32)
        return self.vertex_normals

    def aabb(self) -> np.ndarray:
        """[2, 3] axis-aligned bounding box (min, max)."""
        return np.stack(
            [self.vertices.min(axis=0), self.vertices.max(axis=0)]
        ).astype(np.float32)

    def face_areas(self) -> np.ndarray:
        tri = self.triangle_corners()
        return 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
        )

    def orient_faces_toward(self, point: np.ndarray) -> None:
        """Flip triangles so geometric normals face `point` (e.g. the room
        interior).  Scan meshes of rooms are inward-facing; shading offsets
        p+ε·n assume it."""
        tri = self.triangle_corners()
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        to_p = np.asarray(point)[None, :] - tri.mean(axis=1)
        flip = (n * to_p).sum(-1) < 0
        self.faces[flip] = self.faces[flip][:, [0, 2, 1]]
        if self.uv_faces is not None:
            self.uv_faces[flip] = self.uv_faces[flip][:, [0, 2, 1]]
        if self.vertex_normals is not None:
            self.compute_vertex_normals()

    def sample_surface(
        self, num_samples: int, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Uniform-by-area surface sampling.

        Replaces Open3D's `sample_points_uniformly` used for per-epoch NIrF
        point resampling (reference datasets/dataset.py:80-81).

        Returns:
            (points [S, 3], normals [S, 3]) float32; normals are
            interpolated vertex normals when available, else face normals.
        """
        areas = self.face_areas()
        probs = areas / areas.sum()
        face_idx = rng.choice(self.num_faces, size=num_samples, p=probs)
        u = rng.random(num_samples)
        v = rng.random(num_samples)
        flip = u + v > 1.0
        u = np.where(flip, 1.0 - u, u)
        v = np.where(flip, 1.0 - v, v)
        w = 1.0 - u - v
        tri = self.triangle_corners()[face_idx]
        pts = (
            tri[:, 0] * w[:, None] + tri[:, 1] * u[:, None] + tri[:, 2] * v[:, None]
        )
        if self.vertex_normals is not None:
            vn = self.vertex_normals[self.faces[face_idx]]
            nrm = vn[:, 0] * w[:, None] + vn[:, 1] * u[:, None] + vn[:, 2] * v[:, None]
            nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        else:
            nrm = self.face_normals()[face_idx]
        return pts.astype(np.float32), nrm.astype(np.float32)
