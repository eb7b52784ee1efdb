"""G-buffer renderer tests: analytic quads, closed-room coverage, and MVP
unprojection consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from texir_code_tpu.geometry import Mesh, build_bvh
from texir_code_tpu.ops.gbuffer import (
    DeviceMesh,
    cube_face_w2c,
    cube_mvp,
    gl_projection,
    ray_dirs_from_mvp,
    render_gbuffer,
)
from texir_code_tpu.ops.raycast import DeviceBVH

from tests.test_geometry import make_quad_mesh
from tests.test_raycast import make_quad_mesh as _  # noqa: F401


def make_box_mesh(lo=0.0, hi=1.0, inward=True):
    """Closed axis-aligned box with per-face uvs covering [0,1]²."""
    lo3, hi3 = np.full(3, lo, np.float32), np.full(3, hi, np.float32)
    corners = np.array(
        [[x, y, z] for x in (lo3[0], hi3[0]) for y in (lo3[1], hi3[1]) for z in (lo3[2], hi3[2])],
        np.float32,
    )
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),
        (0, 4, 5, 1), (2, 3, 7, 6),
        (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    faces, uv_faces = [], []
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
        uv_faces += [[0, 1, 2], [0, 2, 3]]
    m = Mesh(
        vertices=corners,
        faces=np.asarray(faces, np.int32),
        uvs=uvs,
        uv_faces=np.asarray(uv_faces, np.int32),
    )
    if inward:
        m.orient_faces_toward((lo3 + hi3) / 2.0)
    m.compute_vertex_normals()
    return m


def identity_extrinsic(position):
    e = np.eye(4, dtype=np.float32)
    e[0:3, 3] = position
    return jnp.asarray(e)


def test_ray_dirs_front_face_center():
    """The center pixel of the front face looks along +z (the reference's
    front convention, datasets/dataset.py:543)."""
    ext = identity_extrinsic([0.0, 0.0, 0.0])
    mvp = cube_mvp(ext)
    res = 17  # odd -> center pixel on axis (with half-pixel offset ~0)
    dirs = np.asarray(ray_dirs_from_mvp(mvp, jnp.zeros(3), res))
    center = dirs[1, res // 2, res // 2]
    np.testing.assert_allclose(center, [0, 0, 1], atol=1e-3)
    # left face center looks along -x, right +x, back -z, top +y, bottom -y
    np.testing.assert_allclose(dirs[0, res // 2, res // 2], [-1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(dirs[2, res // 2, res // 2], [1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(dirs[3, res // 2, res // 2], [0, 0, -1], atol=1e-3)
    np.testing.assert_allclose(dirs[4, res // 2, res // 2], [0, 1, 0], atol=1e-3)
    np.testing.assert_allclose(dirs[5, res // 2, res // 2], [0, -1, 0], atol=1e-3)


def test_ray_dirs_cover_sphere_uniformly():
    """All 6 faces together tile the sphere: every direction within a face's
    90° frustum; adjacent-face boundaries meet."""
    ext = identity_extrinsic([0.0, 0.0, 0.0])
    mvp = cube_mvp(ext)
    res = 16
    dirs = np.asarray(ray_dirs_from_mvp(mvp, jnp.zeros(3), res)).reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    # mean direction of a full cube sampling ≈ 0
    assert np.abs(dirs.mean(axis=0)).max() < 0.02


def test_gbuffer_quad():
    m = make_quad_mesh()
    m.compute_vertex_normals()
    dm = DeviceMesh.from_mesh(m)
    bvh = DeviceBVH.from_flat(build_bvh(m.vertices, m.faces))
    # camera at quad center +z, front face looks at it
    cam = jnp.asarray([0.5, 0.5, 1.0])
    ext = identity_extrinsic([0.5, 0.5, 1.0])
    # quad is at z=0, camera front is +z → the BACK face (3) sees it
    mvp = cube_mvp(ext)
    g = render_gbuffer(dm, bvh, mvp, cam, 32)
    mask = np.asarray(g.mask)
    assert mask[3].mean() > 0.15  # quad covers part of the back face
    sel = mask[3, :, :, 0] > 0
    pos = np.asarray(g.position)[3][sel]
    np.testing.assert_allclose(pos[:, 2], 0.0, atol=1e-4)
    # uv equals xy for this quad's parametrization
    uv = np.asarray(g.uv)[3][sel]
    np.testing.assert_allclose(uv, pos[:, :2], atol=1e-4)
    nrm = np.asarray(g.normal)[3][sel]
    np.testing.assert_allclose(nrm, np.tile([[0, 0, 1]], (len(nrm), 1)), atol=1e-5)
    # background fill
    bgpos = np.asarray(g.position)[3][~sel]
    np.testing.assert_allclose(bgpos, np.tile([[1, 0, 0]], (len(bgpos), 1)), atol=1e-6)


def test_gbuffer_closed_box_full_coverage():
    m = make_box_mesh()
    dm = DeviceMesh.from_mesh(m)
    bvh = DeviceBVH.from_flat(build_bvh(m.vertices, m.faces))
    cam = jnp.asarray([0.4, 0.5, 0.6])
    mvp = cube_mvp(identity_extrinsic([0.4, 0.5, 0.6]))
    res = 24
    g = render_gbuffer(dm, bvh, mvp, cam, res)
    assert np.asarray(g.mask).min() == 1.0  # every pixel hits the closed box
    pos = np.asarray(g.position).reshape(-1, 3)
    # every hit lies on the box surface
    on_face = np.zeros(len(pos), bool)
    for axis in range(3):
        on_face |= np.abs(pos[:, axis]) < 1e-4
        on_face |= np.abs(pos[:, axis] - 1) < 1e-4
    assert on_face.all()
    # t equals geometric distance (dirs are unit)
    t = np.asarray(g.t).reshape(-1)
    dist = np.linalg.norm(pos - np.asarray(cam), axis=-1)
    np.testing.assert_allclose(t, dist, rtol=1e-4, atol=1e-4)


def test_cube_face_w2c_orthonormal():
    ext = identity_extrinsic([1.0, 2.0, 3.0])
    w2c = np.asarray(cube_face_w2c(ext))
    for f in range(6):
        r = w2c[f, :3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        # camera position maps to origin
        p = w2c[f] @ np.array([1.0, 2.0, 3.0, 1.0])
        np.testing.assert_allclose(p[:3], 0, atol=1e-5)


def test_gl_projection_matches_reference_formula():
    p = np.asarray(gl_projection(90.0, 1e-4, 100.0))
    f, n = 100.0, 1e-4
    np.testing.assert_allclose(p[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(p[2, 2], (f + n) / (f - n), atol=1e-6)
    np.testing.assert_allclose(p[2, 3], -(2 * f * n) / (f - n), atol=1e-6)
    np.testing.assert_allclose(p[3, 2], 1.0, atol=1e-6)
