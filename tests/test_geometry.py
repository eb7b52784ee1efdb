"""Mesh / OBJ / BVH-structure tests."""

import numpy as np
import pytest

from texir_code_tpu.geometry import Mesh, build_bvh, load_obj
from texir_code_tpu.geometry.obj import save_obj


def make_quad_mesh():
    """Unit quad in the xy plane at z=0, uv-mapped 1:1."""
    vertices = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    uv_faces = faces.copy()
    return Mesh(vertices=vertices, faces=faces, uvs=uvs, uv_faces=uv_faces)


def make_random_soup(rng, n=200, scale=1.0):
    """Random triangle soup in [0, scale]^3."""
    centers = rng.random((n, 3)) * scale
    offsets = rng.normal(size=(n, 3, 3)) * 0.05 * scale
    tris = centers[:, None, :] + offsets
    vertices = tris.reshape(-1, 3).astype(np.float32)
    faces = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return Mesh(vertices=vertices, faces=faces)


def test_mesh_basics():
    m = make_quad_mesh()
    assert m.num_faces == 2
    np.testing.assert_allclose(m.aabb(), [[0, 0, 0], [1, 1, 0]])
    np.testing.assert_allclose(m.face_areas(), [0.5, 0.5])
    np.testing.assert_allclose(m.face_normals(), [[0, 0, 1], [0, 0, 1]])
    vn = m.compute_vertex_normals()
    np.testing.assert_allclose(vn, np.tile([[0, 0, 1]], (4, 1)), atol=1e-6)
    tuv = m.triangle_uvs()
    assert tuv.shape == (6, 2)
    np.testing.assert_allclose(tuv[0], [0, 0])


def test_surface_sampling(rng):
    m = make_quad_mesh()
    pts, nrm = m.sample_surface(4096, rng)
    assert pts.shape == (4096, 3)
    # uniform over the unit square
    assert 0 <= pts[:, 0].min() and pts[:, 0].max() <= 1
    np.testing.assert_allclose(pts[:, :2].mean(axis=0), [0.5, 0.5], atol=0.03)
    np.testing.assert_allclose(pts[:, 2], 0, atol=1e-6)
    np.testing.assert_allclose(nrm, np.tile([[0, 0, 1]], (4096, 1)), atol=1e-5)


def test_obj_roundtrip(tmp_path):
    m = make_quad_mesh()
    p = str(tmp_path / "quad.obj")
    save_obj(p, m)
    m2 = load_obj(p)
    np.testing.assert_allclose(m2.vertices, m.vertices)
    np.testing.assert_array_equal(m2.faces, m.faces)
    np.testing.assert_allclose(m2.uvs, m.uvs)
    np.testing.assert_array_equal(m2.uv_faces, m.uv_faces)


def test_obj_polygons_and_negative_indices(tmp_path):
    p = tmp_path / "poly.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"          # quad -> 2 triangles
        "f -4 -3 -2\n"         # negative indices
    )
    m = load_obj(str(p))
    assert m.num_faces == 3
    np.testing.assert_array_equal(m.faces[0], [0, 1, 2])
    np.testing.assert_array_equal(m.faces[1], [0, 2, 3])
    np.testing.assert_array_equal(m.faces[2], [0, 1, 2])


def test_obj_material_groups(tmp_path):
    p = tmp_path / "mat.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "usemtl a\nf 1 2 3\nusemtl b\nf 1 3 4\n"
    )
    m = load_obj(str(p), split_materials=True)
    assert m.material_ids.tolist() == [1, 2]
    assert m.material_names == ["default", "a", "b"]


def _validate_bvh(bvh, mesh):
    """Structural invariants: every original face appears exactly once in the
    packed leaves; every node's AABB contains its leaf triangles."""
    prims = bvh.tri_prim[bvh.tri_prim >= 0]
    assert sorted(prims.tolist()) == list(range(mesh.num_faces))
    tri = mesh.triangle_corners()
    for nid in range(bvh.num_nodes):
        if bvh.leaf_count[nid] == 0:
            continue
        s, c = bvh.leaf_start[nid], bvh.leaf_count[nid]
        ids = bvh.tri_prim[s : s + c]
        t = tri[ids]
        assert (t.min(axis=(0, 1)) >= bvh.aabb_min[nid] - 1e-5).all()
        assert (t.max(axis=(0, 1)) <= bvh.aabb_max[nid] + 1e-5).all()


def test_bvh_build_quad():
    m = make_quad_mesh()
    bvh = build_bvh(m.vertices, m.faces, leaf_width=4)
    _validate_bvh(bvh, m)
    assert bvh.miss[0] == -1  # root's miss terminates


def test_bvh_build_soup(rng):
    m = make_random_soup(rng, n=333)
    for leaf_width in (1, 4):
        bvh = build_bvh(m.vertices, m.faces, leaf_width=leaf_width)
        _validate_bvh(bvh, m)
        # skip links must be strictly forward (DFS order) or -1
        for nid in range(bvh.num_nodes):
            assert bvh.miss[nid] == -1 or bvh.miss[nid] > nid


def test_bvh_median_fallback(rng):
    """All-identical centroids force the median path; build must still work."""
    tri = np.tile(np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32), (20, 1, 1))
    vertices = tri.reshape(-1, 3)
    faces = np.arange(60, dtype=np.int32).reshape(20, 3)
    bvh = build_bvh(vertices, faces, leaf_width=4)
    prims = bvh.tri_prim[bvh.tri_prim >= 0]
    assert sorted(prims.tolist()) == list(range(20))
