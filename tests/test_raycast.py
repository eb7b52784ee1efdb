"""Ray-caster correctness: BVH traversal vs brute force vs analytic hits."""

import numpy as np
import pytest

import jax.numpy as jnp

from texir_code_tpu.geometry import Mesh, build_bvh
from texir_code_tpu.ops.raycast import DeviceBVH, cast_rays, cast_rays_brute

from tests.test_geometry import make_quad_mesh, make_random_soup


def _device_bvh(mesh, leaf_width=4):
    return DeviceBVH.from_flat(build_bvh(mesh.vertices, mesh.faces, leaf_width=leaf_width))


def test_analytic_quad_hit():
    m = make_quad_mesh()
    bvh = _device_bvh(m)
    origins = jnp.asarray([[0.25, 0.25, 1.0], [0.75, 0.25, 2.0], [2.0, 2.0, 1.0]], jnp.float32)
    dirs = jnp.asarray([[0, 0, -1.0]] * 3, jnp.float32)
    hit = cast_rays(bvh, origins, dirs)
    t = np.asarray(hit.t)
    prim = np.asarray(hit.prim)
    np.testing.assert_allclose(t[:2], [1.0, 2.0], atol=1e-5)
    assert np.isinf(t[2]) and prim[2] == -1
    # barycentric reconstruction: hit point = (1-u-v)p0 + u p1 + v p2
    tri = m.triangle_corners()[prim[0]]
    u, v = np.asarray(hit.u)[0], np.asarray(hit.v)[0]
    p = (1 - u - v) * tri[0] + u * tri[1] + v * tri[2]
    np.testing.assert_allclose(p, [0.25, 0.25, 0.0], atol=1e-5)


def test_unnormalized_dirs_scale_t():
    """Open3D's t is in units of |dir|; ours must match."""
    m = make_quad_mesh()
    bvh = _device_bvh(m)
    o = jnp.asarray([[0.5, 0.5, 1.0]], jnp.float32)
    hit1 = cast_rays(bvh, o, jnp.asarray([[0, 0, -1.0]], jnp.float32))
    hit2 = cast_rays(bvh, o, jnp.asarray([[0, 0, -2.0]], jnp.float32))
    np.testing.assert_allclose(np.asarray(hit1.t), [1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hit2.t), [0.5], atol=1e-6)


def test_backface_hits_reported():
    """No backface culling (Embree default)."""
    m = make_quad_mesh()
    bvh = _device_bvh(m)
    o = jnp.asarray([[0.5, 0.5, -1.0]], jnp.float32)  # behind the quad
    hit = cast_rays(bvh, o, jnp.asarray([[0, 0, 1.0]], jnp.float32))
    np.testing.assert_allclose(np.asarray(hit.t), [1.0], atol=1e-5)


@pytest.mark.parametrize("leaf_width", [1, 4])
def test_bvh_matches_brute_force_soup(rng, leaf_width):
    m = make_random_soup(rng, n=257)
    bvh = _device_bvh(m, leaf_width=leaf_width)
    nrays = 512
    origins = jnp.asarray(rng.random((nrays, 3)) * 2 - 0.5, jnp.float32)
    d = rng.normal(size=(nrays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)

    got = cast_rays(bvh, origins, dirs)
    want = cast_rays_brute(
        jnp.asarray(m.vertices), jnp.asarray(m.faces), origins, dirs
    )

    gt, wt = np.asarray(got.t), np.asarray(want.t)
    finite = np.isfinite(wt)
    assert (np.isfinite(gt) == finite).all()
    np.testing.assert_allclose(gt[finite], wt[finite], rtol=1e-4, atol=1e-5)
    # prim ids can differ only where two triangles are coincident at t;
    # require equality where the brute-force t is strictly best
    same = np.asarray(got.prim) == np.asarray(want.prim)
    assert same[finite].mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(got.u)[same & finite], np.asarray(want.u)[same & finite], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.v)[same & finite], np.asarray(want.v)[same & finite], atol=1e-4
    )


def test_closed_box_interior_rays(rng):
    """Rays from inside a closed box always hit; distances match geometry."""
    # 12-triangle unit box
    corners = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.float32
    )
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),  # x faces
        (0, 4, 5, 1), (2, 3, 7, 6),  # y faces
        (0, 2, 6, 4), (1, 5, 7, 3),  # z faces
    ]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    m = Mesh(vertices=corners, faces=np.asarray(faces, np.int32))
    bvh = _device_bvh(m)

    nrays = 256
    origins = jnp.asarray(rng.random((nrays, 3)) * 0.8 + 0.1, jnp.float32)
    d = rng.normal(size=(nrays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)
    hit = cast_rays(bvh, origins, dirs)
    t = np.asarray(hit.t)
    assert np.isfinite(t).all()
    want = cast_rays_brute(jnp.asarray(m.vertices), jnp.asarray(m.faces), origins, dirs)
    np.testing.assert_allclose(t, np.asarray(want.t), rtol=1e-4, atol=1e-5)


def test_t_min_filters_self_hits():
    m = make_quad_mesh()
    bvh = _device_bvh(m)
    # origin exactly on the surface, shooting away then back
    o = jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32)
    hit = cast_rays(bvh, o, jnp.asarray([[0, 0, -1.0]], jnp.float32), t_min=1e-4)
    assert np.isinf(np.asarray(hit.t))[0]
