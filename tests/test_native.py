"""Native C++ engines vs the numpy reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.geometry.bvh import build_bvh
from texir_code_tpu.models.tracer_irt import bake_geometry_textures
from texir_code_tpu.native import bake_geometry_native, build_bvh_native, load
from texir_code_tpu.ops.raycast import DeviceBVH, cast_rays

native_available = load() is not None
pytestmark = pytest.mark.skipif(not native_available, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def scene():
    return make_scene(atlas_res=48, subdiv=6)


def test_native_bvh_structure(scene):
    fb = build_bvh_native(scene.mesh.vertices, scene.mesh.faces)
    assert fb is not None
    prims = fb.tri_prim[fb.tri_prim >= 0]
    assert sorted(prims.tolist()) == list(range(scene.mesh.num_faces))
    # miss links strictly forward
    for nid in range(fb.num_nodes):
        assert fb.miss[nid] == -1 or fb.miss[nid] > nid
    # every leaf's triangles inside its AABB
    tri = scene.mesh.triangle_corners()
    for nid in range(fb.num_nodes):
        c = fb.leaf_count[nid]
        if c == 0:
            continue
        ids = fb.tri_prim[fb.leaf_start[nid] : fb.leaf_start[nid] + c]
        t = tri[ids]
        assert (t.min(axis=(0, 1)) >= fb.aabb_min[nid] - 1e-4).all()
        assert (t.max(axis=(0, 1)) <= fb.aabb_max[nid] + 1e-4).all()


def test_native_bvh_raycast_agrees_with_python_build(scene, rng):
    fb_py = build_bvh(scene.mesh.vertices, scene.mesh.faces, use_native=False)
    fb_cc = build_bvh_native(scene.mesh.vertices, scene.mesh.faces)
    o = (rng.random((512, 3)) * [3.0, 2.0, 4.0] + 0.5).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    h1 = cast_rays(DeviceBVH.from_flat(fb_py), jnp.asarray(o), jnp.asarray(d))
    h2 = cast_rays(DeviceBVH.from_flat(fb_cc), jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_allclose(
        np.asarray(h1.t), np.asarray(h2.t), rtol=1e-5, atol=1e-5
    )
    assert (np.asarray(h1.prim) == np.asarray(h2.prim)).mean() > 0.999


def test_native_geometry_bake_matches_python(scene):
    g_py = bake_geometry_textures(scene.mesh, 32, use_native=False)
    g_cc = bake_geometry_native(scene.mesh, 32)
    assert g_cc is not None
    # coverage identical
    np.testing.assert_array_equal(g_py.valid, g_cc.valid)
    sel = g_py.valid
    np.testing.assert_allclose(
        g_py.position[sel], g_cc.position[sel], atol=1e-4
    )
    np.testing.assert_allclose(g_py.normal[sel], g_cc.normal[sel], atol=1e-4)


def test_native_build_speed(scene):
    """The native builder exists for speed; sanity-check it runs quickly on a
    moderately sized mesh."""
    import time

    big = make_scene(atlas_res=32, subdiv=24)  # 6912 tris
    t0 = time.time()
    fb = build_bvh_native(big.mesh.vertices, big.mesh.faces)
    dt_native = time.time() - t0
    assert fb is not None
    assert dt_native < 2.0
