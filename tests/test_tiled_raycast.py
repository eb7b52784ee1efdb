"""Tiled tracer correctness: exact agreement with the skip-link traversal
(and hence the brute-force oracle) on the synthetic room."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.geometry.bvh import build_bvh
from texir_code_tpu.ops.raycast import DeviceBVH, cast_rays_soa
from texir_code_tpu.ops.tiled_raycast import (
    TiledScene,
    cast_rays_tiled,
    required_leaf_budget,
)


@pytest.fixture(scope="module")
def room_rays(rng=None):
    rng = np.random.default_rng(1)
    scene = make_scene(atlas_res=32, subdiv=8)
    fb = build_bvh(scene.mesh.vertices, scene.mesh.faces)
    b = 4096
    o = (rng.random((b, 3)) * [3.0, 2.0, 4.0] + 0.5).astype(np.float32)
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    origins = tuple(jnp.asarray(o[:, k]) for k in range(3))
    dirs = tuple(jnp.asarray(d[:, k]) for k in range(3))
    return fb, origins, dirs


def test_tiled_matches_traversal(room_rays):
    fb, origins, dirs = room_rays
    ts = TiledScene.from_flat(fb)
    budget = required_leaf_budget(ts, origins, dirs, tile_size=256)
    assert budget <= ts.num_leaves

    got = cast_rays_tiled(
        ts, origins, dirs, tile_size=256, max_leaves=min(budget + 8, ts.num_leaves)
    )
    want = cast_rays_soa(DeviceBVH.from_flat(fb), origins, dirs)

    gt, wt = np.asarray(got.t), np.asarray(want.t)
    finite = np.isfinite(wt)
    assert (np.isfinite(gt) == finite).all()
    np.testing.assert_allclose(gt[finite], wt[finite], rtol=1e-4, atol=1e-5)
    same = np.asarray(got.prim) == np.asarray(want.prim)
    assert same[finite].mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(got.u)[finite & same], np.asarray(want.u)[finite & same], atol=1e-4
    )


def test_tiled_full_leaf_budget_is_exact(room_rays):
    """With max_leaves = L the tiled tracer is exhaustive regardless of
    culling quality."""
    fb, origins, dirs = room_rays
    ts = TiledScene.from_flat(fb)
    got = cast_rays_tiled(
        ts, origins, dirs, tile_size=256, max_leaves=ts.num_leaves
    )
    want = cast_rays_soa(DeviceBVH.from_flat(fb), origins, dirs)
    finite = np.isfinite(np.asarray(want.t))
    np.testing.assert_allclose(
        np.asarray(got.t)[finite], np.asarray(want.t)[finite], rtol=1e-4, atol=1e-5
    )


def test_tiled_no_sort_still_correct(room_rays):
    fb, origins, dirs = room_rays
    ts = TiledScene.from_flat(fb)
    got = cast_rays_tiled(
        ts, origins, dirs, tile_size=256, max_leaves=ts.num_leaves, sort_rays=False
    )
    want = cast_rays_soa(DeviceBVH.from_flat(fb), origins, dirs)
    finite = np.isfinite(np.asarray(want.t))
    np.testing.assert_allclose(
        np.asarray(got.t)[finite], np.asarray(want.t)[finite], rtol=1e-4, atol=1e-5
    )


def test_t_min_respected(room_rays):
    fb, origins, dirs = room_rays
    ts = TiledScene.from_flat(fb)
    # shooting from a wall: t_min filters the immediate self-hit
    o = (jnp.full((256,), 2.0), jnp.full((256,), 1.0), jnp.full((256,), 0.0))
    d = (jnp.zeros(256), jnp.zeros(256), jnp.ones(256))
    hit0 = cast_rays_tiled(ts, o, d, t_min=1e-4, tile_size=256,
                           max_leaves=ts.num_leaves)
    t = np.asarray(hit0.t)
    assert (t > 1.0).all()  # crosses the room to the far wall (z≈5)
