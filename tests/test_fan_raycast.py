"""Fan tracer correctness vs the skip-link traversal."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.geometry.bvh import build_bvh
from texir_code_tpu.models.tracer_irt import bake_geometry_textures
from texir_code_tpu.ops.fan_raycast import FanScene, cast_ray_fans, cast_ray_fans_exact
from texir_code_tpu.ops.raycast import DeviceBVH, cast_rays_soa
from texir_code_tpu.ops.sampling import generate_dir_soa


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(atlas_res=32, subdiv=4)
    fb = build_bvh(scene.mesh.vertices, scene.mesh.faces)
    geom = bake_geometry_textures(scene.mesh, 24)
    vr, vc = np.nonzero(geom.valid)
    t_fans, r = 64, 128
    P = geom.position[vr, vc][:t_fans]
    N = geom.normal[vr, vc][:t_fans]
    nrm = tuple(jnp.asarray(N[:, k]) for k in range(3))
    dirs = generate_dir_soa(nrm, r, jax.random.PRNGKey(0), mode="uniform")
    origins = tuple(jnp.asarray(P[:, k] + 1e-2 * N[:, k]) for k in range(3))
    return fb, origins, dirs


def _expand(origins, r):
    return tuple(jnp.broadcast_to(o[:, None], (o.shape[0], r)) for o in origins)


def test_fan_matches_traversal_full_budget(setup):
    fb, origins, dirs = setup
    fs = FanScene.from_flat(fb)
    got = cast_ray_fans(fs, origins, dirs, t_min=1e-4, max_leaves=fs.num_leaves)
    want = cast_rays_soa(
        DeviceBVH.from_flat(fb), _expand(origins, dirs[0].shape[1]), dirs, t_min=1e-4
    )
    gt, wt = np.asarray(got.t), np.asarray(want.t)
    finite = np.isfinite(wt)
    assert (np.isfinite(gt) == finite).all()
    np.testing.assert_allclose(gt[finite], wt[finite], rtol=5e-4, atol=1e-4)
    same = np.asarray(got.prim) == np.asarray(want.prim)
    assert same[finite].mean() > 0.999
    sel = finite & same
    np.testing.assert_allclose(np.asarray(got.u)[sel], np.asarray(want.u)[sel], atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.v)[sel], np.asarray(want.v)[sel], atol=2e-4)


def test_fan_exact_fallback_with_tiny_budget(setup):
    """With an absurdly small K most fans overflow; the exact wrapper must
    still produce the right answer."""
    fb, origins, dirs = setup
    fs = FanScene.from_flat(fb)
    got = cast_ray_fans_exact(
        fs, DeviceBVH.from_flat(fb), origins, dirs, t_min=1e-4, max_leaves=4
    )
    want = cast_rays_soa(
        DeviceBVH.from_flat(fb), _expand(origins, dirs[0].shape[1]), dirs, t_min=1e-4
    )
    finite = np.isfinite(np.asarray(want.t))
    np.testing.assert_allclose(
        np.asarray(got.t)[finite], np.asarray(want.t)[finite], rtol=5e-4, atol=1e-4
    )


def test_fan_overflow_flags(setup):
    fb, origins, dirs = setup
    fs = FanScene.from_flat(fb)
    _, over = cast_ray_fans(
        fs, origins, dirs, max_leaves=2, return_overflow=True
    )
    assert np.asarray(over).any()
    _, over2 = cast_ray_fans(
        fs, origins, dirs, max_leaves=fs.num_leaves, return_overflow=True
    )
    assert not np.asarray(over2).any()
