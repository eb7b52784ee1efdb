"""Pallas fan kernel (interpret mode on CPU) vs the XLA exhaustive stream."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.geometry.bvh import build_bvh
from texir_code_tpu.models.tracer_irt import bake_geometry_textures
from texir_code_tpu.ops.fan_raycast import FanScene, cast_ray_fans
from texir_code_tpu.ops.pallas_fan import cast_ray_fans_pallas
from texir_code_tpu.ops.sampling import generate_dir_soa


def test_pallas_fan_matches_xla_stream():
    scene = make_scene(atlas_res=32, subdiv=2)
    fs = FanScene.from_flat(build_bvh(scene.mesh.vertices, scene.mesh.faces))
    geom = bake_geometry_textures(scene.mesh, 16)
    vr, vc = np.nonzero(geom.valid)
    t_fans, r = 16, 128
    P = geom.position[vr, vc][:t_fans]
    N = geom.normal[vr, vc][:t_fans]
    nrm = tuple(jnp.asarray(N[:, k]) for k in range(3))
    dirs = generate_dir_soa(nrm, r, jax.random.PRNGKey(0), mode="uniform")
    origins = tuple(jnp.asarray(P[:, k] + 1e-2 * N[:, k]) for k in range(3))

    want = cast_ray_fans(fs, origins, dirs, t_min=1e-4, max_leaves=fs.num_leaves)
    got = cast_ray_fans_pallas(fs, origins, dirs, t_min=1e-4, interpret=True)
    wt, gt = np.asarray(want.t), np.asarray(got.t)
    finite = np.isfinite(wt)
    assert (np.isfinite(gt) == finite).all()
    np.testing.assert_allclose(gt[finite], wt[finite], rtol=1e-4, atol=1e-4)
    assert (np.asarray(got.prim) == np.asarray(want.prim)).all()
    np.testing.assert_allclose(
        np.asarray(got.u)[finite], np.asarray(want.u)[finite], atol=2e-4
    )


def test_pallas_fan_padding_paths():
    """Non-multiple fan counts and leaf counts pad correctly."""
    scene = make_scene(atlas_res=32, subdiv=2)
    fs = FanScene.from_flat(build_bvh(scene.mesh.vertices, scene.mesh.faces))
    geom = bake_geometry_textures(scene.mesh, 16)
    vr, vc = np.nonzero(geom.valid)
    t_fans, r = 11, 128  # 11 not a multiple of fan_block 8
    P = geom.position[vr, vc][:t_fans]
    N = geom.normal[vr, vc][:t_fans]
    nrm = tuple(jnp.asarray(N[:, k]) for k in range(3))
    dirs = generate_dir_soa(nrm, r, jax.random.PRNGKey(1), mode="uniform")
    origins = tuple(jnp.asarray(P[:, k] + 1e-2 * N[:, k]) for k in range(3))
    got = cast_ray_fans_pallas(fs, origins, dirs, t_min=1e-4, interpret=True,
                               leaf_block=16)
    assert got.t.shape == (11, 128)
    assert np.isfinite(np.asarray(got.t)).all()  # closed room
