"""Multi-device tests on the virtual 8-device CPU mesh: sharded bake equals
the single-device bake bit-for-bit; sharded Mat training step runs and
produces replicated, finite gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.models.tbl import build_tbl
from texir_code_tpu.models.tracer_irt import (
    IrradianceTextureBaker,
    bake_geometry_textures,
)
from texir_code_tpu.parallel.bake import ShardedIrradianceBaker
from texir_code_tpu.parallel.mesh import make_device_mesh, replicated, shard_along


def test_eight_cpu_devices_present():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def room_tbl():
    scene = make_scene(atlas_res=48)
    return scene, build_tbl(scene.mesh, scene.hdr_texture)


def test_sharded_bake_matches_single_device(room_tbl):
    scene, tbl = room_tbl
    geom = bake_geometry_textures(scene.mesh, 16)
    key = jax.random.PRNGKey(3)

    single = IrradianceTextureBaker(tbl, spp=64, texel_batch=64).bake(geom, key)
    sharded = ShardedIrradianceBaker(
        tbl, spp=64, texel_batch=64, mesh=make_device_mesh()
    ).bake(geom, key)
    np.testing.assert_array_equal(single, sharded)


def test_sharded_bake_batch_size_invariance(room_tbl):
    """Same result for different texel_batch sizes (RNG is per-texel)."""
    scene, tbl = room_tbl
    geom = bake_geometry_textures(scene.mesh, 16)
    key = jax.random.PRNGKey(4)
    a = IrradianceTextureBaker(tbl, spp=32, texel_batch=32).bake(geom, key)
    b = IrradianceTextureBaker(tbl, spp=32, texel_batch=128).bake(geom, key)
    np.testing.assert_array_equal(a, b)


def test_sharded_mat_train_step(room_tbl):
    """Full Mat train step jitted over the 8-device mesh with pixel-sharded
    rendering and replicated params; gradients must be finite and the step
    must actually update parameters."""
    import optax

    from texir_code_tpu.models.losses import render_loss
    from texir_code_tpu.models.material import (
        MaterialModel,
        clamp_material_params,
        init_material_params,
    )
    from texir_code_tpu.ops.gbuffer import cube_mvp

    scene, _ = room_tbl
    irt = np.full((16, 16, 3), 1.0, np.float32)
    model = MaterialModel(
        scene.mesh, scene.hdr_texture, irt, pano_res=(32, 64), sample_light=(8, 4)
    )
    mesh = make_device_mesh()
    params = init_material_params(16, 16)
    pos = jnp.asarray(scene.camera_positions(1)[0])
    ext = np.eye(4, dtype=np.float32)
    ext[0:3, 3] = np.asarray(pos)
    mvp = cube_mvp(jnp.asarray(ext))
    key = jax.random.PRNGKey(0)
    gt = jnp.ones((6, model.cube_res, model.cube_res, 3)) * 0.2
    seg_id = jnp.zeros((6, model.cube_res, model.cube_res), jnp.int32)
    ones = jnp.ones((6, model.cube_res, model.cube_res, 1))

    opt = optax.adam(3e-2)

    def train_step(p, opt_state):
        def loss_fn(pp):
            out = model._forward(pp, mvp, pos, key, stage=2)
            total, _ = render_loss(
                gt, out, ones, seg_id, 6, 2, seg_region=ones,
            )
            return total

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(grads, opt_state)
        p = optax.apply_updates(p, updates)
        return clamp_material_params(p), opt_state, loss

    rep = replicated(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt.init(params), rep)
    step = jax.jit(train_step, in_shardings=(rep, rep), out_shardings=(rep, rep, rep))
    p1, _, loss = step(params, opt_state)
    assert np.isfinite(float(loss))
    # params changed
    assert float(jnp.abs(p1.albedo - params.albedo).sum()) > 0
    # outputs replicated across all 8 devices
    assert len(p1.albedo.sharding.device_set) == 8
