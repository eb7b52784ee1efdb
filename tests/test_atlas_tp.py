"""Atlas tensor parallelism: sharded pyramid sample == unsharded, fwd + grad.

The row-sharded sampler (parallel/atlas_tp.py) must reproduce
ops.texture.texture_sample exactly — including bilinear footprints that
straddle shard boundaries and wrap around row 0 — and its gradients must
land on the parameter shards identically to the unsharded scatter-add.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texir_code_tpu.ops.texture import build_mip_pyramid, texture_sample
from texir_code_tpu.parallel.atlas_tp import (
    ATLAS_AXIS,
    AtlasTPSpec,
    make_atlas_mesh,
    shard_atlas,
    tp_sample_materials,
    tp_texture_sample,
)


@pytest.fixture(scope="module")
def mesh():
    return make_atlas_mesh()


def test_spec_layout():
    spec = AtlasTPSpec.build(64, 64, 8)
    # levels 64..8 are divisible by 8 shards -> big; 4,2,1 replicated tail
    assert spec.n_levels == 7 and spec.n_big == 4
    assert spec.heights == (64, 32, 16, 8, 4, 2, 1)
    # per-device big rows: 8*64/8? rows_local*W summed: (8*64)+(4*32)+(2*16)+(1*8)
    assert spec.big_rows_local == 8 * 64 + 4 * 32 + 2 * 16 + 1 * 8
    assert spec.tail_rows == 16 + 4 + 1
    with pytest.raises(ValueError):
        AtlasTPSpec.build(100, 100, 8)


@pytest.mark.parametrize("boundary", ["wrap", "clamp"])
def test_tp_sample_matches_unsharded(mesh, rng, boundary):
    tex = jnp.asarray(rng.standard_normal((64, 48, 3)), jnp.float32)
    # uvs spanning inside, shard boundaries, and the wrap seam
    uv = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(0, 1, (256, 2)),
                np.stack(  # exactly on the row-shard boundaries
                    [rng.uniform(0, 1, 16), np.repeat([0.125, 0.5], 8)], -1
                ),
                np.array([[0.001, 0.999], [0.999, 0.001], [0.5, 1.0]]),
            ]
        ),
        jnp.float32,
    )
    lod = jnp.asarray(rng.uniform(0, 6.5, (uv.shape[0],)), jnp.float32)

    ref = texture_sample(build_mip_pyramid(tex), uv, lod, boundary)
    got = tp_texture_sample(mesh, tex, uv, lod, boundary=boundary)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_tp_sample_grad_matches(mesh, rng):
    tex = jnp.asarray(rng.standard_normal((32, 32, 2)), jnp.float32)
    uv = jnp.asarray(rng.uniform(0, 1, (128, 2)), jnp.float32)
    lod = jnp.asarray(rng.uniform(0, 4.0, (128,)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 2)), jnp.float32)

    def loss_ref(t):
        return jnp.sum(w * texture_sample(build_mip_pyramid(t), uv, lod))

    def loss_tp(t):
        return jnp.sum(w * tp_texture_sample(mesh, t, uv, lod))

    g_ref = jax.grad(loss_ref)(tex)
    g_tp = jax.grad(loss_tp)(tex)
    np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref), atol=2e-5)


def test_tp_sample_materials_matches(mesh, rng):
    from texir_code_tpu.ops.texture import bilinear_sample

    alb = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)), jnp.float32)
    rgh = jnp.asarray(rng.uniform(0, 1, (128, 128, 1)), jnp.float32)
    uv = jnp.asarray(rng.uniform(0, 1, (200, 2)), jnp.float32)
    la = jnp.asarray(rng.uniform(0, 6, (200,)), jnp.float32)
    lr = jnp.asarray(rng.uniform(0, 7, (200,)), jnp.float32)

    a, r, womip = tp_sample_materials(mesh, alb, rgh, uv, la, lr)
    np.testing.assert_allclose(
        np.asarray(a),
        np.asarray(texture_sample(build_mip_pyramid(alb), uv, la)),
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r),
        np.asarray(texture_sample(build_mip_pyramid(rgh), uv, lr)),
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(womip), np.asarray(bilinear_sample(rgh, uv)), atol=2e-6
    )


def test_mat_step_atlas_tp_matches_unsharded(mesh):
    """A full Mat stage-2 value_and_grad with row-sharded atlases matches
    the single-device step, and the gradients arrive shard-ready."""
    from texir_code_tpu.data.synthetic import make_scene
    from texir_code_tpu.models.losses import render_loss
    from texir_code_tpu.models.material import (
        MaterialModel,
        init_material_params,
    )
    from texir_code_tpu.ops.gbuffer import cube_mvp

    scene = make_scene(atlas_res=48)
    irt = np.full((16, 16, 3), 1.0, np.float32)

    def build(atlas_mesh):
        return MaterialModel(
            scene.mesh, scene.hdr_texture, irt, pano_res=(32, 64),
            sample_light=(8, 4), atlas_mesh=atlas_mesh,
        )

    params = init_material_params(16, 16)
    pos = jnp.asarray(scene.camera_positions(1)[0])
    ext = np.eye(4, dtype=np.float32)
    ext[0:3, 3] = np.asarray(pos)
    mvp = cube_mvp(jnp.asarray(ext))
    key = jax.random.PRNGKey(0)

    def make_loss(model):
        res = model.cube_res
        gt = jnp.ones((6, res, res, 3)) * 0.2
        seg_id = jnp.zeros((6, res, res), jnp.int32)
        ones = jnp.ones((6, res, res, 1))

        def loss_fn(pp):
            out = model._forward(pp, mvp, pos, key, stage=2)
            total, _ = render_loss(
                gt, out, ones, seg_id, 6, 2, seg_region=ones
            )
            return total

        return loss_fn

    l1, g1 = jax.jit(jax.value_and_grad(make_loss(build(None))))(params)
    lt, gt_ = jax.jit(jax.value_and_grad(make_loss(build(mesh))))(params)
    np.testing.assert_allclose(float(l1), float(lt), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g1.albedo), np.asarray(gt_.albedo), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(g1.roughness), np.asarray(gt_.roughness),
        rtol=1e-4, atol=1e-7,
    )
    assert float(jnp.abs(gt_.albedo).sum()) > 0


def test_params_actually_sharded(mesh):
    """shard_atlas places 1/8 of the rows per device, and an elementwise
    optimizer update preserves the sharding (the HBM-scaling contract)."""
    tex = jnp.ones((64, 64, 3))
    sharded = shard_atlas(mesh, tex)
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(8, 64, 3)}

    updated = jax.jit(lambda t: t * 0.5 + 1.0)(sharded)
    assert updated.sharding.is_equivalent_to(sharded.sharding, 3)
