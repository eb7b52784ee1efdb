"""Baseline material heads: shapes, gradient flow, and loss integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.models import fields, losses
from texir_code_tpu.models.material_heads import (
    InvRenderMaterialModel,
    NeILFMaterialModel,
    NvDiffRecMaterialModel,
)
from texir_code_tpu.ops.gbuffer import cube_mvp


@pytest.fixture(scope="module")
def env():
    scene = make_scene(atlas_res=48)
    irt = np.full((16, 16, 3), 1.0, np.float32)
    pos = scene.camera_positions(1)[0]
    ext = np.eye(4, dtype=np.float32)
    ext[0:3, 3] = pos
    mvp = cube_mvp(jnp.asarray(ext))
    return scene, irt, mvp, jnp.asarray(pos)


def _mk(scene, irt, cls, **kw):
    return cls(
        scene.mesh, scene.hdr_texture, irt,
        pano_res=(16, 32), sample_light=(8, 4), **kw,
    )


def test_invrender_head(env):
    scene, irt, mvp, pos = env
    model = _mk(scene, irt, InvRenderMaterialModel,
                network=fields.EnvmapMaterialNetwork(
                    brdf_encoder_dims=(64, 64), brdf_decoder_dims=(32,)))
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    out = model.forward(params, mvp, pos, key)
    r = model.cube_res
    assert out["rgb"].shape == (6, r, r, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    ro = np.asarray(out["roughness"])
    assert (ro >= 0.09 - 1e-5).all() and (ro <= 0.99 + 1e-5).all()

    gt = jnp.full((6, r, r, 3), 0.3)

    def loss_fn(p):
        o = model.forward(p, mvp, pos, key)
        return losses.inv_loss(o, gt, o["latent_pre_sigmoid"])["loss"]

    g = jax.grad(loss_fn)(params)
    total = jax.tree_util.tree_reduce(lambda a, b: a + jnp.abs(b).sum(), g, 0.0)
    assert float(total) > 0


def test_neilf_head(env):
    scene, irt, mvp, pos = env
    model = _mk(scene, irt, NeILFMaterialModel,
                brdf_network=fields.BRDFMLP(dims=(64,) * 8),
                light_network=fields.NeILFMLP(dims=(64,) * 8))
    key = jax.random.PRNGKey(1)
    params = model.init_params(key)
    out = model.forward(params, mvp, pos, key)
    r = model.cube_res
    assert out["rgb"].shape == (6, r, r, 3)
    assert out["brdf_grad"].shape == (6, r, r, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    gt = jnp.full((6, r, r, 3), 0.3)
    grad_img = jnp.zeros((6, r, r, 1))

    def loss_fn(p):
        o = model.forward(p, mvp, pos, key)
        return losses.neilf_loss(o, gt, grad_img)

    g = jax.grad(loss_fn)(params)
    gb = jax.tree_util.tree_reduce(lambda a, b: a + jnp.abs(b).sum(), g["brdf"], 0.0)
    gl = jax.tree_util.tree_reduce(lambda a, b: a + jnp.abs(b).sum(), g["light"], 0.0)
    assert float(gb) > 0 and float(gl) > 0


def test_nvdiffrec_head(env):
    scene, irt, mvp, pos = env
    model = _mk(scene, irt, NvDiffRecMaterialModel)
    key = jax.random.PRNGKey(2)
    params = model.init_params(key)
    out = model.forward(params, mvp, pos, key)
    r = model.cube_res
    assert out["rgb"].shape == (6, r, r, 3)
    assert out["kd_grad"].shape == (6, r, r, 1)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    gt = jnp.full((6, r, r, 3), 0.3)

    def loss_fn(p):
        o = model.forward(p, mvp, pos, key)
        return losses.nvdiffrec_loss(o, gt, jnp.asarray(50.0))

    g = jax.grad(loss_fn)(params)
    total = jax.tree_util.tree_reduce(lambda a, b: a + jnp.abs(b).sum(), g, 0.0)
    assert float(total) > 0
