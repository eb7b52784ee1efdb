"""NIrF tracer and IrT baker tests on the synthetic room, with analytic
radiometry oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.models.tbl import build_tbl
from texir_code_tpu.models.tracer_irrf import TracerIRRF
from texir_code_tpu.models.tracer_irt import (
    IrradianceTextureBaker,
    bake_geometry_textures,
)
from texir_code_tpu.ops.postprocess import atrous_denoise, pad_texture
from texir_code_tpu.models.fields import MatNetwork

from tests.test_gbuffer import make_box_mesh


@pytest.fixture(scope="module")
def furnace_tbl():
    """Unit box, constant radiance 2.0 → irradiance π·2 everywhere inside."""
    mesh = make_box_mesh()
    return build_tbl(mesh, np.full((8, 8, 3), 2.0, np.float32))


@pytest.fixture(scope="module")
def room():
    return make_scene(atlas_res=48)


def test_irrf_forward_contract(furnace_tbl):
    tracer = TracerIRRF(
        furnace_tbl, MatNetwork(dims=(64, 64), p_out_dim=3), std_jit=5e-2
    )
    key = jax.random.PRNGKey(0)
    params = tracer.init_params(key)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [0.3, 0.6, 0.4]], jnp.float32)
    nrm = jnp.asarray([[0, 0, 1.0], [0, 1.0, 0]], jnp.float32)
    out = tracer.forward(params, pts, nrm, (16, 32), key)
    assert set(out) == {"gt", "pred", "pred_jit"}
    assert out["gt"].shape == (2, 3)
    np.testing.assert_allclose(np.asarray(out["gt"]), 2 * np.pi, rtol=0.1)
    # validation path skips tracing
    out2 = tracer.forward(params, pts, nrm, (16, 32), key, trace=False)
    assert "gt" not in out2


def test_irrf_trains_toward_gt(furnace_tbl):
    """A few Adam steps shrink the IRF loss on fixed points."""
    import optax

    from texir_code_tpu.models.losses import irf_loss

    tracer = TracerIRRF(
        furnace_tbl, MatNetwork(dims=(64, 64), p_out_dim=3), std_jit=5e-2
    )
    key = jax.random.PRNGKey(1)
    params = tracer.init_params(key)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.random((16, 3)).astype(np.float32) * 0.8 + 0.1)
    nrm = jnp.asarray(np.tile([[0, 0, 1.0]], (16, 1)).astype(np.float32))
    gt = tracer.trace_gt(pts, nrm, (16, 32), key)

    def loss_fn(p):
        pred = tracer.network.apply(p, pts)
        return irf_loss(gt, pred)

    opt = optax.adam(1e-3)
    state = opt.init(params)
    l0 = float(loss_fn(params))
    for _ in range(50):
        g = jax.grad(loss_fn)(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < l0 * 0.5


def test_bake_geometry_textures(room):
    geom = bake_geometry_textures(room.mesh, 48)
    # every wall chart interior is covered
    assert geom.valid.mean() > 0.7
    sel = geom.valid
    pos = geom.position[sel]
    sx, sy, sz = room.size
    # all positions on the box surface
    on = (
        (np.abs(pos[:, 0]) < 1e-3) | (np.abs(pos[:, 0] - sx) < 1e-3)
        | (np.abs(pos[:, 1]) < 1e-3) | (np.abs(pos[:, 1] - sy) < 1e-3)
        | (np.abs(pos[:, 2]) < 1e-3) | (np.abs(pos[:, 2] - sz) < 1e-3)
    )
    assert on.all()
    nrm = geom.normal[sel]
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)
    # normals point inward: p + ε·n moves toward the interior
    inner = pos + 0.01 * nrm
    assert (inner[:, 0] > -0.01).all() and (inner[:, 0] < sx + 0.01).all()


def test_bake_irradiance_furnace():
    """Furnace bake: every valid texel's irradiance ≈ π·L0."""
    mesh = make_box_mesh()
    tbl = build_tbl(mesh, np.full((8, 8, 3), 2.0, np.float32))
    geom = bake_geometry_textures(mesh, 16)
    baker = IrradianceTextureBaker(tbl, spp=256, texel_batch=128)
    tex = baker.bake(geom, jax.random.PRNGKey(0))
    vals = tex[geom.valid]
    np.testing.assert_allclose(vals, 2 * np.pi, rtol=0.15)
    assert (tex[~geom.valid] == 0).all()


def test_bake_room_sees_lamp(room):
    """Texels facing the lamp receive more irradiance than texels on the
    ceiling next to it (which can't see it)."""
    tbl = build_tbl(room.mesh, room.hdr_texture)
    geom = bake_geometry_textures(room.mesh, 24)
    baker = IrradianceTextureBaker(tbl, spp=512, texel_batch=256)
    tex = baker.bake(geom, jax.random.PRNGKey(1))
    assert np.isfinite(tex).all() and tex.max() > 0
    # floor chart (cell 0,0 of the 3×2 atlas) is lit noticeably more than the
    # ceiling chart (cell 1,0) whose texels face away from the lamp
    r = 24
    floor = tex[0 : r // 2, 0 : r // 3]
    ceil = tex[0 : r // 2, r // 3 : 2 * r // 3]
    assert floor[geom.valid[0 : r // 2, 0 : r // 3]].mean() > 1.5 * ceil[
        geom.valid[0 : r // 2, r // 3 : 2 * r // 3]
    ].mean()


def test_pad_texture():
    tex = np.zeros((8, 8, 3), np.float32)
    valid = np.zeros((8, 8), bool)
    tex[2, 2] = [1, 2, 3]
    valid[2, 2] = True
    tex[6, 6] = [4, 5, 6]
    valid[6, 6] = True
    out = pad_texture(tex, valid)
    np.testing.assert_allclose(out[2, 3], [1, 2, 3])
    np.testing.assert_allclose(out[6, 5], [4, 5, 6])
    np.testing.assert_allclose(out[2, 2], [1, 2, 3])  # valid preserved


def test_atrous_denoise_reduces_noise(rng):
    clean = np.tile(
        np.linspace(0.5, 2.0, 32, dtype=np.float32)[:, None, None], (1, 32, 3)
    )
    noisy = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
    noisy = np.clip(noisy, 0, None)
    out = np.asarray(atrous_denoise(jnp.asarray(noisy)))
    err_before = np.abs(noisy - clean).mean()
    err_after = np.abs(out - clean).mean()
    assert err_after < err_before * 0.6


def test_atrous_denoise_preserves_edges():
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 5.0
    out = np.asarray(atrous_denoise(jnp.asarray(img), sigma_r=0.05))
    # edge magnitude preserved within 20%
    assert abs(out[:, 20:].mean() - 5.0) < 1.0
    assert out[:, :12].mean() < 0.5


def test_fan_bake_matches_traversal_bake():
    """The fan-path baker agrees with the traversal-path baker (same RNG)."""
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.ops.fan_raycast import FanScene

    scene = make_scene(atlas_res=32, subdiv=2)
    tbl = build_tbl(scene.mesh, scene.hdr_texture)
    fan = FanScene.from_flat(build_bvh(scene.mesh.vertices, scene.mesh.faces))
    geom = bake_geometry_textures(scene.mesh, 16)
    key = jax.random.PRNGKey(5)
    a = IrradianceTextureBaker(tbl, spp=64, texel_batch=64).bake(geom, key)
    b = IrradianceTextureBaker(
        tbl, spp=64, texel_batch=64, fan_scene=fan, max_leaves=8
    ).bake(geom, key)  # tiny budget forces the exact-overflow path
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    c = IrradianceTextureBaker(
        tbl, spp=64, texel_batch=64, fan_scene=fan, max_leaves=1024
    ).bake(geom, key)
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-4)


def test_irrf_trace_gt_culled_matches_traversal(room):
    """The culled-kernel GT trace (the TPU path, run here in interpret
    mode via FORCE_INTERPRET) must match the skip-link traversal GT."""
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.ops import pallas_fan
    from texir_code_tpu.ops.fan_raycast import FanScene
    from texir_code_tpu.ops.pallas_culled import ClusterScene

    tbl = build_tbl(room.mesh, room.hdr_texture)
    flat = build_bvh(room.mesh.vertices, room.mesh.faces)
    fan = FanScene.from_flat(flat, triangle_uvs=room.mesh.triangle_uvs())
    cl = ClusterScene.from_fan(fan, lb=8, dense=True)

    rng = np.random.default_rng(3)
    sx, sy, sz = room.size
    pts = jnp.asarray(np.stack([
        rng.uniform(0.3, sx - 0.3, 4), rng.uniform(0.3, sy - 0.3, 4),
        rng.uniform(0.3, sz - 0.3, 4)], axis=-1).astype(np.float32))
    nrm = rng.standard_normal((4, 3)).astype(np.float32)
    nrm = jnp.asarray(nrm / np.linalg.norm(nrm, axis=-1, keepdims=True))
    key = jax.random.PRNGKey(5)

    ref = TracerIRRF(tbl).trace_gt(pts, nrm, (8, 16), key)

    pallas_fan.FORCE_INTERPRET = True
    try:
        got = TracerIRRF(tbl, fan_scene=fan, cluster_scene=cl).trace_gt(
            pts, nrm, (8, 16), key
        )
    finally:
        pallas_fan.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
