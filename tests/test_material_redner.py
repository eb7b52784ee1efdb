"""RednerMaterialModel: per-object textures + camera refinement.

Oracle strategy: the differentiable Möller–Trumbore re-solve is checked
against the cast's own (t, u, v); per-object gradient isolation is checked
by masking the loss to one object's pixels; pose refinement is checked by
recovering a perturbed camera on photometric loss alone (the reference's
optim_cam path, models/mat_redner.py:61-67,106-112, has no test upstream).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.models.material_redner import (
    RednerMaterialModel,
    axis_angle_to_matrix,
    moller_trumbore_soa,
    sample_object_textures,
)


@pytest.fixture(scope="module")
def scene():
    return make_scene(atlas_res=64)


def _two_group_mesh(scene):
    mesh = scene.mesh
    ids = np.zeros(mesh.num_faces, np.int32)
    ids[mesh.num_faces // 2:] = 1  # split faces into two "objects"
    mesh.material_ids = ids
    return mesh


def _model(scene, optim_cam=False):
    mesh = _two_group_mesh(scene)
    center = mesh.aabb().mean(axis=0)
    exts = []
    for dx in (0.0, 0.3):
        e = np.eye(4, dtype=np.float32)
        e[:3, 3] = center + np.array([dx, 0.0, 0.0])
        exts.append(e)
    return RednerMaterialModel(
        mesh, scene.hdr_texture, ids=["v0", "v1"], extrinsics=exts,
        optim_cam=optim_cam, texture_res=32, pano_res=(16, 32),
        sample_light=(4, 4),
    )


def test_axis_angle_identity_and_rotation():
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_matrix(jnp.zeros(3))), np.eye(3), atol=1e-6
    )
    r = np.asarray(axis_angle_to_matrix(jnp.array([0.0, 0.0, np.pi / 2])))
    expect = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(r, expect, atol=1e-6)
    # orthonormality at a generic angle
    r = np.asarray(axis_angle_to_matrix(jnp.array([0.3, -0.2, 0.5])))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_moller_trumbore_matches_cast(scene):
    model = _model(scene)
    h, w = model.pano_res
    b = h * w
    c2w = np.asarray(model._extrinsics[0])
    dirs = np.asarray(model._cam_dirs) @ c2w[:3, :3].T
    o = tuple(jnp.full((b,), c2w[k, 3]) for k in range(3))
    d = tuple(jnp.asarray(dirs[:, k]) for k in range(3))
    from texir_code_tpu.ops.raycast import cast_rays_soa

    hit = cast_rays_soa(model.tbl.bvh, o, d, t_min=1e-2)
    prim = jnp.maximum(hit.prim, 0)
    v0 = tuple(model._corners[0][k][prim] for k in range(3))
    v1 = tuple(model._corners[1][k][prim] for k in range(3))
    v2 = tuple(model._corners[2][k][prim] for k in range(3))
    t, u, v = moller_trumbore_soa(o, d, v0, v1, v2)
    valid = np.asarray(hit.prim >= 0)
    assert valid.any()
    np.testing.assert_allclose(
        np.asarray(t)[valid], np.asarray(hit.t)[valid], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(u)[valid], np.asarray(hit.u)[valid], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v)[valid], np.asarray(hit.v)[valid], atol=1e-4
    )


def test_sample_object_textures_selects_object():
    g, r = 3, 8
    tex = jnp.stack(
        [jnp.full((r, r, 3), float(i)) for i in range(g)]
    )
    obj = jnp.array([0, 1, 2, 1], jnp.int32)
    uv = (jnp.full((4,), 0.5), jnp.full((4,), 0.5))
    out = np.asarray(sample_object_textures(tex, obj, uv))
    np.testing.assert_allclose(out[:, 0], [0.0, 1.0, 2.0, 1.0], atol=1e-6)


def test_forward_shapes_and_finiteness(scene):
    model = _model(scene)
    params = model.init_params()
    out = model.forward(params, 0, jax.random.PRNGKey(0))
    h, w = model.pano_res
    assert out["rgb"].shape == (h, w, 3)
    assert out["albedo"].shape == (h, w, 3)
    assert out["roughness"].shape == (h, w, 1)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.asarray(out["empty_mask"]).sum() > 0


def test_per_object_gradient_isolation(scene):
    """Loss masked to object-0 pixels must not touch object 1's texture."""
    model = _model(scene)
    params = model.init_params()
    h, w = model.pano_res
    key = jax.random.PRNGKey(1)

    out = model.forward(params, 0, key)
    # object id per pixel, from the same cast the model performs
    from texir_code_tpu.ops.raycast import cast_rays_soa

    c2w = np.asarray(model._extrinsics[0])
    dirs = np.asarray(model._cam_dirs) @ c2w[:3, :3].T
    b = h * w
    hit = cast_rays_soa(
        model.tbl.bvh,
        tuple(jnp.full((b,), c2w[k, 3]) for k in range(3)),
        tuple(jnp.asarray(dirs[:, k]) for k in range(3)),
        t_min=1e-2,
    )
    obj_px = np.array(model._face_obj[jnp.maximum(hit.prim, 0)])
    obj_px[np.asarray(hit.prim) < 0] = -1
    mask0 = jnp.asarray((obj_px == 0).astype(np.float32).reshape(h, w, 1))
    assert (obj_px == 0).any() and (obj_px == 1).any()

    def loss(p):
        o = model._forward(p, jnp.int32(0), key)
        return jnp.sum(o["rgb"] * mask0)

    grads = jax.grad(loss)(params)
    g0 = float(jnp.abs(grads["albedo"][0]).sum())
    g1 = float(jnp.abs(grads["albedo"][1]).sum())
    assert g0 > 0.0
    assert g1 == 0.0


def test_camera_pose_recovery(scene):
    """Photometric gradients recover a rotation perturbation.

    Pose gradients flow through d(texture)/d(uv) — the interior term of
    redner's differentiable render — so the texture needs spatial
    structure and the test perturbs rotation only (translation's
    photometric signal at pano scale is dominated by the silhouette
    term, which interior derivatives deliberately exclude)."""
    import optax

    mesh = _two_group_mesh(scene)
    center = mesh.aabb().mean(axis=0)
    e = np.eye(4, dtype=np.float32)
    e[:3, 3] = center
    model = RednerMaterialModel(
        mesh, scene.hdr_texture, ids=["v0"], extrinsics=[e],
        optim_cam=True, texture_res=64, pano_res=(32, 64),
        sample_light=(4, 4),
    )
    params = model.init_params()
    r = model.texture_res
    yy, xx = jnp.meshgrid(jnp.arange(r), jnp.arange(r), indexing="ij")
    pattern = 0.5 + 0.4 * jnp.sin(xx * 2 * jnp.pi * 6 / r) * jnp.sin(
        yy * 2 * jnp.pi * 6 / r
    )
    params["albedo"] = jnp.broadcast_to(
        pattern[None, :, :, None], params["albedo"].shape
    ).astype(jnp.float32)
    key = jax.random.PRNGKey(2)

    gt = model._forward(params, jnp.int32(0), key, detach_cam=True)["rgb"]
    params["cam_rot"] = params["cam_rot"].at[0, 1].set(0.02)

    def loss_fn(p):
        out = model._forward(p, jnp.int32(0), key)
        return jnp.mean((out["rgb"] - gt) ** 2)

    # texture lr 0 — only the pose moves (reference couples them at 0.1x)
    opt = optax.multi_transform(
        {"pose": optax.adam(2e-3), "tex": optax.set_to_zero()},
        {"albedo": "tex", "roughness": "tex", "cam_rot": "pose",
         "cam_trans": "pose"},
    )
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    l0 = float(loss_fn(params))
    for _ in range(40):
        params, opt_state, l = step(params, opt_state)
    l1 = float(l)
    assert l1 < 0.1 * l0, (l0, l1)
    assert float(jnp.abs(params["cam_rot"][0, 1])) < 0.01
