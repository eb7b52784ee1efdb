"""Neural field tests: shapes, init conventions, encoding properties, and
trainability smoke checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.models import fields


def test_positional_encoding_order_and_dim():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    out = fields.positional_encoding(x, 4)
    assert out.shape == (1, fields.pe_dim(3, 4))
    assert out.shape[-1] == 3 * (1 + 8)
    np.testing.assert_allclose(out[0, :3], [0.5, -0.25, 1.0])
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(out[0, 9:12], np.sin([1.0, -0.5, 2.0]), atol=1e-6)


def test_mat_network_shapes_and_determinism():
    net = fields.MatNetwork(dims=(64, 64), p_out_dim=3)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    x = jnp.asarray(np.random.default_rng(0).random((17, 3)).astype(np.float32))
    out = net.apply(params, x)
    assert out.shape == (17, 3)
    out2 = net.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_ir_network():
    net = fields.IRNetwork(dims=(32, 32))
    p = jnp.zeros((5, 3))
    d = jnp.asarray(np.tile([[0, 0, 1.0]], (5, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), p, d)
    assert net.apply(params, p, d).shape == (5, 3)


def test_pil_network():
    net = fields.PILNetwork(dims=(32, 32))
    p = jnp.zeros((5, 3))
    d = jnp.asarray(np.tile([[0, 0, 1.0]], (5, 1)), jnp.float32)
    r = jnp.full((5, 1), 0.5)
    params = net.init(jax.random.PRNGKey(1), p, d, r)
    assert net.apply(params, p, d, r).shape == (5, 3)


def test_brdf_mlp_output_range():
    net = fields.BRDFMLP(dims=(64,) * 8)
    p = jnp.asarray(np.random.default_rng(0).normal(size=(9, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(2), p)
    out = np.asarray(net.apply(params, p))
    assert out.shape == (9, 4)
    assert (out >= 0).all() and (out <= 1).all()
    # zero-init last layer → exactly 0.5 at init
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_neilf_mlp_init_bias():
    net = fields.NeILFMLP(dims=(64,) * 8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(7, 6)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(3), x)
    out = np.asarray(net.apply(params, x))
    assert out.shape == (7, 3)
    # zero weights + ln(1.5) bias at init
    np.testing.assert_allclose(out, np.log(1.5), atol=1e-6)


def test_envmap_material_network():
    net = fields.EnvmapMaterialNetwork(
        brdf_encoder_dims=(64, 64), brdf_decoder_dims=(32,)
    )
    p = jnp.asarray(np.random.default_rng(0).normal(size=(6, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(4), p, jax.random.PRNGKey(5))
    out = net.apply(params, p, jax.random.PRNGKey(6))
    assert out["diffuse_albedo"].shape == (6, 3)
    r = np.asarray(out["roughness"])
    assert (r >= 0.09 - 1e-6).all() and (r <= 0.99 + 1e-6).all()
    assert "random_xi_roughness" in out
    # jittered decode stays close to the main decode
    d = np.abs(np.asarray(out["random_xi_diffuse_albedo"]) - np.asarray(out["diffuse_albedo"]))
    assert d.mean() < 0.1


def test_hashgrid_encoding_locality():
    enc = fields.HashGridEncoding(num_levels=4, desired_resolution=128)
    x = jnp.asarray([[0.5, 0.5, 0.5], [0.5001, 0.5, 0.5], [0.9, 0.1, 0.3]])
    params = enc.init(jax.random.PRNGKey(0), x)
    out = np.asarray(enc.apply(params, x))
    assert out.shape == (3, 8)
    # nearby points → nearby encodings; far points → different
    near = np.abs(out[0] - out[1]).max()
    far = np.abs(out[0] - out[2]).max()
    assert near < far


def test_hashgrid_is_trainable():
    """One SGD step reduces a fit loss (gradients reach the table)."""
    import optax

    enc = fields.HashGridEncoding(num_levels=4, desired_resolution=64,
                                  log2_hashmap_size=12)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((64, 3)).astype(np.float32))
    y = jnp.asarray(rng.random((64, 8)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean((enc.apply(p, x) - y) ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0
    )
    assert float(gnorm) > 0
    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0 = float(loss(params))
    for _ in range(20):
        grads = jax.grad(loss)(params)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
    assert float(loss(params)) < l0


def test_mlp_texture3d():
    aabb = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    net = fields.MLPTexture3D(aabb=aabb, channels=4)
    p = jnp.asarray(np.random.default_rng(0).random((10, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), p)
    out = np.asarray(net.apply(params, p))
    assert out.shape == (10, 4)
    assert (out[:, :3] >= 0).all() and (out[:, :3] <= 1).all()
    assert (out[:, 3] >= 0.01 - 1e-6).all() and (out[:, 3] <= 1).all()
