"""Golden tests for the shading library against numpy oracles and analytic
furnace-style integrals."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.ops import sampling, shading


def test_hdr_scale_roundtrip(rng):
    x = np.abs(rng.normal(size=(64,)).astype(np.float32)) * 10
    y = np.asarray(shading.hdr_recover(shading.hdr_scale(jnp.asarray(x))))
    np.testing.assert_allclose(y, x, rtol=2e-4, atol=2e-4)
    # reference computes log(x+1), not log1p (utils/general.py:66) — compare
    # against the same f32 formula
    np.testing.assert_allclose(
        np.asarray(shading.hdr_scale(jnp.asarray(x))),
        np.log((x + np.float32(1.0)).astype(np.float32)), rtol=1e-5, atol=1e-6,
    )


def test_tonemap():
    x = jnp.array([0.0, 0.5, 1.0, 4.0])
    y = np.asarray(shading.tonemap(x))
    np.testing.assert_allclose(y, np.clip(np.array([0, 0.5, 1, 4.0]) ** (1 / 2.2), 0, 1), rtol=1e-5)


def test_mse_to_psnr():
    assert np.asarray(shading.mse_to_psnr(jnp.array(0.01))) == pytest.approx(20.0, abs=1e-3)


def test_rgb_to_intensity():
    rgb = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 1.0, 1.0]])
    i = np.asarray(shading.rgb_to_intensity(rgb))[:, 0]
    np.testing.assert_allclose(i, [0.299, 0.587, 1.0], atol=1e-6)


def test_get_mip_level():
    assert shading.get_mip_level(8192) == 13
    assert shading.get_mip_level(1024) == 10
    assert shading.get_mip_level(1) == 0
    assert shading.get_mip_level(6) == 1  # stops at first odd


def test_fresnel_limits():
    f = np.asarray(shading.fresnel_schlick_ue4(jnp.array([[0.0], [1.0]])))
    assert f[0, 0] == pytest.approx(1.0, abs=1e-3)     # grazing → total reflection
    assert f[1, 0] == pytest.approx(0.04, abs=2e-3)    # normal incidence → f0


def test_smith_g_bounds(rng):
    ndv = jnp.asarray(rng.uniform(0.01, 1, (32, 1)).astype(np.float32))
    ndl = jnp.asarray(rng.uniform(0.01, 1, (32, 1)).astype(np.float32))
    r = jnp.asarray(rng.uniform(0.01, 1, (32, 1)).astype(np.float32))
    g = np.asarray(shading.smith_g(ndv, ndl, r))
    assert (g >= 0).all() and (g <= 1 + 1e-5).all()
    # smooth surface, straight-on view → no shadowing
    g0 = np.asarray(shading.smith_g(jnp.ones((1, 1)), jnp.ones((1, 1)), jnp.full((1, 1), 1e-3)))
    assert g0[0, 0] == pytest.approx(1.0, abs=1e-2)


def test_lambertian_diffuse():
    irr = jnp.full((4, 3), 3.14159)
    alb = jnp.full((4, 3), 0.5)
    d = np.asarray(shading.lambertian_diffuse(irr, alb))
    np.testing.assert_allclose(d, 0.5, atol=1e-4)


def test_diffuse_estimator_furnace():
    """Uniform-sampled white furnace: constant radiance L0, albedo a
    → diffuse = a·L0 (energy conservation of the lambertian lobe)."""
    key = jax.random.PRNGKey(0)
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (2, 1)).astype(np.float32))
    s = 2048
    dirs = sampling.generate_dir(n, s, key, mode="uniform")
    lighting = jnp.ones((2, s, 3)) * 2.0       # L0 = 2
    albedo = jnp.full((2, 3), 0.25)
    out = np.asarray(
        shading.diffuse_estimator(lighting, dirs, n, albedo, "uniform")
    ) / s
    np.testing.assert_allclose(out, 0.25 * 2.0, rtol=3e-2)


def test_irradiance_estimator_furnace():
    """Constant radiance L0 → irradiance = π·L0."""
    key = jax.random.PRNGKey(1)
    n = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (2, 1)).astype(np.float32))
    s = 2048
    dirs = sampling.generate_dir(n, s, key, mode="uniform")
    lighting = jnp.ones((2, s, 3)) * 3.0
    out = np.asarray(shading.irradiance_estimator(lighting, dirs, n))
    np.testing.assert_allclose(out, np.pi * 3.0, rtol=3e-2)


def test_specular_estimator_oracle(rng):
    """Check the estimator term-by-term against a direct numpy transcription
    of the Cook-Torrance formulas (independent of the jax code paths)."""
    key = jax.random.PRNGKey(2)
    b, s = 8, 16
    normal = rng.normal(size=(b, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    view = rng.normal(size=(b, 3)).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    roughness = rng.uniform(0.05, 0.8, (b, 1)).astype(np.float32)
    half = np.asarray(
        sampling.generate_dir(jnp.asarray(normal), s, key, mode="importance",
                              roughness=jnp.asarray(roughness))
    )
    light, _ = sampling.reflect(jnp.asarray(view), jnp.asarray(half))
    light = np.asarray(light)
    lighting = np.abs(rng.normal(size=(b, s, 3))).astype(np.float32)

    got = np.asarray(
        shading.specular_estimator(
            jnp.asarray(lighting), jnp.asarray(half), jnp.asarray(normal),
            jnp.asarray(view), jnp.asarray(light), jnp.asarray(roughness),
        )
    )

    # numpy oracle
    def cdot(a, b):
        return np.clip(np.sum(a * b, -1, keepdims=True), 0, 1)

    nn, vv, rr = normal[:, None], view[:, None], roughness[:, None]
    vdh, ndl, ndh, ndv = cdot(half, vv), cdot(nn, light), cdot(nn, half), cdot(nn, vv)
    f = 0.04 + 0.96 * 2.0 ** ((-5.55472 * vdh - 6.98316) * vdh)
    k = (rr + 1) ** 2 / 8
    g = (ndl / np.clip(ndl * (1 - k) + k, 1e-14, None)) * (
        ndv / np.clip(ndv * (1 - k) + k, 1e-14, None))
    brdf = f * g / np.clip(4 * ndl * ndv, 1e-14, None)
    want = np.sum(lighting * brdf * ndl * 4 * vdh / np.clip(ndh, 1e-14, None), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_specular_estimator_white_furnace_energy():
    """Importance-sampled furnace test: for a smooth-ish dielectric the
    reflected energy must be ≈ the fresnel-weighted albedo, well below 1."""
    key = jax.random.PRNGKey(3)
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (1, 1)).astype(np.float32))
    v = n
    r = jnp.full((1, 1), 0.3)
    s = 2048
    half = sampling.generate_dir(n, s, key, mode="importance", roughness=r)
    light, _ = sampling.reflect(v, half)
    lighting = jnp.ones((1, s, 3))
    out = np.asarray(
        shading.specular_estimator(lighting, half, n, v, light, r)
    ) / s
    assert 0.01 < out[0, 0] < 0.2  # dielectric f0=0.04 → a few percent
