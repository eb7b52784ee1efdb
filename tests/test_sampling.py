"""Golden tests for hemisphere sampling against independent numpy oracles.

The oracle implementations re-derive the reference math (reference
utils/sample_util.py) directly from the formulas; they are written in numpy
here, independent of the library code under test.
"""

import numpy as np
import pytest

import jax

from texir_code_tpu.ops import sampling


def oracle_radical_inverse(i: int) -> float:
    """Bit-reversal radical inverse computed digit by digit."""
    result = 0.0
    f = 0.5
    for bit in range(32):
        if (i >> bit) & 1:
            result += f
        f *= 0.5
    return result


def test_radical_inverse_matches_bit_reversal():
    idx = np.array([0, 1, 2, 3, 4, 7, 255, 1023, 65535], dtype=np.uint32)
    got = sampling.radical_inverse_np(idx)
    want = np.array([oracle_radical_inverse(int(i)) for i in idx])
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_hammersley_properties():
    n = 64
    h = sampling.hammersley_np(n)
    assert h.shape == (n, 2)
    np.testing.assert_allclose(h[:, 0], np.arange(n) / n, atol=1e-7)
    # radical inverse of [0..n) is a permutation of i/n for power-of-two n
    np.testing.assert_allclose(np.sort(h[:, 1]), np.arange(n) / n, atol=1e-7)


def test_onb_orthonormal(rng):
    normals = rng.normal(size=(128, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    n, u, v = sampling.build_onb(normals)
    n, u, v = np.asarray(n), np.asarray(u), np.asarray(v)
    for a, b in [(n, u), (n, v), (u, v)]:
        dots = np.abs(np.sum(a * b, axis=-1))
        assert dots.max() < 1e-4
    np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-3)
    # helper-axis switch near the x pole must still produce a valid frame
    pole = np.array([[1.0, 1e-4, 0.0], [-1.0, 0.0, 1e-4]], dtype=np.float32)
    pole /= np.linalg.norm(pole, axis=-1, keepdims=True)
    _, u2, v2 = sampling.build_onb(pole)
    assert np.isfinite(np.asarray(u2)).all() and np.isfinite(np.asarray(v2)).all()


@pytest.mark.parametrize("mode", ["uniform", "cosine"])
def test_generate_dir_upper_hemisphere(mode, rng):
    key = jax.random.PRNGKey(0)
    normals = rng.normal(size=(32, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    dirs = np.asarray(sampling.generate_dir(normals, 256, key, mode=mode))
    assert dirs.shape == (32, 256, 3)
    ndl = np.sum(normals[:, None, :] * dirs, axis=-1)
    assert ndl.min() > -1e-3  # all directions on the normal's hemisphere
    np.testing.assert_allclose(
        np.linalg.norm(dirs, axis=-1), 1.0, atol=5e-3
    )


def test_uniform_sampling_integrates_constant(rng):
    """MC integral of 1 over the hemisphere with pdf 1/2π must equal 2π."""
    key = jax.random.PRNGKey(1)
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    dirs = np.asarray(sampling.generate_dir(normals, 2048, key, mode="uniform"))
    # estimate of ∫ cosθ dω = π using uniform pdf: mean(cosθ)·2π
    cos = np.clip(dirs[..., 2], 0, 1)
    est = cos.mean(axis=-1) * 2 * np.pi
    np.testing.assert_allclose(est, np.pi, rtol=2e-2)


def test_cosine_sampling_density(rng):
    """cosθ² expectation under cosine pdf: E[cosθ] = 2/3."""
    key = jax.random.PRNGKey(2)
    normals = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (2, 1))
    dirs = np.asarray(sampling.generate_dir(normals, 2048, key, mode="cosine"))
    cos = np.clip(dirs[..., 1], 0, 1)
    np.testing.assert_allclose(cos.mean(), 2.0 / 3.0, rtol=2e-2)


def test_importance_sampling_ggx_concentration(rng):
    """Low roughness concentrates half-vectors around the normal."""
    key = jax.random.PRNGKey(3)
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (2, 1))
    r_lo = np.full((2, 1), 0.05, np.float32)
    r_hi = np.full((2, 1), 0.8, np.float32)
    h_lo = np.asarray(
        sampling.generate_dir(normals, 1024, key, mode="importance", roughness=r_lo)
    )
    h_hi = np.asarray(
        sampling.generate_dir(normals, 1024, key, mode="importance", roughness=r_hi)
    )
    assert h_lo[..., 2].mean() > 0.99
    assert h_hi[..., 2].mean() < h_lo[..., 2].mean()
    # GGX inverse-CDF formula check against the oracle for a fixed sample
    u1 = 0.3
    a = 0.5**2
    want = np.sqrt((1 - u1) / (1 + (a * a - 1) * u1))
    # reproduce via the library with a fixed sample grid
    samples = np.full((1, 1, 2), [u1, 0.25], np.float32)
    h = np.asarray(
        sampling.generate_dir(
            normals[:1], 1, key, mode="importance",
            roughness=np.full((1, 1), 0.5, np.float32), samples=samples,
        )
    )
    np.testing.assert_allclose(h[0, 0, 2], want, atol=1e-5)


def test_reflect_matches_formula(rng):
    key = jax.random.PRNGKey(4)
    normals = rng.normal(size=(8, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    view = rng.normal(size=(8, 3)).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    half = np.asarray(
        sampling.generate_dir(normals, 16, key, mode="importance",
                              roughness=np.full((8, 1), 0.3, np.float32))
    )
    light, vdh = sampling.reflect(view, half)
    light, vdh = np.asarray(light), np.asarray(vdh)
    want_vdh = np.clip(np.sum(half * view[:, None, :], -1, keepdims=True), 0, 1)
    np.testing.assert_allclose(vdh, want_vdh, atol=1e-6)
    np.testing.assert_allclose(
        light, 2 * want_vdh * half - view[:, None, :], atol=1e-6
    )


def test_stratified_samples_deterministic_given_key():
    key = jax.random.PRNGKey(5)
    a = np.asarray(sampling.stratified_samples(key, 4, 32))
    b = np.asarray(sampling.stratified_samples(key, 4, 32))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= sampling.TINY_NUMBER
    assert a.max() <= 1 - sampling.TINY_NUMBER
