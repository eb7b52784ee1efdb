"""Hemisphere sampling: Hammersley sequences and ONB direction generation.

TPU-native equivalent of the reference's sampling library
(reference utils/sample_util.py):

  * ``radical_inverse`` / ``hammersley``   — reference utils/sample_util.py:28-41
    (vectorized uint32 bit reversal instead of a Python loop)
  * ``build_onb``                          — reference utils/sample_util.py:84-91
  * ``generate_dir`` with modes uniform / cosine / importance (GGX) and
    pre-modes Hammersley / independent     — reference utils/sample_util.py:63-146

Conventions match the reference exactly so that traced images agree:
the stratified 2D samples are the Hammersley set with a *single random
toroidal shift per batch row*, clamped to [TINY, 1-TINY]; the hemisphere
mapping treats the surface normal as the "y-up" axis of the local frame with
``L = V·(sinφ sinθ) + n·cosθ - U·(cosφ sinθ)`` and ``φ = 2π·u2 - π``.

All functions are jit-safe (static sample counts) and take explicit
``jax.random`` keys — determinism across shardings comes from folding texel /
pixel ids into the key at the call site.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TINY_NUMBER = 1e-6
TINY_TINY_NUMBER = 1e-14


def radical_inverse_np(i: np.ndarray) -> np.ndarray:
    """Base-2 radical inverse (van der Corput) by 32-bit reversal; numpy."""
    bits = np.asarray(i, dtype=np.uint32)
    bits = (bits << np.uint32(16)) | (bits >> np.uint32(16))
    bits = ((bits & np.uint32(0x55555555)) << np.uint32(1)) | (
        (bits & np.uint32(0xAAAAAAAA)) >> np.uint32(1))
    bits = ((bits & np.uint32(0x33333333)) << np.uint32(2)) | (
        (bits & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    bits = ((bits & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | (
        (bits & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    bits = ((bits & np.uint32(0x00FF00FF)) << np.uint32(8)) | (
        (bits & np.uint32(0xFF00FF00)) >> np.uint32(8))
    return bits.astype(np.float64) * 2.3283064365386963e-10


def hammersley_np(n: int) -> np.ndarray:
    """[n, 2] Hammersley set: (i/n, radical_inverse(i)). Host-side constant."""
    i = np.arange(n, dtype=np.uint32)
    return np.stack(
        [i.astype(np.float64) / float(n), radical_inverse_np(i)], axis=-1
    ).astype(np.float32)


def hammersley(n: int) -> jnp.ndarray:
    """[n, 2] Hammersley set as a device constant (folded into the jaxpr)."""
    return jnp.asarray(hammersley_np(n))


def normalize(x: jnp.ndarray, eps: float = TINY_NUMBER) -> jnp.ndarray:
    """x / (||x|| + eps) along the last axis (reference's norm_axis)."""
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def build_onb(normals: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Orthonormal basis (n, U, V) about each normal.

    Matches reference utils/sample_util.py:84-91: helper axis is (0,1,0) where
    |n.x| > 0.99 else (1,0,0); U = normalize(cross(axis, n));
    V = normalize(cross(n, U)).

    Args:
        normals: [..., 3]
    Returns:
        (n, U, V) each [..., 3]; n is re-normalized.
    """
    x_axis = jnp.where(
        jnp.abs(normals[..., 0:1]) > 0.99,
        jnp.array([0.0, 1.0, 0.0], dtype=normals.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=normals.dtype),
    )
    n = normalize(normals)
    u = normalize(jnp.cross(x_axis, n))
    v = normalize(jnp.cross(n, u))
    return n, u, v


def stratified_samples(
    key: jax.Array, batch: int, num_samples: int, pre_mode: str = "hammersley"
) -> jnp.ndarray:
    """[batch, num_samples, 2] 2D sample points in (0, 1).

    pre_mode 'hammersley': the Hammersley set with one random toroidal shift
    per batch row (reference utils/sample_util.py:93-108), clamped to
    [TINY, 1-TINY] to protect the GGX-mapping backward from NaNs.
    pre_mode 'independent': iid uniforms (reference :109-111).
    """
    if pre_mode.lower() == "hammersley":
        base = hammersley(num_samples)[None, :, :]  # [1, S, 2]
        shift = jax.random.uniform(key, (batch, 1, 2))
        samples = jnp.mod(base + shift, 1.0)
    elif pre_mode == "independent":
        samples = jax.random.uniform(key, (batch, num_samples, 2))
    else:
        raise ValueError(f"unknown pre_mode: {pre_mode!r}")
    return jnp.clip(samples, TINY_NUMBER, 1.0 - TINY_NUMBER)


def _map_hemisphere(
    samples: jnp.ndarray,
    n: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    cos_theta: jnp.ndarray,
) -> jnp.ndarray:
    """Shared ONB mapping: φ from u2, cosθ supplied by the sampling mode."""
    phi = 2.0 * jnp.pi * samples[..., 1:2] - jnp.pi
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta * cos_theta, 0.0, 1.0))
    return (
        v * (jnp.sin(phi) * sin_theta)
        + n * cos_theta
        + u * -(jnp.cos(phi) * sin_theta)
    )


def generate_dir(
    normals: jnp.ndarray,
    num_samples: int,
    key: jax.Array,
    mode: str = "uniform",
    roughness: Optional[jnp.ndarray] = None,
    pre_mode: str = "hammersley",
    samples: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sample directions on the hemisphere about each normal.

    The TPU equivalent of reference utils/sample_util.py:63-146.

    Args:
        normals: [B, 3] surface normals.
        num_samples: static sample count S.
        key: PRNG key for the toroidal shift / independent samples.
        mode: 'uniform' (pdf 1/2π), 'cosine' (pdf cosθ/π), or 'importance'
            (GGX half-vector NDF importance sampling; requires `roughness`).
        roughness: [B, 1] for mode='importance'.
        pre_mode: 'hammersley' or 'independent'.
        samples: optional precomputed [B, S, 2] samples (overrides pre_mode).

    Returns:
        [B, S, 3] directions (unit up to the reference's epsilon conventions).
        For 'importance' these are *half-vectors* to be reflected about the
        view direction, exactly as the reference uses them.
    """
    b = normals.shape[0]
    n, u, v = build_onb(normals)
    n = n[:, None, :]
    u = u[:, None, :]
    v = v[:, None, :]
    if samples is None:
        samples = stratified_samples(key, b, num_samples, pre_mode)

    mode = mode.lower()
    if mode == "uniform":
        cos_theta = 1.0 - samples[..., 0:1]
    elif mode == "cosine":
        cos_theta = jnp.sqrt(1.0 - samples[..., 0:1])
    elif mode == "importance":
        if roughness is None:
            raise ValueError("mode='importance' requires roughness")
        a = (roughness * roughness)[:, None, :]  # [B, 1, 1]
        u1 = samples[..., 0:1]
        cos_theta = jnp.sqrt((1.0 - u1) / (1.0 + (a * a - 1.0) * u1))
        # clamp exactly as the reference does to keep the backward finite
        cos_theta = jnp.clip(cos_theta, -1.0 + TINY_NUMBER, 1.0 - TINY_NUMBER)
    else:
        raise ValueError(f"unknown sampling mode: {mode!r}")

    return _map_hemisphere(samples, n, u, v, cos_theta)


@partial(jax.jit, static_argnames=("num_samples", "mode", "pre_mode"))
def generate_dir_jit(
    normals: jnp.ndarray,
    key: jax.Array,
    num_samples: int,
    mode: str = "uniform",
    roughness: Optional[jnp.ndarray] = None,
    pre_mode: str = "hammersley",
) -> jnp.ndarray:
    return generate_dir(
        normals, num_samples, key, mode=mode, roughness=roughness, pre_mode=pre_mode
    )


def reflect(view: jnp.ndarray, half: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reflect the view direction about sampled half-vectors.

    Matches reference models/mat_nvdiffrast.py:235-236:
    ``l = 2·(v·h)·h - v`` with v·h clamped to [0, 1].

    Args:
        view: [B, 3] unit vectors from surface point toward the camera.
        half: [B, S, 3] sampled half-vectors.
    Returns:
        (light_dirs [B, S, 3], vdh [B, S, 1]).
    """
    vdh = jnp.clip(
        jnp.sum(half * view[:, None, :], axis=-1, keepdims=True), 0.0, 1.0
    )
    return 2.0 * vdh * half - view[:, None, :], vdh
