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


def hammersley_azimuth_sorted(n: int) -> jnp.ndarray:
    """The Hammersley set reordered by u2 (the azimuth coordinate).

    Same sample SET as `hammersley` — order-invariant estimators are
    unaffected — but consecutive chunks of the reordered sequence map to
    contiguous azimuth arcs of the hemisphere.  A per-row toroidal shift
    rotates every arc by the same amount, so chunks stay contiguous arcs of
    exactly equal sample count: this is what gives the culled wedge tracer
    (ops.pallas_culled) tight per-chunk direction cones with zero runtime
    sorting."""
    h = hammersley_np(n)
    order = np.argsort(h[:, 1], kind="stable")
    return jnp.asarray(h[order])


def normalize(x: jnp.ndarray, eps: float = TINY_NUMBER) -> jnp.ndarray:
    """x / (||x|| + eps) along the last axis (reference's norm_axis)."""
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


# SoA component-tuple type (see ops.raycast for the layout rationale: [.., 3]
# arrays pad 3 → 128 lanes on TPU; component arrays tile near-1×)
Vec3s = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _soa_norm(v: Vec3s, eps: float = TINY_NUMBER) -> Vec3s:
    n = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]) + eps
    return (v[0] / n, v[1] / n, v[2] / n)


def _soa_cross(a: Vec3s, b: Vec3s) -> Vec3s:
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def build_onb_soa(normals: Vec3s) -> Tuple[Vec3s, Vec3s, Vec3s]:
    """SoA orthonormal basis (n, U, V) about each normal.

    Matches reference utils/sample_util.py:84-91: helper axis is (0,1,0)
    where |n.x| > 0.99 else (1,0,0); U = normalize(cross(axis, n));
    V = normalize(cross(n, U))."""
    big = jnp.abs(normals[0]) > 0.99
    ax: Vec3s = (
        jnp.where(big, 0.0, 1.0),
        jnp.where(big, 1.0, 0.0),
        jnp.zeros_like(normals[0]),
    )
    n = _soa_norm(normals)
    u = _soa_norm(_soa_cross(ax, n))
    v = _soa_norm(_soa_cross(n, u))
    return n, u, v


def build_onb(normals: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """AoS wrapper of build_onb_soa: [..., 3] in/out."""
    n, u, v = build_onb_soa((normals[..., 0], normals[..., 1], normals[..., 2]))
    stack = lambda t: jnp.stack(t, axis=-1)
    return stack(n), stack(u), stack(v)


def stratified_samples(
    key: jax.Array,
    batch: int,
    num_samples: int,
    pre_mode: str = "hammersley",
    row_keys: Optional[jax.Array] = None,
    base: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[batch, num_samples, 2] 2D sample points in (0, 1).

    pre_mode 'hammersley': the Hammersley set with one random toroidal shift
    per batch row (reference utils/sample_util.py:93-108), clamped to
    [TINY, 1-TINY] to protect the GGX-mapping backward from NaNs.
    pre_mode 'independent': iid uniforms (reference :109-111).

    row_keys: optional [batch] per-row PRNG keys.  When given, each row's
    randomness is a pure function of its own key — this is what makes a
    sharded bake bit-identical for any device count (fold the *global*
    texel/pixel id into the key, then split the batch freely).
    """
    if pre_mode.lower() == "hammersley":
        if base is None:
            base = hammersley(num_samples)
        base = base[None, :, :]  # [1, S, 2]
        if row_keys is not None:
            shift = jax.vmap(lambda k: jax.random.uniform(k, (1, 2)))(row_keys)
        else:
            shift = jax.random.uniform(key, (batch, 1, 2))
        samples = jnp.mod(base + shift, 1.0)
    elif pre_mode == "independent":
        if row_keys is not None:
            samples = jax.vmap(
                lambda k: jax.random.uniform(k, (num_samples, 2))
            )(row_keys)
        else:
            samples = jax.random.uniform(key, (batch, num_samples, 2))
    else:
        raise ValueError(f"unknown pre_mode: {pre_mode!r}")
    return jnp.clip(samples, TINY_NUMBER, 1.0 - TINY_NUMBER)


def generate_dir_soa(
    normals: Vec3s,
    num_samples: int,
    key: jax.Array,
    mode: str = "uniform",
    roughness: Optional[jnp.ndarray] = None,
    pre_mode: str = "hammersley",
    samples: Optional[jnp.ndarray] = None,
    row_keys: Optional[jax.Array] = None,
    base: Optional[jnp.ndarray] = None,
) -> Vec3s:
    """Sample hemisphere directions, SoA: normals are 3×[B], output 3×[B, S].

    The TPU equivalent of reference utils/sample_util.py:63-146.

    Args:
        normals: (nx, ny, nz) each [B].
        num_samples: static sample count S.
        key: PRNG key for the toroidal shift / independent samples.
        mode: 'uniform' (pdf 1/2π), 'cosine' (pdf cosθ/π), or 'importance'
            (GGX half-vector NDF importance sampling; requires `roughness`).
        roughness: [B] or [B, 1] for mode='importance'.
        pre_mode: 'hammersley' or 'independent'.
        samples: optional precomputed [B, S, 2] samples (overrides pre_mode).
        row_keys: optional [B] per-row keys for sharding-invariant RNG
            (see stratified_samples).

    Returns:
        (lx, ly, lz) each [B, S].  For 'importance' these are *half-vectors*
        to be reflected about the view direction, as the reference uses them.
    """
    b = normals[0].shape[0]
    n, u, v = build_onb_soa(normals)
    if samples is None:
        samples = stratified_samples(key, b, num_samples, pre_mode, row_keys, base)
    u1 = samples[..., 0]  # [B, S]
    u2 = samples[..., 1]

    mode = mode.lower()
    if mode == "uniform":
        cos_theta = 1.0 - u1
    elif mode == "cosine":
        cos_theta = jnp.sqrt(1.0 - u1)
    elif mode == "importance":
        if roughness is None:
            raise ValueError("mode='importance' requires roughness")
        r = roughness.reshape(b, 1)
        a = r * r
        cos_theta = jnp.sqrt((1.0 - u1) / (1.0 + (a * a - 1.0) * u1))
        # clamp exactly as the reference does to keep the backward finite
        cos_theta = jnp.clip(cos_theta, -1.0 + TINY_NUMBER, 1.0 - TINY_NUMBER)
    else:
        raise ValueError(f"unknown sampling mode: {mode!r}")

    phi = 2.0 * jnp.pi * u2 - jnp.pi
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta * cos_theta, 0.0, 1.0))
    sp = jnp.sin(phi) * sin_theta
    cp = -(jnp.cos(phi) * sin_theta)
    return tuple(
        v[k][:, None] * sp + n[k][:, None] * cos_theta + u[k][:, None] * cp
        for k in range(3)
    )


def generate_dir(
    normals: jnp.ndarray,
    num_samples: int,
    key: jax.Array,
    mode: str = "uniform",
    roughness: Optional[jnp.ndarray] = None,
    pre_mode: str = "hammersley",
    samples: Optional[jnp.ndarray] = None,
    row_keys: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """AoS wrapper of generate_dir_soa: normals [B, 3] → dirs [B, S, 3]."""
    soa = generate_dir_soa(
        (normals[..., 0], normals[..., 1], normals[..., 2]),
        num_samples, key, mode=mode,
        roughness=roughness, pre_mode=pre_mode, samples=samples,
        row_keys=row_keys,
    )
    return jnp.stack(soa, axis=-1)


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


def reflect_soa(view: Vec3s, half: Vec3s) -> Tuple[Vec3s, jnp.ndarray]:
    """SoA reflect: view 3×[B], half 3×[B, S] → (light 3×[B, S], vdh [B, S]).

    Matches reference models/mat_nvdiffrast.py:235-236:
    ``l = 2·(v·h)·h - v`` with v·h clamped to [0, 1]."""
    vdh = jnp.clip(
        half[0] * view[0][:, None]
        + half[1] * view[1][:, None]
        + half[2] * view[2][:, None],
        0.0, 1.0,
    )
    light = tuple(2.0 * vdh * half[k] - view[k][:, None] for k in range(3))
    return light, vdh


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
