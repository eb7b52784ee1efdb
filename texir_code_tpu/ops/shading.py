"""Physically based shading: Cook-Torrance BRDF terms and MC estimators.

TPU-native equivalent of the reference's shading math:

  * ``hdr_scale`` / ``hdr_recover``            — reference utils/general.py:61-69
  * ``tonemap`` / ``mse_to_psnr``              — reference utils/general.py:71-85
  * ``rgb_to_intensity``                       — reference utils/general.py:95-112
  * ``fresnel_schlick_ue4``, ``smith_g``       — reference models/mat_nvdiffrast.py:268-273
  * ``specular_estimator``                     — reference models/mat_nvdiffrast.py:260-279
  * ``diffuse_estimator`` (uniform/cosine MC)  — reference models/mat_nvdiffrast.py:252-258
  * ``lambertian_diffuse`` (IrT path)          — reference models/mat_nvdiffrast.py:232

Everything is elementwise fp32 VPU work; callers batch pixels × samples so XLA
fuses the whole chain into the surrounding kernel.  The reference's epsilon
conventions (TINY / TINY_TINY clamps) are preserved bit-for-bit in structure —
they are what keeps backward passes NaN-free at grazing angles.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from texir_code_tpu.ops.sampling import TINY_NUMBER, TINY_TINY_NUMBER

# ---------------------------------------------------------------------------
# HDR domain helpers
# ---------------------------------------------------------------------------


def hdr_scale(img: jnp.ndarray, base: float = math.e) -> jnp.ndarray:
    """log-domain compression: log(1+x)/log(base)."""
    return jnp.log(img + 1.0) / math.log(base)


def hdr_recover(img: jnp.ndarray, base: float = math.e) -> jnp.ndarray:
    """Inverse of hdr_scale: base**x - 1."""
    return jnp.power(base, img) - 1.0


def tonemap(img: jnp.ndarray) -> jnp.ndarray:
    """Gamma-2.2 tonemapping clamped to [0, 1]."""
    return jnp.clip(jnp.power(jnp.clip(img, 0.0, None), 1.0 / 2.2), 0.0, 1.0)


def mse_to_psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR assuming peak value 1."""
    return -10.0 / math.log(10.0) * jnp.log(mse)


def rgb_to_intensity(rgb: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma over the last axis: [..., 3] -> [..., 1]."""
    return (
        0.29900 * rgb[..., 0:1] + 0.58700 * rgb[..., 1:2] + 0.11400 * rgb[..., 2:3]
    )


def get_mip_level(n: int) -> int:
    """Number of trailing zero bits (mip count of a power-of-two texture)."""
    count = 0
    while not (n & 1 or n == 1):
        n >>= 1
        count += 1
    return count


# ---------------------------------------------------------------------------
# Cook-Torrance terms
# ---------------------------------------------------------------------------


def _cdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Clamped dot product along the last axis, kept as [..., 1]."""
    return jnp.clip(jnp.sum(a * b, axis=-1, keepdims=True), 0.0, 1.0)


def fresnel_schlick_ue4(vdh: jnp.ndarray, f0: float = 0.04) -> jnp.ndarray:
    """Schlick Fresnel with the UE4 spherical-gaussian exponent approximation.

    f = f0 + (1-f0) · 2^((-5.55472·vdh - 6.98316)·vdh)
    (reference models/mat_nvdiffrast.py:268).
    """
    return f0 + (1.0 - f0) * jnp.power(2.0, (-5.55472 * vdh - 6.98316) * vdh)


def smith_g(
    ndv: jnp.ndarray, ndl: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """Smith geometry term with the UE4 direct-lighting k = (r+1)²/8.

    g1(x) = x / max(x·(1-k) + k, TINY_TINY) (reference models/mat_nvdiffrast.py:270-273).
    """
    k = (roughness + 1.0) * (roughness + 1.0) / 8.0
    g1_ndv = ndv / jnp.clip(ndv * (1.0 - k) + k, TINY_TINY_NUMBER, None)
    g1_ndl = ndl / jnp.clip(ndl * (1.0 - k) + k, TINY_TINY_NUMBER, None)
    return g1_ndl * g1_ndv


def ggx_d(ndh: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """GGX/Trowbridge-Reitz NDF with α = roughness² (for the full-BRDF eval
    paths used by the baseline heads and the path-traced tester)."""
    a2 = jnp.square(jnp.square(roughness))
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    return a2 / jnp.clip(jnp.pi * denom * denom, TINY_TINY_NUMBER, None)


# ---------------------------------------------------------------------------
# Monte-Carlo reflectance estimators
# ---------------------------------------------------------------------------


def lambertian_diffuse(irradiance: jnp.ndarray, albedo: jnp.ndarray) -> jnp.ndarray:
    """Diffuse shading from a pre-integrated irradiance (the IrT path):
    irr · albedo / π (reference models/mat_nvdiffrast.py:232)."""
    return irradiance * albedo / jnp.pi


def diffuse_estimator(
    lighting: jnp.ndarray,
    light_dirs: jnp.ndarray,
    normal: jnp.ndarray,
    albedo: jnp.ndarray,
    sample_type: str = "uniform",
) -> jnp.ndarray:
    """MC estimate of diffuse reflectance, summed over the sample axis.

    uniform sampling: Σ L·(albedo/π)·ndl·2π   (divide by S at the call site)
    cosine sampling:  Σ L·(albedo/π)·π
    (reference models/mat_nvdiffrast.py:252-258; the reference also divides
    by the sample count at its call sites, e.g. :226.)

    Args:
        lighting: [B, S, 3] incident radiance per sampled direction.
        light_dirs: [B, S, 3].
        normal: [B, 3].
        albedo: [B, 3].
    Returns:
        [B, 3] (NOT divided by the sample count).
    """
    brdf = albedo[:, None, :] / jnp.pi
    if sample_type == "cosine":
        return jnp.sum(lighting * brdf * jnp.pi, axis=1)
    ndl = _cdot(normal[:, None, :], light_dirs)
    return jnp.sum(lighting * brdf * ndl * 2.0 * jnp.pi, axis=1)


def specular_estimator(
    lighting: jnp.ndarray,
    half: jnp.ndarray,
    normal: jnp.ndarray,
    view: jnp.ndarray,
    light_dirs: jnp.ndarray,
    roughness: jnp.ndarray,
) -> jnp.ndarray:
    """GGX importance-sampled Cook-Torrance specular estimator.

    With half-vectors drawn proportionally to D·ndh/(4·vdh), the estimator is

        Σ  L · [F·G / max(4·ndl·ndv, ε)] · ndl · 4·vdh / max(ndh, ε)

    (divide by S at the call site), which is exactly
    reference models/mat_nvdiffrast.py:260-279 — the D term cancels against
    the pdf, so only F and G appear.

    Args:
        lighting: [B, S, 3] incident radiance along `light_dirs`.
        half: [B, S, 3] sampled half-vectors.
        normal: [B, 3].
        view: [B, 3] unit vectors toward the camera.
        light_dirs: [B, S, 3] reflected directions.
        roughness: [B, 1].
    Returns:
        [B, 3] (NOT divided by the sample count).
    """
    n = normal[:, None, :]
    v = view[:, None, :]
    r = roughness[:, None, :]

    vdh = _cdot(half, v)
    ndl = _cdot(n, light_dirs)
    ndh = _cdot(n, half)
    ndv = _cdot(n, v)

    f = fresnel_schlick_ue4(vdh)
    g = smith_g(ndv, ndl, r)
    brdf = f * g / jnp.clip(4.0 * ndl * ndv, TINY_TINY_NUMBER, None)
    weight = brdf * ndl * 4.0 * vdh / jnp.clip(ndh, TINY_TINY_NUMBER, None)
    return jnp.sum(lighting * weight, axis=1)


def irradiance_estimator_soa(
    lighting,
    light_dirs,
    normal,
    num_samples: int,
):
    """SoA irradiance: lighting 3×[B, S], dirs 3×[B, S], normal 3×[B]
    → 3×[B].  Same estimator as irradiance_estimator."""
    ndl = jnp.clip(
        normal[0][:, None] * light_dirs[0]
        + normal[1][:, None] * light_dirs[1]
        + normal[2][:, None] * light_dirs[2],
        0.0, 1.0,
    )
    scale = 2.0 * jnp.pi / num_samples
    return tuple(jnp.sum(lighting[k] * ndl, axis=1) * scale for k in range(3))


def specular_estimator_soa(
    lighting,
    half,
    normal,
    view,
    light_dirs,
    roughness: jnp.ndarray,
):
    """SoA Cook-Torrance specular: lighting/half/light_dirs 3×[B, S],
    normal/view 3×[B], roughness [B] → 3×[B].  Same math as
    specular_estimator (reference models/mat_nvdiffrast.py:260-279)."""

    def bdot(a_b, b_bs):
        return jnp.clip(
            a_b[0][:, None] * b_bs[0]
            + a_b[1][:, None] * b_bs[1]
            + a_b[2][:, None] * b_bs[2],
            0.0, 1.0,
        )

    vdh = bdot(view, half)
    ndl = bdot(normal, light_dirs)
    ndh = bdot(normal, half)
    ndv = jnp.clip(
        normal[0] * view[0] + normal[1] * view[1] + normal[2] * view[2], 0.0, 1.0
    )[:, None]

    f = fresnel_schlick_ue4(vdh)
    r = roughness[:, None]
    k = (r + 1.0) * (r + 1.0) / 8.0
    g1_ndv = ndv / jnp.clip(ndv * (1.0 - k) + k, TINY_TINY_NUMBER, None)
    g1_ndl = ndl / jnp.clip(ndl * (1.0 - k) + k, TINY_TINY_NUMBER, None)
    g = g1_ndl * g1_ndv
    brdf = f * g / jnp.clip(4.0 * ndl * ndv, TINY_TINY_NUMBER, None)
    weight = brdf * ndl * 4.0 * vdh / jnp.clip(ndh, TINY_TINY_NUMBER, None)
    return tuple(jnp.sum(lighting[k2] * weight, axis=1) for k2 in range(3))


def irradiance_estimator(
    lighting: jnp.ndarray,
    light_dirs: jnp.ndarray,
    normal: jnp.ndarray,
    num_samples: Optional[int] = None,
) -> jnp.ndarray:
    """Uniform-hemisphere MC irradiance: Σ L·ndl·2π / S.

    This is the NIrF ground-truth integrand (reference
    models/tracer_o3d_irrf.py:121-122) and the IrT bake estimator
    (reference models/tracer_o3d_irt.py:165-174).

    Args:
        lighting: [B, S, 3]; light_dirs: [B, S, 3]; normal: [B, 3].
    Returns:
        [B, 3].
    """
    s = num_samples if num_samples is not None else lighting.shape[-2]
    ndl = _cdot(normal[:, None, :], light_dirs)
    return jnp.sum(lighting * ndl, axis=1) * (2.0 * jnp.pi / s)
