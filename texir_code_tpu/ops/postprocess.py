"""IrT post-processing: seam padding and MC-noise denoising.

Replaces the reference's offline tool chain for the baked irradiance texture
(tools/padding_texture.py:49-87): a distance-transform nearest-texel fill of
the black chart seams followed by an external OIDN binary
(`oidnDenoise --hdr`).  Here:

  * ``pad_texture`` — scipy EDT nearest-valid-texel fill (host-side, same
    algorithm as the reference's cv2.distanceTransform usage).
  * ``atrous_denoise`` — edge-preserving à-trous wavelet denoiser in JAX
    (the standard MC-denoising fallback when OIDN is unavailable): several
    dilated 5×5 B3-spline passes with range (radiance-difference) weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pad_texture(texture: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Fill invalid texels with their nearest valid texel's value.

    Args:
        texture: [H, W, C].
        valid: [H, W] bool.
    """
    from scipy import ndimage

    if valid.all():
        return texture
    # indices of the nearest valid texel for every position
    _, (ir, ic) = ndimage.distance_transform_edt(
        ~valid, return_indices=True
    )
    return texture[ir, ic]


_B3 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _atrous_pass(
    img: jnp.ndarray, guide: jnp.ndarray, step: int, sigma_r: float
) -> jnp.ndarray:
    """One à-trous pass: dilated 5×5 B3 kernel with range weights."""
    h, w, c = img.shape
    acc = jnp.zeros_like(img)
    wacc = jnp.zeros(img.shape[:2] + (1,))
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            kw = _B3[dy + 2] * _B3[dx + 2]
            shifted = jnp.roll(img, (-dy * step, -dx * step), axis=(0, 1))
            g_shift = jnp.roll(guide, (-dy * step, -dx * step), axis=(0, 1))
            diff = jnp.sum((guide - g_shift) ** 2, axis=-1, keepdims=True)
            rw = jnp.exp(-diff / jnp.maximum(sigma_r, 1e-8))
            wgt = kw * rw
            acc = acc + shifted * wgt
            wacc = wacc + wgt
    return acc / jnp.maximum(wacc, 1e-8)


@jax.jit
def atrous_denoise(
    img: jnp.ndarray, passes: int = 3, sigma_r: float = 0.25
) -> jnp.ndarray:
    """Edge-preserving denoise of an HDR texture ([H, W, C]).

    Works in log space (hdr_scale) so the range weight is exposure-invariant,
    like OIDN's HDR mode."""
    log = jnp.log1p(jnp.maximum(img, 0.0))
    out = log
    for p in range(passes):
        out = _atrous_pass(out, out, 1 << p, sigma_r)
    return jnp.expm1(out)
