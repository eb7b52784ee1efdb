"""Differentiable texture sampling: bilinear, grid_sample, mip pyramids.

This is the TPU replacement for the two samplers the reference leans on:

  * ``nvdiffrast dr.texture(..., 'linear-mipmap-linear', max_mip_level)`` —
    the *differentiable* path into the material / IrT atlases (reference
    models/mat_nvdiffrast.py:128-139).  Here: ``build_mip_pyramid`` +
    ``texture_sample``.  The pyramid is built *inside* the jitted step by
    2×2 box filtering, which XLA differentiates for free — gradients at any
    mip level flow back to the base atlas through the pooling, so no custom
    scatter VJP is needed for correctness (the gather backward is XLA
    scatter-add; a segment-sum Pallas VJP can be swapped in for speed).
  * ``F.grid_sample(..., mode, padding_mode='border', align_corners=False)``
    — used for TBL atlas lookups (reference models/mat_nvdiffrast.py:316) and
    the cube↔pano warps (utils/Cube2Pano.py:136).  Here: ``grid_sample``
    with identical coordinate conventions (x↔width first, [-1,1] range,
    half-texel align_corners=False mapping).

Texture layout convention: ``tex[row, col, channel]`` with uv=(u,v) mapping
to ``col = u·W - 0.5``, ``row = v·H - 0.5`` (v=0 is row 0).  Loaders are
responsible for any vertical flips so that device code never branches.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# index helpers
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def take_segsum(flat: jnp.ndarray, idx: jnp.ndarray, num_rows: int):
    """jnp.take(flat, idx, axis=0) with a sorted segment-sum backward.

    XLA's transpose of a gather is a scatter-add, which serializes on
    duplicate indices; sorting the cotangents by texel id first and
    accumulating with a sorted segment sum is measurably faster at
    Mat-step shapes (SURVEY hard-part #2, VERDICT round-1 #8 — see
    PERF.md round 2 for the numbers).  Numerically identical: both
    compute the same per-texel sums, floating-point reassociation aside.

    idx gets no gradient (integer); use where uv/lod gradients are not
    required through the *indices* — weight gradients are unaffected
    because they flow through the multiply outside the take.
    """
    del num_rows
    return jnp.take(flat, idx, axis=0)


def _take_segsum_fwd(flat, idx, num_rows):
    return jnp.take(flat, idx, axis=0), idx


def _take_segsum_bwd(num_rows, idx, g):
    order = jnp.argsort(idx)
    grad = jax.ops.segment_sum(
        jnp.take(g, order, axis=0),
        jnp.take(idx, order),
        num_segments=num_rows,
        indices_are_sorted=True,
    )
    return grad, None


take_segsum.defvjp(_take_segsum_fwd, _take_segsum_bwd)

# module switch: texture_sample's pyramid fetches use the segment-sum
# backward when True (toggled from model code / benchmarks)
SEGSUM_BACKWARD = False


def _take_rows(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    if SEGSUM_BACKWARD:
        return take_segsum(flat, idx, flat.shape[0])
    return jnp.take(flat, idx, axis=0)


def _wrap_index(i: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.mod(i, n)


def _clamp_index(i: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.clip(i, 0, n - 1)


def _gather2d(tex: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """tex[row, col] for arbitrary-shaped integer index arrays.

    Flattens to a single 1D gather — the layout XLA lowers best on TPU."""
    h, w = tex.shape[0], tex.shape[1]
    flat = tex.reshape(h * w, -1)
    idx = row * w + col
    out = jnp.take(flat, idx.reshape(-1), axis=0)
    return out.reshape(idx.shape + (tex.shape[-1],))


# ---------------------------------------------------------------------------
# bilinear fetch
# ---------------------------------------------------------------------------


def bilinear_sample(
    tex: jnp.ndarray,
    uv: jnp.ndarray,
    boundary: str = "wrap",
) -> jnp.ndarray:
    """Bilinear texture fetch at uv ∈ [0,1]² (nvdiffrast convention).

    Args:
        tex: [H, W, C].
        uv: [..., 2] with uv[..., 0]=u (width), uv[..., 1]=v (height).
        boundary: 'wrap' (nvdiffrast default), 'clamp' (border), or 'zero'.
    Returns:
        [..., C]
    """
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if boundary == "wrap":
        xs = (_wrap_index(x0i, w), _wrap_index(x0i + 1, w))
        ys = (_wrap_index(y0i, h), _wrap_index(y0i + 1, h))
        weight = None
    elif boundary == "clamp":
        xs = (_clamp_index(x0i, w), _clamp_index(x0i + 1, w))
        ys = (_clamp_index(y0i, h), _clamp_index(y0i + 1, h))
        weight = None
    elif boundary == "zero":
        inb = lambda i, n: (i >= 0) & (i < n)
        xs = (_clamp_index(x0i, w), _clamp_index(x0i + 1, w))
        ys = (_clamp_index(y0i, h), _clamp_index(y0i + 1, h))
        weight = (
            (inb(x0i, w), inb(x0i + 1, w)),
            (inb(y0i, h), inb(y0i + 1, h)),
        )
    else:
        raise ValueError(f"unknown boundary mode: {boundary!r}")

    t00 = _gather2d(tex, ys[0], xs[0])
    t01 = _gather2d(tex, ys[0], xs[1])
    t10 = _gather2d(tex, ys[1], xs[0])
    t11 = _gather2d(tex, ys[1], xs[1])
    if weight is not None:
        (wx0, wx1), (wy0, wy1) = weight
        t00 = t00 * (wx0 & wy0)[..., None]
        t01 = t01 * (wx1 & wy0)[..., None]
        t10 = t10 * (wx0 & wy1)[..., None]
        t11 = t11 * (wx1 & wy1)[..., None]

    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def nearest_sample(
    tex: jnp.ndarray, uv: jnp.ndarray, boundary: str = "clamp"
) -> jnp.ndarray:
    """Nearest-neighbor fetch at uv ∈ [0,1]²."""
    h, w = tex.shape[0], tex.shape[1]
    x = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    y = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    if boundary == "wrap":
        x, y = _wrap_index(x, w), _wrap_index(y, h)
    else:
        x, y = _clamp_index(x, w), _clamp_index(y, h)
    return _gather2d(tex, y, x)


# ---------------------------------------------------------------------------
# torch-style grid_sample (for warp/TBL parity)
# ---------------------------------------------------------------------------


def grid_sample(
    tex: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample semantics on an [H, W, C] texture.

    Args:
        tex: [H, W, C].
        grid: [..., 2]; grid[..., 0]=x ∈ [-1,1] (width), grid[..., 1]=y (height).
        mode: 'bilinear' or 'nearest'.
        padding_mode: 'border' or 'zeros'.
        align_corners: False → pixel center mapping ((g+1)·size - 1)/2.
    Returns:
        [..., C]
    """
    h, w = tex.shape[0], tex.shape[1]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5

    if mode == "nearest":
        # torch rounds to nearest (round-half-away from floor(x+0.5))
        xi = jnp.floor(x + 0.5).astype(jnp.int32)
        yi = jnp.floor(y + 0.5).astype(jnp.int32)
        if padding_mode == "border":
            return _gather2d(tex, _clamp_index(yi, h), _clamp_index(xi, w))
        inb = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))[..., None]
        out = _gather2d(tex, _clamp_index(yi, h), _clamp_index(xi, w))
        return out * inb

    # bilinear — express in uv space and reuse bilinear_sample
    u = (x + 0.5) / w
    v = (y + 0.5) / h
    uv = jnp.stack([u, v], axis=-1)
    if padding_mode == "border":
        return bilinear_sample(tex, uv, boundary="clamp")
    return bilinear_sample(tex, uv, boundary="zero")


# ---------------------------------------------------------------------------
# mip pyramid
# ---------------------------------------------------------------------------


def build_mip_pyramid(
    tex: jnp.ndarray, max_levels: Optional[int] = None
) -> List[jnp.ndarray]:
    """Box-filtered mip chain [base, base/2, ...] (nvdiffrast's mip build).

    Differentiable: each level is a 2×2 mean of the previous.  Non-square and
    non-power-of-two sizes stop when a dimension becomes odd or 1.
    """
    levels = [tex]
    while True:
        cur = levels[-1]
        h, w = cur.shape[0], cur.shape[1]
        if h < 2 or w < 2 or h % 2 or w % 2:
            break
        if max_levels is not None and len(levels) >= max_levels + 1:
            break
        nxt = cur.reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3))
        levels.append(nxt)
    return levels


def compute_lod(
    uv_img: jnp.ndarray, tex_h: int, tex_w: int
) -> jnp.ndarray:
    """Per-pixel mip LOD from image-space finite differences of uv.

    Equivalent of nvdiffrast's rast_db→texd path: nvdiffrast computes
    analytic screen-space uv derivatives from the rasterizer's barycentric
    differentials; with ray-cast G-buffers the same quantity is the
    neighbouring-pixel uv difference.  Edge pixels replicate their neighbor.

    Args:
        uv_img: [..., H, W, 2] uv per pixel.
    Returns:
        [..., H, W] LOD = log2(max texel footprint), clamped at 0.
    """
    du_x = jnp.diff(uv_img, axis=-2, append=uv_img[..., :, -1:, :])
    du_x = du_x.at[..., :, -1, :].set(du_x[..., :, -2, :])
    du_y = jnp.diff(uv_img, axis=-3, append=uv_img[..., -1:, :, :])
    du_y = du_y.at[..., -1, :, :].set(du_y[..., -2, :, :])
    scale = jnp.asarray([tex_w, tex_h], uv_img.dtype)
    fx = jnp.linalg.norm(du_x * scale, axis=-1)
    fy = jnp.linalg.norm(du_y * scale, axis=-1)
    footprint = jnp.maximum(jnp.maximum(fx, fy), 1e-12)
    return jnp.maximum(jnp.log2(footprint), 0.0)


def _flat_pyramid_fetch(
    flat: jnp.ndarray,
    offsets: jnp.ndarray,
    widths: jnp.ndarray,
    heights: jnp.ndarray,
    level: jnp.ndarray,
    uv: jnp.ndarray,
    boundary: str,
    rng_xy: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Bilinear fetch at a per-sample mip level from a flattened pyramid.

    The pyramid levels are concatenated into one [total, C] array; per
    sample, the level's (offset, width, height) are tiny-table lookups and
    the four corner fetches are gathers into the flat array — so the cost is
    8 gathers per trilinear sample regardless of pyramid depth (the naive
    sample-every-level form costs 4·n_levels).

    rng_xy: optional [..., 2] uniforms — stochastic bilinear: fetch ONE
    corner (x1 with probability fx, y1 with probability fy) instead of
    blending four.  Unbiased estimator of the bilinear result (the corner
    weights ARE the selection probabilities) that cuts both the forward
    gathers and the backward scatter-adds 4x."""
    w = jnp.take(widths, level).astype(uv.dtype)
    h = jnp.take(heights, level).astype(uv.dtype)
    off = jnp.take(offsets, level)
    wi = jnp.take(widths, level)
    hi_ = jnp.take(heights, level)

    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    if boundary == "wrap":
        xs = (jnp.mod(x0i, wi), jnp.mod(x0i + 1, wi))
        ys = (jnp.mod(y0i, hi_), jnp.mod(y0i + 1, hi_))
    else:
        xs = (jnp.clip(x0i, 0, wi - 1), jnp.clip(x0i + 1, 0, wi - 1))
        ys = (jnp.clip(y0i, 0, hi_ - 1), jnp.clip(y0i + 1, 0, hi_ - 1))

    def fetch(yy, xx):
        idx = off + yy * wi + xx
        out = _take_rows(flat, idx.reshape(-1))
        return out.reshape(idx.shape + (flat.shape[-1],))

    if rng_xy is not None:
        xi = jnp.where(rng_xy[..., 0] < fx[..., 0], xs[1], xs[0])
        yi = jnp.where(rng_xy[..., 1] < fy[..., 0], ys[1], ys[0])
        return fetch(yi, xi)

    t00 = fetch(ys[0], xs[0])
    t01 = fetch(ys[0], xs[1])
    t10 = fetch(ys[1], xs[0])
    t11 = fetch(ys[1], xs[1])
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def texture_sample(
    pyramid: Sequence[jnp.ndarray],
    uv: jnp.ndarray,
    lod: Optional[jnp.ndarray] = None,
    boundary: str = "wrap",
    rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sample a mip pyramid with trilinear (linear-mipmap-linear) filtering.

    nvdiffrast dr.texture equivalent (reference models/mat_nvdiffrast.py:131).

    Args:
        pyramid: list of [H/2^k, W/2^k, C] levels from build_mip_pyramid.
        uv: [..., 2] in [0,1].
        lod: [...] mip level per sample; None → bilinear on the base level.
        boundary: texel addressing mode.
        rng: optional uniforms in [0,1) — stochastic mip sampling.
            Shape [...]: stochastic LOD — sample ONE level per tap (hi with
            probability frac(lod)) instead of blending two; halves the
            gather/scatter volume.  Shape [..., 3]: stochastic LOD (col 0)
            + stochastic BILINEAR (cols 1-2: one corner, x1/y1 with
            probability fx/fy) — ONE gather per sample, an 8x cut vs
            trilinear.  Both are unbiased estimators of the trilinear
            result (XLA's TPU gather/scatter issue ~0.14 G elem/s is the
            dominant texture cost, PERF.md).  Intended for the MC training
            stages, whose 16-spp specular noise dwarfs the added variance.
            Gradient caveat: in rng mode, fx/fy/frac appear only inside
            where-conditions, so gradients w.r.t. uv and lod are identically
            zero — the estimator is unbiased for the TEXTURE-parameter
            gradient only.  Safe here (uv/lod come from stop_gradient'd
            G-buffers); do not differentiate uv/lod through the rng paths.
    Returns:
        [..., C]
    """
    if lod is None or len(pyramid) == 1:
        return bilinear_sample(pyramid[0], uv, boundary)

    n_levels = len(pyramid)
    c = pyramid[0].shape[-1]
    sizes = [p.shape[0] * p.shape[1] for p in pyramid]
    offsets = jnp.asarray(np.cumsum([0] + sizes[:-1]), jnp.int32)
    widths = jnp.asarray([p.shape[1] for p in pyramid], jnp.int32)
    heights = jnp.asarray([p.shape[0] for p in pyramid], jnp.int32)
    flat = jnp.concatenate([p.reshape(-1, c) for p in pyramid], axis=0)

    lod = jnp.clip(lod, 0.0, n_levels - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_levels - 1)
    frac = (lod - lo.astype(lod.dtype))[..., None]

    if rng is not None:
        # explicit shape contract (no mode-sniffing): lod.shape = LOD-only
        # uniforms; lod.shape+(3,) = LOD + the two bilinear-corner uniforms
        rng_xy = None
        if rng.ndim == lod.ndim + 1:
            if rng.shape != lod.shape + (3,):
                raise ValueError(
                    "texture_sample rng must have shape lod.shape (stochastic"
                    f" LOD) or lod.shape+(3,) (+stochastic bilinear); got"
                    f" rng {rng.shape} for lod {lod.shape}"
                )
            rng, rng_xy = rng[..., 0], rng[..., 1:]
        elif rng.shape != lod.shape:
            raise ValueError(
                "texture_sample rng must have shape lod.shape (stochastic"
                f" LOD) or lod.shape+(3,) (+stochastic bilinear); got"
                f" rng {rng.shape} for lod {lod.shape}"
            )
        lvl = jnp.where(rng >= frac[..., 0], lo, hi)
        return _flat_pyramid_fetch(
            flat, offsets, widths, heights, lvl, uv, boundary, rng_xy=rng_xy
        )

    out_lo = _flat_pyramid_fetch(flat, offsets, widths, heights, lo, uv, boundary)
    out_hi = _flat_pyramid_fetch(flat, offsets, widths, heights, hi, uv, boundary)
    return out_lo * (1.0 - frac) + out_hi * frac


def texture_sample_mipmapped(
    tex: jnp.ndarray,
    uv_img: jnp.ndarray,
    max_mip_level: Optional[int] = None,
    boundary: str = "wrap",
) -> jnp.ndarray:
    """Convenience: build pyramid + per-pixel LOD + trilinear sample.

    Args:
        tex: [H, W, C] base texture.
        uv_img: [..., Himg, Wimg, 2] image-shaped uv map (LOD needs the image
            neighborhood structure).
    """
    pyramid = build_mip_pyramid(tex, max_levels=max_mip_level)
    lod = compute_lod(uv_img, tex.shape[0], tex.shape[1])
    return texture_sample(pyramid, uv_img, lod, boundary)
