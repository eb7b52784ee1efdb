"""Atlas tensor parallelism: row-sharded mip pyramids over the device mesh.

SURVEY §2.2's third axis — textures larger than one chip's HBM.  A 4096²
roughness atlas plus mips, Adam moments, and gradients is ~1 GB fp32; an
8192² albedo atlas at the same accounting is ~16 GB and no longer fits a
single v5e chip.  The reference has no answer (single GPU, reference
trainer/exp_runner.py:47-52); the TPU-native answer is the embedding-table
sharding pattern:

  * the atlas (and every mip level large enough) is sharded along texel
    ROWS across the mesh's ``atlas`` axis — parameters, optimizer state,
    gradients, and the in-step pyramid all live 1/D-per-chip;
  * lookups are the classic sharded-embedding fetch: every device gathers
    the four bilinear corners it OWNS (per-corner owner masks — a corner
    pair may straddle a shard boundary), and one ``psum`` over the atlas
    axis assembles the full bilinear result;
  * the mip chain is built with LOCAL 2×2 pooling while each device's row
    count stays even (global 2×2 blocks never cross a shard boundary when
    rows-per-device is even), then the last sharded level is
    ``all_gather``-ed — a few KB — and the tiny tail levels are computed
    replicated.  No halo exchange is ever needed.

The backward pass needs no custom code: the psum transposes to an identity
(cotangents are replicated), each device scatter-adds into its own shard,
and the all_gather transposes to a psum_scatter back to the owning shard —
exactly the collectives a hand-written TP gradient would use, inserted by
shard_map's transpose rules.

Numerics match ops.texture.texture_sample bit-for-bit (same corner math,
same pyramid); tests/test_atlas_tp.py asserts forward and gradient parity
against the unsharded sampler on an 8-device mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ATLAS_AXIS = "atlas"


def make_atlas_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.local_devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ATLAS_AXIS,))


def _level_shapes(h: int, w: int, max_levels: Optional[int]) -> list:
    """Mip shapes, identical stopping rule to ops.texture.build_mip_pyramid."""
    shapes = [(h, w)]
    while True:
        h_, w_ = shapes[-1]
        if h_ < 2 or w_ < 2 or h_ % 2 or w_ % 2:
            break
        if max_levels is not None and len(shapes) >= max_levels + 1:
            break
        shapes.append((h_ // 2, w_ // 2))
    return shapes


@dataclasses.dataclass(frozen=True)
class AtlasTPSpec:
    """Host-side layout of a row-sharded mip pyramid.

    Levels 0..n_big-1 are sharded (H_l divisible by n_shards); the tail is
    replicated.  Per-level tables are device constants used by the fetch.
    """

    n_shards: int
    n_big: int
    n_levels: int
    heights: Tuple[int, ...]       # global H_l
    widths: Tuple[int, ...]
    local_offsets: Tuple[int, ...]  # into the per-device flat big buffer
    tail_offsets: Tuple[int, ...]   # into the replicated flat tail buffer
    big_rows_local: int             # total rows in flat_big per device
    tail_rows: int

    @staticmethod
    def build(h: int, w: int, n_shards: int, max_levels: Optional[int] = None
              ) -> "AtlasTPSpec":
        if h % n_shards:
            raise ValueError(
                f"atlas height {h} not divisible by {n_shards} shards"
            )
        shapes = _level_shapes(h, w, max_levels)
        n_big = sum(1 for (hh, _) in shapes if hh % n_shards == 0)
        local_offsets, tail_offsets = [], []
        big_off = tail_off = 0
        for l, (hh, ww) in enumerate(shapes):
            if l < n_big:
                local_offsets.append(big_off)
                tail_offsets.append(0)
                big_off += (hh // n_shards) * ww
            else:
                local_offsets.append(0)
                tail_offsets.append(tail_off)
                tail_off += hh * ww
        return AtlasTPSpec(
            n_shards=n_shards,
            n_big=n_big,
            n_levels=len(shapes),
            heights=tuple(hh for hh, _ in shapes),
            widths=tuple(ww for _, ww in shapes),
            local_offsets=tuple(local_offsets),
            tail_offsets=tuple(tail_offsets),
            big_rows_local=big_off,
            tail_rows=tail_off,
        )


def _pool2(x: jnp.ndarray) -> jnp.ndarray:
    h, w = x.shape[0], x.shape[1]
    return x.reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3))


def tp_build_pyramid_local(
    tex_local: jnp.ndarray, spec: AtlasTPSpec
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inside shard_map: local rows of the base -> (flat_big_local, flat_tail).

    flat_big_local: [big_rows_local * W-varying, C] — this device's rows of
    every sharded level, concatenated level-major.
    flat_tail: [tail_rows, C] — the replicated small levels (identical on
    every device; zeros row if there is no tail).
    """
    c = tex_local.shape[-1]
    levels = [tex_local]
    for _ in range(1, spec.n_big):
        levels.append(_pool2(levels[-1]))
    flat_big = jnp.concatenate([l.reshape(-1, c) for l in levels], axis=0)

    if spec.n_levels > spec.n_big:
        gathered = jax.lax.all_gather(
            levels[-1], ATLAS_AXIS, axis=0, tiled=True
        )
        tail = []
        cur = gathered
        for _ in range(spec.n_big, spec.n_levels):
            cur = _pool2(cur)
            tail.append(cur)
        flat_tail = jnp.concatenate([t.reshape(-1, c) for t in tail], axis=0)
    else:
        flat_tail = jnp.zeros((1, c), tex_local.dtype)
    return flat_big, flat_tail


def _tables(spec: AtlasTPSpec):
    i32 = lambda t: jnp.asarray(t, jnp.int32)
    return (
        i32(spec.heights), i32(spec.widths),
        i32(spec.local_offsets), i32(spec.tail_offsets),
    )


def tp_fetch_level_local(
    flat_big: jnp.ndarray,
    flat_tail: jnp.ndarray,
    spec: AtlasTPSpec,
    level: jnp.ndarray,   # [B] int32
    uv: jnp.ndarray,      # [B, 2]
    boundary: str = "wrap",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked bilinear fetch at a per-sample level, inside shard_map.

    Returns (big_part, tail_part): big_part holds only corners THIS device
    owns and must be psum'd over ATLAS_AXIS; tail_part is replicated and
    must NOT be psum'd.  Per-corner owner masks handle bilinear footprints
    that straddle a shard boundary (and wrap-around to row 0)."""
    heights, widths, local_off, tail_off = _tables(spec)
    my = jax.lax.axis_index(ATLAS_AXIS)
    d = spec.n_shards

    h = jnp.take(heights, level)
    w = jnp.take(widths, level)
    hf = h.astype(uv.dtype)
    wf = w.astype(uv.dtype)
    x = uv[..., 0] * wf - 0.5
    y = uv[..., 1] * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if boundary == "wrap":
        wrap = lambda i, n: jnp.mod(i, n)
    else:
        wrap = lambda i, n: jnp.clip(i, 0, n - 1)
    xs = (wrap(x0i, w), wrap(x0i + 1, w))
    ys = (wrap(y0i, h), wrap(y0i + 1, h))

    is_big = level < spec.n_big
    lrows = jnp.maximum(h // d, 1)
    loff = jnp.take(local_off, level)
    toff = jnp.take(tail_off, level)

    def corner(r, c_):
        owner = r // lrows
        lr = r - owner * lrows
        # non-owned / wrong-family indices are out of range on purpose —
        # "clip" (not the NaN-filling default) keeps the fetch finite and
        # the owner mask zeroes both the value and its cotangent
        big_idx = loff + lr * w + c_
        t_big = jnp.take(
            flat_big, big_idx.reshape(-1), axis=0, mode="clip"
        ).reshape(big_idx.shape + (flat_big.shape[-1],))
        t_big = t_big * (is_big & (owner == my))[..., None]
        tail_idx = toff + r * w + c_
        t_tail = jnp.take(
            flat_tail, tail_idx.reshape(-1), axis=0, mode="clip"
        ).reshape(tail_idx.shape + (flat_tail.shape[-1],))
        t_tail = t_tail * (~is_big)[..., None]
        return t_big, t_tail

    b00, t00 = corner(ys[0], xs[0])
    b01, t01 = corner(ys[0], xs[1])
    b10, t10 = corner(ys[1], xs[0])
    b11, t11 = corner(ys[1], xs[1])

    def lerp(c00, c01, c10, c11):
        top = c00 * (1 - fx) + c01 * fx
        bot = c10 * (1 - fx) + c11 * fx
        return top * (1 - fy) + bot * fy

    return lerp(b00, b01, b10, b11), lerp(t00, t01, t10, t11)


def tp_sample_local(
    flat_big: jnp.ndarray,
    flat_tail: jnp.ndarray,
    spec: AtlasTPSpec,
    uv: jnp.ndarray,
    lod: Optional[jnp.ndarray],
    boundary: str = "wrap",
) -> jnp.ndarray:
    """Trilinear (linear-mipmap-linear) sample inside shard_map; performs
    the psum.  Matches ops.texture.texture_sample numerically."""
    if lod is None or spec.n_levels == 1:
        lo = jnp.zeros(uv.shape[:-1], jnp.int32)
        big, tail = tp_fetch_level_local(
            flat_big, flat_tail, spec, lo, uv, boundary
        )
        return jax.lax.psum(big, ATLAS_AXIS) + tail

    lod = jnp.clip(lod, 0.0, spec.n_levels - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, spec.n_levels - 1)
    frac = (lod - lo.astype(lod.dtype))[..., None]

    big_lo, tail_lo = tp_fetch_level_local(
        flat_big, flat_tail, spec, lo, uv, boundary
    )
    big_hi, tail_hi = tp_fetch_level_local(
        flat_big, flat_tail, spec, hi, uv, boundary
    )
    big = big_lo * (1 - frac) + big_hi * frac
    tail = tail_lo * (1 - frac) + tail_hi * frac
    return jax.lax.psum(big, ATLAS_AXIS) + tail


def tp_texture_sample(
    mesh: Mesh,
    tex: jnp.ndarray,
    uv: jnp.ndarray,
    lod: Optional[jnp.ndarray] = None,
    max_levels: Optional[int] = None,
    boundary: str = "wrap",
) -> jnp.ndarray:
    """Standalone sharded mip-sample: `tex` sharded over rows, `uv`/`lod`
    replicated, replicated output.  The full pipeline (build + fetch) runs
    in one shard_map so the pyramid never materializes unsharded."""
    spec = AtlasTPSpec.build(
        tex.shape[0], tex.shape[1], mesh.devices.size, max_levels
    )

    def body(tex_local, uv_, lod_):
        flat_big, flat_tail = tp_build_pyramid_local(tex_local, spec)
        return tp_sample_local(flat_big, flat_tail, spec, uv_, lod_, boundary)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(ATLAS_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(tex, uv, jnp.zeros(uv.shape[:-1], jnp.float32) if lod is None else lod)


def shard_atlas(mesh: Mesh, tex: jnp.ndarray) -> jnp.ndarray:
    """Place an atlas with rows sharded over the mesh (params/opt state
    then stay sharded through elementwise optimizer updates)."""
    return jax.device_put(tex, NamedSharding(mesh, P(ATLAS_AXIS)))


def tp_sample_materials(
    mesh: Mesh,
    albedo: jnp.ndarray,
    roughness: jnp.ndarray,
    uv: jnp.ndarray,       # [B, 2] replicated
    lod_a: jnp.ndarray,    # [B]
    lod_r: jnp.ndarray,
    max_levels: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The Mat step's differentiable fetches with both atlases row-sharded:
    returns replicated (albedo_px, roughness_px, roughness_womip_px).
    One shard_map covers pyramid build + all three lookups, so gradients
    land directly on the parameter shards (reference dr.texture calls,
    models/mat_nvdiffrast.py:128-139, under atlas TP)."""
    d = mesh.devices.size
    spec_a = AtlasTPSpec.build(albedo.shape[0], albedo.shape[1], d, max_levels)
    spec_r = AtlasTPSpec.build(
        roughness.shape[0], roughness.shape[1], d, max_levels
    )

    def body(alb_local, rgh_local, uv_, la, lr):
        a_big, a_tail = tp_build_pyramid_local(alb_local, spec_a)
        r_big, r_tail = tp_build_pyramid_local(rgh_local, spec_r)
        alb = tp_sample_local(a_big, a_tail, spec_a, uv_, la)
        rgh = tp_sample_local(r_big, r_tail, spec_r, uv_, lr)
        # non-mipmapped roughness (reference stage-1 path): base level only
        lvl0 = jnp.zeros(uv_.shape[:-1], jnp.int32)
        w_big, w_tail = tp_fetch_level_local(r_big, r_tail, spec_r, lvl0, uv_)
        womip = jax.lax.psum(w_big, ATLAS_AXIS) + w_tail
        return alb, rgh, womip

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(ATLAS_AXIS), P(ATLAS_AXIS), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(albedo, roughness, uv, lod_a, lod_r)
