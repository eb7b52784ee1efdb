"""Pallas TPU kernel for shared-origin ray-fan intersection.

The XLA fan stream (ops.fan_raycast) is VPU-bound but pays XLA overheads:
per-scan-step leaf-row gathers, materialized where/select intermediates, and
scan bookkeeping.  This kernel removes all of it:

  * grid = (fan blocks × leaf blocks); leaf rows stream through SMEM as
    *sequentially DMA'd blocks* — the kernel performs ZERO dynamic gathers;
  * ray directions and the closest-hit state (t, prim, u, v) stay resident
    in VMEM across the whole leaf dimension (the matmul-accumulator
    pattern: the output block is revisited for every leaf block);
  * the per-triangle plane-dual intersection runs as straight-line VPU code
    on [TF, R] register tiles.

It is exhaustive over leaves (the correct configuration for closed indoor
scenes, where conservative beam culling cannot capture occlusion — see
ops/fan_raycast.py); culled/tiled variants remain in XLA.

Leaf rows use the FanScene layout (ops.fan_raycast.FAN_ROW_WIDTH = 72);
padded rows/triangles are all-zero → zero normal → no hit, so no validity
bookkeeping is needed in the inner loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.ops.fan_raycast import (
    FAN_ROW_WIDTH,
    FAN_ROW_WIDTH_UV,
    _TRI_BASE,
    _TRI_STRIDE,
    _UV_BASE,
    FanScene,
)
from texir_code_tpu.ops.raycast import RayHit, Vec3s

_DET_EPS = 1e-12
_BARY_EPS = 1e-7

# Test hook: when True, dispatch sites (query_tbl_auto, render_gbuffer,
# MaterialModel) take the Pallas path in interpreter mode even on CPU, so
# the exact kernel wiring the TPU uses is exercised by the CPU test suite.
FORCE_INTERPRET = False


def resolve_interpret(interpret: bool = False) -> bool:
    """interpret flag for a pallas_call, honoring the FORCE_INTERPRET hook
    (interpret is a static jit arg, so flipping the hook re-traces)."""
    return bool(interpret or FORCE_INTERPRET)


def force_pallas_dispatch() -> bool:
    """Should auto-dispatchers prefer the Pallas path regardless of backend?"""
    return FORCE_INTERPRET


def _kernel(origins_ref, dx_ref, dy_ref, dz_ref, rows_ref, prim_rows_ref,
            t_ref, prim_ref, u_ref, v_ref, *, lb: int, t_min: float,
            emit_uv: bool = False, per_ray_origins: bool = False):
    from jax.experimental import pallas as pl

    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        t_ref[:] = jnp.full_like(t_ref, jnp.inf)
        prim_ref[:] = jnp.full_like(prim_ref, -1)
        u_ref[:] = jnp.zeros_like(u_ref)
        v_ref[:] = jnp.zeros_like(v_ref)

    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    if per_ray_origins:
        # origins_ref is [TF, 3*R]: x | y | z contiguous slabs
        r = dx.shape[1]
        ox = origins_ref[:, 0:r]
        oy = origins_ref[:, r:2 * r]
        oz = origins_ref[:, 2 * r:3 * r]
    else:
        ox = origins_ref[:, 0:1]
        oy = origins_ref[:, 1:2]
        oz = origins_ref[:, 2:3]

    t_best = t_ref[:]
    prim = prim_ref[:]
    u_best = u_ref[:]
    v_best = v_ref[:]

    for j in range(lb):          # static unroll over the leaf block
        for tri in range(4):
            base = _TRI_BASE + _TRI_STRIDE * tri
            nx = rows_ref[j, base]
            ny = rows_ref[j, base + 1]
            nz = rows_ref[j, base + 2]
            dist = rows_ref[j, base + 3]
            s1x = rows_ref[j, base + 4]
            s1y = rows_ref[j, base + 5]
            s1z = rows_ref[j, base + 6]
            p0s1 = rows_ref[j, base + 7]
            s2x = rows_ref[j, base + 8]
            s2y = rows_ref[j, base + 9]
            s2z = rows_ref[j, base + 10]
            p0s2 = rows_ref[j, base + 11]
            prim_id = prim_rows_ref[j, tri]

            no = nx * ox + ny * oy + nz * oz            # [TF, 1]
            ou = s1x * ox + s1y * oy + s1z * oz - p0s1
            ov = s2x * ox + s2y * oy + s2z * oz - p0s2

            nd = nx * dx + ny * dy + nz * dz            # [TF, R]
            ok_nd = jnp.abs(nd) > _DET_EPS
            inv_nd = jnp.where(ok_nd, 1.0 / jnp.where(ok_nd, nd, 1.0), 0.0)
            t = (dist - no) * inv_nd
            du = s1x * dx + s1y * dy + s1z * dz
            dv = s2x * dx + s2y * dy + s2z * dz
            uu = ou + t * du
            vv = ov + t * dv
            ok = (
                ok_nd
                & (uu >= -_BARY_EPS)
                & (vv >= -_BARY_EPS)
                & (uu + vv <= 1.0 + _BARY_EPS)
                & (t > t_min)
                & (t < t_best)
            )
            t_best = jnp.where(ok, t, t_best)
            prim = jnp.where(ok, prim_id, prim)
            if emit_uv:
                # atlas uv at the hit: tu0 + u·du1 + v·du2 (and likewise v)
                ub = _UV_BASE + 6 * tri
                au = rows_ref[j, ub] + uu * rows_ref[j, ub + 1] + vv * rows_ref[j, ub + 2]
                av = rows_ref[j, ub + 3] + uu * rows_ref[j, ub + 4] + vv * rows_ref[j, ub + 5]
                u_best = jnp.where(ok, au, u_best)
                v_best = jnp.where(ok, av, v_best)
            else:
                u_best = jnp.where(ok, uu, u_best)
                v_best = jnp.where(ok, vv, v_best)

    t_ref[:] = t_best
    prim_ref[:] = prim
    u_ref[:] = u_best
    v_ref[:] = v_best


@functools.partial(
    jax.jit,
    static_argnames=(
        "fan_block", "leaf_block", "t_min", "interpret", "fan_chunk", "emit_uv",
    ),
)
def cast_ray_fans_pallas(
    scene: FanScene,
    origins: Vec3s,
    dirs: Vec3s,
    t_min: float = 0.0,
    fan_block: int = 8,
    leaf_block: int = 16,
    interpret: bool = False,
    fan_chunk: int = 4096,
    emit_uv: bool = False,
) -> RayHit:
    """Exhaustive fan intersection on the Pallas kernel.

    With emit_uv=True the returned RayHit's (u, v) carry the interpolated
    ATLAS texture coordinates of the hit instead of barycentrics (requires a
    FanScene built with triangle_uvs) — the bake path then needs no
    per-corner uv gathers at all.

    Args:
        origins: 3×[T] per-fan origins; dirs: 3×[T, R] (R multiple of 128).
        fan_block / leaf_block: VMEM tile sizes (TF fans × R rays state;
            LB leaf rows in SMEM per step).
        fan_chunk: fans per kernel launch — bounds each launch's output
            footprint so XLA's memory-space coloring for fused consumers
            can never push a full-size result into VMEM.
    Returns:
        RayHit of shape [T, R].
    """
    t_all = dirs[0].shape[0]
    if t_all > fan_chunk:
        outs = []
        for s in range(0, t_all, fan_chunk):
            sl = slice(s, min(s + fan_chunk, t_all))
            outs.append(
                cast_ray_fans_pallas(
                    scene,
                    tuple(a[sl] for a in origins),
                    tuple(a[sl] for a in dirs),
                    t_min=t_min, fan_block=fan_block, leaf_block=leaf_block,
                    interpret=interpret, fan_chunk=fan_chunk, emit_uv=emit_uv,
                )
            )
        return RayHit(
            t=jnp.concatenate([o.t for o in outs]),
            prim=jnp.concatenate([o.prim for o in outs]),
            u=jnp.concatenate([o.u for o in outs]),
            v=jnp.concatenate([o.v for o in outs]),
        )
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_fans, r = dirs[0].shape
    l = scene.rows.shape[0]

    tf = fan_block
    lb = leaf_block
    t_pad = (-t_fans) % tf
    l_pad = (-l) % lb
    rows = scene.rows
    row_w = rows.shape[1]
    if l_pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((l_pad, row_w), rows.dtype)]
        )
    # prim ids as their own int32 SMEM array (Mosaic has no scalar bitcast)
    prim_rows = jax.lax.bitcast_convert_type(rows[:, 8:12], jnp.int32)
    prim_rows = jnp.pad(prim_rows, ((0, 0), (0, 4)), constant_values=-1)
    o_pack = jnp.stack(
        [origins[0], origins[1], origins[2]], axis=-1
    )  # [T, 3]
    d = dirs
    if t_pad:
        o_pack = jnp.concatenate([o_pack, jnp.zeros((t_pad, 3))])
        d = tuple(jnp.concatenate([a, jnp.zeros((t_pad, r))]) for a in d)
    o_pack = jnp.pad(o_pack, ((0, 0), (0, 5)))  # [T, 8] for tiling

    grid = ((t_fans + t_pad) // tf, (l + l_pad) // lb)

    if emit_uv and rows.shape[1] < FAN_ROW_WIDTH_UV:
        raise ValueError("emit_uv requires a FanScene built with triangle_uvs")
    kernel = functools.partial(_kernel, lb=lb, t_min=t_min, emit_uv=emit_uv)
    out_shape = [
        jax.ShapeDtypeStruct(((t_fans + t_pad), r), jnp.float32),
        jax.ShapeDtypeStruct(((t_fans + t_pad), r), jnp.int32),
        jax.ShapeDtypeStruct(((t_fans + t_pad), r), jnp.float32),
        jax.ShapeDtypeStruct(((t_fans + t_pad), r), jnp.float32),
    ]
    fan_spec = pl.BlockSpec((tf, r), lambda f, li: (f, 0), memory_space=pltpu.VMEM)
    out_specs = [fan_spec] * 4

    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tf, 8), lambda f, li: (f, 0), memory_space=pltpu.VMEM),
            fan_spec, fan_spec, fan_spec,
            pl.BlockSpec(
                (lb, row_w), lambda f, li: (li, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (lb, 8), lambda f, li: (li, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(o_pack, d[0], d[1], d[2], rows, prim_rows)

    return RayHit(
        t=t[:t_fans], prim=prim[:t_fans], u=u[:t_fans], v=v[:t_fans]
    )


@functools.partial(
    jax.jit,
    static_argnames=("fan_block", "leaf_block", "t_min", "interpret", "emit_uv"),
)
def cast_rays_pallas_stream(
    scene: FanScene,
    origins: Vec3s,
    dirs: Vec3s,
    t_min: float = 0.0,
    fan_block: int = 8,
    leaf_block: int = 32,
    interpret: bool = False,
    emit_uv: bool = False,
) -> RayHit:
    """Exhaustive leaf-stream intersection for rays with PER-RAY origins.

    The general-ray sibling of cast_ray_fans_pallas (Mat-stage specular rays
    have one origin per pixel): same zero-gather leaf streaming, with the
    origin components resident in VMEM alongside the directions (~25% more
    VPU work per test than the shared-origin fan mode).

    Args:
        origins / dirs: 3-tuples of [T, R] float32 (flatten any ray batch
            into rows; R must be a multiple of 128).
    Returns:
        RayHit of shape [T, R].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_rows, r = dirs[0].shape
    l = scene.rows.shape[0]
    tf = fan_block
    lb = leaf_block
    t_pad = (-t_rows) % tf
    l_pad = (-l) % lb
    rows = scene.rows
    row_w = rows.shape[1]
    if l_pad:
        rows = jnp.concatenate([rows, jnp.zeros((l_pad, row_w), rows.dtype)])
    prim_rows = jax.lax.bitcast_convert_type(rows[:, 8:12], jnp.int32)
    prim_rows = jnp.pad(prim_rows, ((0, 0), (0, 4)), constant_values=-1)

    o_pack = jnp.concatenate([origins[0], origins[1], origins[2]], axis=1)
    d = dirs
    if t_pad:
        o_pack = jnp.concatenate([o_pack, jnp.zeros((t_pad, 3 * r))])
        d = tuple(jnp.concatenate([a, jnp.zeros((t_pad, r))]) for a in d)

    grid = ((t_rows + t_pad) // tf, (l + l_pad) // lb)
    if emit_uv and row_w < FAN_ROW_WIDTH_UV:
        raise ValueError("emit_uv requires a FanScene built with triangle_uvs")
    kernel = functools.partial(
        _kernel, lb=lb, t_min=t_min, emit_uv=emit_uv, per_ray_origins=True
    )
    out_shape = [
        jax.ShapeDtypeStruct(((t_rows + t_pad), r), jnp.float32),
        jax.ShapeDtypeStruct(((t_rows + t_pad), r), jnp.int32),
        jax.ShapeDtypeStruct(((t_rows + t_pad), r), jnp.float32),
        jax.ShapeDtypeStruct(((t_rows + t_pad), r), jnp.float32),
    ]
    fan_spec = pl.BlockSpec((tf, r), lambda f, li: (f, 0), memory_space=pltpu.VMEM)

    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tf, 3 * r), lambda f, li: (f, 0), memory_space=pltpu.VMEM),
            fan_spec, fan_spec, fan_spec,
            pl.BlockSpec((lb, row_w), lambda f, li: (li, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((lb, 8), lambda f, li: (li, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[fan_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(o_pack, d[0], d[1], d[2], rows, prim_rows)

    return RayHit(
        t=t[:t_rows], prim=prim[:t_rows], u=u[:t_rows], v=v[:t_rows]
    )
