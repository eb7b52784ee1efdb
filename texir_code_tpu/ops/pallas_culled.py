"""Culled Pallas fan tracing — sub-linear in scene size.

The exhaustive leaf-stream kernel (ops.pallas_fan) is the right shape for a
single convex room, but its cost is O(rays x leaves): on scan-scale meshes
(reference models/tracer_o3d_irt.py:156-174 bakes against hundreds of
thousands of triangles) throughput decays as 1/leaves.  This module restores
the O(log)-like behaviour CPU BVHs get from per-ray early termination, in a
form the TPU's lockstep SIMD can execute:

  1. **Direction wedges.**  Each fan's S hemisphere directions are sorted by
     octant and split into G equal chunks ("wedges") of R = S/G rays.  A
     wedge is a tight direction cone; a block of TF=8 wedge-rows (same wedge
     octant, 8 spatially-adjacent fans) has a tight joint cone and origin box.
  2. **Static cone culling.**  Per (block, cluster-of-leaves): swept-beam
     overlap + front-halfspace tests (as ops.fan_raycast) produce a candidate
     cluster list, sorted near-to-far by a conservative origin-box -> AABB
     distance bound.
  3. **Dynamic occlusion early-exit.**  The kernel walks its candidate list
     nearest-first with double-buffered HBM->SMEM DMAs and stops as soon as
     the next cluster's distance bound exceeds every ray's current hit t —
     the block-granular equivalent of per-ray any-hit termination.  In a
     closed room the walk ends at the wall the wedge faces, not the scene
     diameter, so work per ray tracks *visible* geometry, not total geometry.

Results are exact (bit-equal hits to the exhaustive stream up to triangle
visit order): every cluster that could contain a closer hit is by
construction inside the candidate prefix that gets visited.

Leaf rows reuse the FanScene plane-dual layout (ops.fan_raycast), re-packed
cluster-major [C, LB, 128] so each candidate is one aligned DMA.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.ops.fan_raycast import (
    FAN_ROW_WIDTH_UV,
    _TRI_BASE,
    _TRI_STRIDE,
    _UV_BASE,
    FanScene,
)
from texir_code_tpu.ops.raycast import RayHit, Vec3s

_DET_EPS = 1e-12
_BARY_EPS = 1e-7
_ROW_PAD = 128          # cluster rows padded to one lane-aligned tile row
_PRIM_ROWS = 8          # [C, 8, 128] int32 (i32 tile sublane minimum)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ClusterScene:
    """Cluster-major leaf rows + cluster AABBs (a pytree).

    Attributes:
        rows3: [C, LB, 128] float32 — FanScene rows grouped into clusters of
            LB consecutive leaves (BVH DFS order = spatially coherent),
            padded to 128 columns for aligned DMA.
        prims3: [C, 8, 128] int32 — prim ids; prims3[c, 0, 4*j + k] is
            triangle k of row j.
        cluster_lo / cluster_hi: [C, 3] cluster AABBs (over valid rows only).
        diameter: scene diameter (swept-beam length bound).
    """

    rows3: jnp.ndarray
    prims3: jnp.ndarray
    cluster_lo: jnp.ndarray
    cluster_hi: jnp.ndarray
    diameter: jnp.ndarray
    lb: int = dataclasses.field(default=32)
    has_uv: bool = dataclasses.field(default=False)

    def tree_flatten(self):
        return (
            (self.rows3, self.prims3, self.cluster_lo, self.cluster_hi,
             self.diameter),
            (self.lb, self.has_uv),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, lb=aux[0], has_uv=aux[1])

    @property
    def num_clusters(self) -> int:
        return int(self.rows3.shape[0])

    @classmethod
    def from_fan(
        cls, fan: FanScene, lb: int = 32, dense: bool = False,
        split_planes=None,
    ) -> "ClusterScene":
        """Re-pack a FanScene's leaf rows into DMA-aligned clusters.

        dense=True repacks the triangles 4-per-row ignoring BVH leaf
        boundaries (DFS order preserved): leaves average ~3.6/4 valid
        triangles, so leaf-aligned rows waste ~9% of the kernel's tests
        on padding.  Row AABBs become the union of the contributing
        leaves' AABBs — conservative, so culling stays exact.

        split_planes: optional geometry.occluders.OccluderSet.  Clusters
        that STRADDLE an occluder plane can never be culled by it (the
        blocking test requires the whole cluster strictly behind), and the
        BVH DFS freely packs e.g. floor strips across wall planes.  With
        split_planes, the dense packing starts a fresh lane-aligned
        row/cluster whenever the DFS crosses a plane of the set, so
        behind-wall geometry lands in cullable clusters.  Costs a few
        percent padding; exactness unaffected (packing only)."""
        rows = getattr(fan, "rows_np", None)
        if rows is None:
            rows = np.asarray(fan.rows)
        l, w = rows.shape
        has_uv = w >= FAN_ROW_WIDTH_UV
        if dense:
            rows = _densepack_rows(
                rows, has_uv, split_planes=split_planes, lb=lb
            )
            l = rows.shape[0]
        return cls._from_rows(rows, lb, has_uv, fan.diameter)

    @classmethod
    def proxy_from_fan(
        cls, fan: FanScene, k: int = 1024, lb: int = 8
    ) -> "ClusterScene":
        """Occlusion proxy: the scene's k largest-area triangles.

        In an indoor scan the biggest triangles are the walls/floors/
        ceilings that occlude nearly everything; tracing rays against this
        tiny subset FIRST gives every ray a conservative upper bound on its
        true hit t (proxy triangles ARE scene triangles, so a proxy hit is
        a valid — just possibly non-closest — hit).  Feeding that hit state
        into cast_fans_culled(seed=...) starts each exit group's occlusion
        threshold at ~room scale instead of inf, so the candidate walk
        stops at the walls of the ray's own room rather than streaming the
        scene's far tail.  Exactness is preserved (see cast_fans_culled).
        """
        rows = getattr(fan, "rows_np", None)
        if rows is None:
            rows = np.asarray(fan.rows)
        has_uv = rows.shape[1] >= FAN_ROW_WIDTH_UV
        prims = rows[:, 8:12].view(np.int32)
        li, ki = np.nonzero(prims >= 0)
        # |n| = |e1 x e2| = 2*area — the plane rows carry n directly
        base = _TRI_BASE + _TRI_STRIDE * ki
        n = rows[li[:, None], base[:, None] + np.arange(3)]
        area = np.sqrt((n * n).sum(-1))
        k = min(k, len(li))
        top = np.argsort(-area)[:k]
        # keep DFS order inside the proxy (spatial coherence for its cull)
        top = np.sort(top)
        packed = _densepack_rows(rows, has_uv, li=li[top], ki=ki[top])
        return cls._from_rows(packed, lb, has_uv, fan.diameter)

    @classmethod
    def _from_rows(cls, rows, lb, has_uv, diameter) -> "ClusterScene":
        l, w = rows.shape
        c = (l + lb - 1) // lb
        rows3 = np.zeros((c, lb, _ROW_PAD), np.float32)
        rows3[:, :, :w].reshape(c * lb, w)[:l] = rows
        # prim ids live in rows cols 8:12 as float bit patterns
        prims = rows[:, 8:12].view(np.int32)  # [L, 4]
        prims3 = np.full((c, _PRIM_ROWS, _ROW_PAD), -1, np.int32)
        flat = np.full((c * lb, 4), -1, np.int32)
        flat[:l] = prims
        if lb * 4 > _PRIM_ROWS * _ROW_PAD:
            raise ValueError(f"cluster size {lb} > {_PRIM_ROWS * _ROW_PAD // 4}")
        pr = flat.reshape(c, lb * 4)
        full_rows, rem = divmod(lb * 4, _ROW_PAD)
        for rr in range(full_rows):
            prims3[:, rr, :] = pr[:, rr * _ROW_PAD : (rr + 1) * _ROW_PAD]
        if rem:
            prims3[:, full_rows, :rem] = pr[:, full_rows * _ROW_PAD :]

        lo = np.full((c, 3), np.inf, np.float32)
        hi = np.full((c, 3), -np.inf, np.float32)
        for ci in range(c):
            sl = rows[ci * lb : min((ci + 1) * lb, l)]
            # skip all-zero padded leaf rows (they carry no geometry)
            valid = np.abs(sl[:, _TRI_BASE:_TRI_BASE + 3]).sum(axis=1) > 0
            valid |= sl[:, 3:6].sum(axis=1) != sl[:, 0:3].sum(axis=1)
            if valid.any():
                lo[ci] = sl[valid, 0:3].min(axis=0)
                hi[ci] = sl[valid, 3:6].max(axis=0)
            else:
                lo[ci] = 0.0
                hi[ci] = 0.0
        return cls(
            rows3=jnp.asarray(rows3),
            prims3=jnp.asarray(prims3),
            cluster_lo=jnp.asarray(lo),
            cluster_hi=jnp.asarray(hi),
            diameter=diameter,
            lb=lb,
            has_uv=has_uv,
        )


def _densepack_rows(
    rows: np.ndarray, has_uv: bool, li=None, ki=None, split_planes=None,
    lb: int = 1,
) -> np.ndarray:
    """Repack leaf rows' valid triangles densely, 4 per row, DFS order.

    Cols 12:72 are four contiguous stride-15 triangle records and 72:96
    four 6-float uv records, so the repack is a flat reshape; cols 0:6
    (row AABB) become the union of each triangle's source-leaf AABB.
    li/ki optionally select a triangle subset (row, slot indices).

    split_planes + lb: break the packing into fresh lb-aligned cluster
    boundaries whenever consecutive DFS triangles lie in different regions
    of the occluder-plane arrangement (per source-leaf AABB signs:
    strictly-below / on / strictly-above per plane), so no cluster
    straddles a plane of the set (see ClusterScene.from_fan)."""
    l, w = rows.shape
    prims = rows[:, 8:12].view(np.int32)  # [L, 4]
    if li is None:
        li, ki = np.nonzero(prims >= 0)  # row-major → DFS triangle order
    n = len(li)

    if split_planes is not None and n and split_planes.num_occluders:
        # region signature per triangle from its source-leaf AABB
        lo_t = rows[li, 0:3]
        hi_t = rows[li, 3:6]
        m = float(split_planes.sep_margin)
        p_np = np.asarray(split_planes.p)
        seen = set()
        planes = []
        for i in range(split_planes.num_occluders):
            key = (int(split_planes.axis[i]), round(float(p_np[i]), 6))
            if key in seen:
                continue
            seen.add(key)
            planes.append(key)
        sig = np.zeros((n, len(planes)), np.int8)
        for col, (k, p) in enumerate(planes):
            sig[:, col] = np.where(
                hi_t[:, k] <= p - m, 0,
                np.where(lo_t[:, k] >= p + m, 2, 1),
            )
        # region-MAJOR packing: the DFS crosses plane regions thousands of
        # times (run-level breaks measured 100% padding), so triangles are
        # stable-sorted by (region id, morton of leaf center) — one
        # cluster-aligned break per REGION, spatial coherence restored
        # within each region by the morton key
        _, region = np.unique(sig, axis=0, return_inverse=True)
        centers = (lo_t + hi_t) * 0.5
        span = centers.max(axis=0) - centers.min(axis=0) + 1e-9
        q = ((centers - centers.min(axis=0)) / span * 1023).astype(np.int64)

        def _spread(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        morton = (
            _spread(q[:, 0]) | (_spread(q[:, 1]) << 1)
            | (_spread(q[:, 2]) << 2)
        )
        order = np.lexsort((morton, region))
        li, ki = li[order], ki[order]
        region = region[order]
        change = np.concatenate([[True], region[1:] != region[:-1]])
        run_start = np.flatnonzero(change)
        run_len = np.diff(np.concatenate([run_start, [n]]))
        # rows per region, rounded up to whole clusters (lb rows)
        rows_per_run = -(-run_len // 4)
        rows_per_run = -(-rows_per_run // lb) * lb
        run_row0 = np.concatenate([[0], np.cumsum(rows_per_run[:-1])])
        run_of_tri = np.repeat(np.arange(len(run_start)), run_len)
        idx_in_run = np.arange(n) - run_start[run_of_tri]
        row_idx = run_row0[run_of_tri] + idx_in_run // 4
        slot = idx_in_run % 4
        l2 = int(run_row0[-1] + rows_per_run[-1]) if len(run_start) else 0
    else:
        row_idx = np.arange(n) // 4
        slot = np.arange(n) % 4
        l2 = (n + 3) // 4

    tri_cols = (_TRI_BASE + _TRI_STRIDE * ki)[:, None] + np.arange(_TRI_STRIDE)
    tri_rec = np.zeros((l2, 4, _TRI_STRIDE), np.float32)
    tri_rec[row_idx, slot] = rows[li[:, None], tri_cols]

    out = np.zeros((l2, w), np.float32)
    out[:, _TRI_BASE:_TRI_BASE + 4 * _TRI_STRIDE] = tri_rec.reshape(l2, -1)
    if has_uv:
        uv_cols = (_UV_BASE + 6 * ki)[:, None] + np.arange(6)
        uv_rec = np.zeros((l2, 4, 6), np.float32)
        uv_rec[row_idx, slot] = rows[li[:, None], uv_cols]
        out[:, _UV_BASE:_UV_BASE + 24] = uv_rec.reshape(l2, -1)

    pr = np.full((l2, 4), -1, np.int32)
    pr[row_idx, slot] = prims[li, ki]
    out[:, 8:12] = pr.view(np.float32)

    lo = np.full((l2, 4, 3), np.inf, np.float32)
    hi = np.full((l2, 4, 3), -np.inf, np.float32)
    lo[row_idx, slot] = rows[li, 0:3]
    hi[row_idx, slot] = rows[li, 3:6]
    out[:, 0:3] = lo.min(axis=1)
    out[:, 3:6] = hi.max(axis=1)
    # fully-padded rows would carry an infinite AABB; zero it
    bad = ~np.isfinite(out[:, 0:6]).all(axis=1)
    out[bad, 0:6] = 0.0
    return out


# ---------------------------------------------------------------------------
# direction wedges
# ---------------------------------------------------------------------------


def sort_dirs_octant(dirs: Vec3s) -> Vec3s:
    """Sort each fan's directions by octant key (per row of [T, S]).

    The irradiance estimator is order-invariant, so hits can be consumed in
    sorted order — no inverse permutation is ever needed."""
    dx, dy, dz = dirs
    key = (
        (dx < 0).astype(jnp.int32) * 4
        + (dy < 0).astype(jnp.int32) * 2
        + (dz < 0).astype(jnp.int32)
    )
    _, sx, sy, sz = jax.lax.sort(
        (key, dx, dy, dz), dimension=1, num_keys=1
    )
    return (sx, sy, sz)


def wedge_rows(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """[T, S] → [G*T, S/G] wedge-major (row w*T+f = fan f's wedge w)."""
    t, s = x.shape
    return x.reshape(t, g, s // g).transpose(1, 0, 2).reshape(g * t, s // g)


def unwedge_rows(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """Inverse of wedge_rows: [G*T, R] → [T, G*R]."""
    gt, r = x.shape
    t = gt // g
    return x.reshape(g, t, r).transpose(1, 0, 2).reshape(t, g * r)


def tile_rows(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """Per-fan [T] values → per-wedge-row [G*T] (wedge-major)."""
    return jnp.tile(x, (g,))


# ---------------------------------------------------------------------------
# static culling
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _culled_kernel(
    count_ref, cand_ref, dist_ref, tcap_ref,
    o_ref, dx_ref, dy_ref, dz_ref,
    *rest,
    lb: int, t_min: float, emit_uv: bool, per_ray_origins: bool,
    fast_recip: bool = True, debug_emit_visits: bool = False,
    exit_rows: int = 0, emit_prim: bool = True, seeded: bool = False,
    stream_window: int = 0,
):
    """Per-group candidate walks with occlusion early exit.

    The block's rows are split into `exit_rows`-row exit GROUPS (0 = one
    block-wide group).  Each group has its OWN candidate cluster list,
    culled at group granularity (cand/dist/count carry a group axis): the
    16-row origin box + cone is tighter than the 32-row block's, which
    cuts candidate tests ~12% on top of the tighter exit (the block-wide
    exit is gated by the worst ray in the block).  Groups run sequentially
    and reuse the same two DMA slots; each group's exit threshold (max
    over its rays' current t) is a loop carry refreshed once per visit
    from the in-register hit state — refreshing it more often (or from
    the output refs each iteration) costs a cross-lane reduction that
    measurably dominates at fine granularity.

    Hit state lives in the output refs (read-modify-write accumulators),
    initialized once for the whole block.

    tcap_ref holds the exit threshold cap (scene diameter + margin): any
    real hit's t is <= the scene diameter, so without the cap a single
    all-miss ray (padding, open sky) would pin its group's max(t_best)=inf
    and disable the exit.

    emit_prim=False skips the prim-id DMA and the per-triangle prim select
    entirely — the uv-emitting estimator never reads prim, and dropping it
    halves the per-candidate DMA traffic.  prim_ref is then all -1.

    seeded=True initializes the hit accumulators from extra seed inputs
    (an occlusion-proxy pre-trace, see ClusterScene.proxy_from_fan) instead
    of inf/-1/0: each group's exit threshold then starts at the worst
    proxy hit instead of inf, so the walk stops at the walls of the rays'
    own room.  Exact — seed hits are real scene hits, and the strict
    `t < t_best` keeps them unless a genuinely closer triangle appears.

    stream_window=W>0 switches the candidate tables from per-block SMEM
    inputs to HBM (pl.ANY), DMA'd into double-buffered W-entry SMEM
    windows as the walk consumes them.  The per-group SMEM lists cap the
    group count: at er=4 on a 23.5k-cluster scene the 2 x ng x C tables
    exceed SMEM and the kernel fails to COMPILE (PERF.md round 4); the
    stream removes that wall — SMEM holds 2 x 2 x W entries regardless of
    C, at most one window DMA is in flight (started a full window ahead),
    and early exit skips the un-walked windows' DMAs entirely.  Bit-exact:
    the streamed values are the same tables.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rest = list(rest)
    if seeded:
        t0_ref = rest.pop(0)
        p0_ref = rest.pop(0) if emit_prim else None
        u0_ref = rest.pop(0)
        v0_ref = rest.pop(0)
    if stream_window:
        (rows_hbm, prims_hbm, t_ref, prim_ref, u_ref, v_ref,
         rows_s, prims_s, sem, cand_s, dist_s, sem_w) = rest
        b_idx = pl.program_id(0)
    else:
        rows_hbm, prims_hbm, t_ref, prim_ref, u_ref, v_ref, \
            rows_s, prims_s, sem = rest

    c_max = cand_ref.shape[-1]
    t_cap = tcap_ref[0, 0, 0]
    W = stream_window

    tf, r = dx_ref.shape
    er = exit_rows if exit_rows else tf
    ng = tf // er
    slices = [slice(g * er, (g + 1) * er) for g in range(ng)]

    def get_cand(g, j):
        if stream_window:
            return cand_s[jax.lax.rem(j // W, 2), jax.lax.rem(j, W)]
        return cand_ref[0, g, j]

    def win_dmas(slot, g, w):
        """One candidate window (ids + sorted distance bounds) HBM→SMEM."""
        start = w * W
        return [
            pltpu.make_async_copy(
                cand_ref.at[b_idx, g, pl.ds(start, W)],
                cand_s.at[slot], sem_w.at[slot, 0],
            ),
            pltpu.make_async_copy(
                dist_ref.at[b_idx, g, pl.ds(start, W)],
                dist_s.at[slot], sem_w.at[slot, 1],
            ),
        ]

    def dmas(slot, g, j):
        cid = get_cand(g, j)
        cps = [
            pltpu.make_async_copy(
                rows_hbm.at[cid], rows_s.at[slot], sem.at[slot, 0]
            )
        ]
        if emit_prim:
            cps.append(
                pltpu.make_async_copy(
                    prims_hbm.at[cid], prims_s.at[slot], sem.at[slot, 1]
                )
            )
        return cps

    # the output refs ARE the hit accumulators
    if seeded:
        t_ref[:] = t0_ref[:]
        prim_ref[:] = p0_ref[:] if emit_prim else jnp.full(
            (tf, r), -1, jnp.int32
        )
        u_ref[:] = u0_ref[:]
        v_ref[:] = v0_ref[:]
    else:
        t_ref[:] = jnp.full((tf, r), jnp.inf, jnp.float32)
        prim_ref[:] = jnp.full((tf, r), -1, jnp.int32)
        u_ref[:] = jnp.zeros((tf, r), jnp.float32)
        v_ref[:] = jnp.zeros((tf, r), jnp.float32)

    def process_group(g, slot):
        """Test the streamed cluster's lb*4 triangles against rows g."""
        rs = slices[g]
        dx = dx_ref[rs]
        dy = dy_ref[rs]
        dz = dz_ref[rs]
        if per_ray_origins:
            ox = o_ref[rs, 0:r]
            oy = o_ref[rs, r:2 * r]
            oz = o_ref[rs, 2 * r:3 * r]
        else:
            ox = o_ref[rs, 0:1]
            oy = o_ref[rs, 1:2]
            oz = o_ref[rs, 2:3]
        t_best = t_ref[rs]
        u_best = u_ref[rs]
        v_best = v_ref[rs]
        if emit_prim:
            prim = prim_ref[rs]
        for jr in range(lb):
            for tri in range(4):
                base = _TRI_BASE + _TRI_STRIDE * tri
                nx = rows_s[slot, jr, base]
                ny = rows_s[slot, jr, base + 1]
                nz = rows_s[slot, jr, base + 2]
                dist = rows_s[slot, jr, base + 3]
                s1x = rows_s[slot, jr, base + 4]
                s1y = rows_s[slot, jr, base + 5]
                s1z = rows_s[slot, jr, base + 6]
                p0s1 = rows_s[slot, jr, base + 7]
                s2x = rows_s[slot, jr, base + 8]
                s2y = rows_s[slot, jr, base + 9]
                s2z = rows_s[slot, jr, base + 10]
                p0s2 = rows_s[slot, jr, base + 11]

                no = nx * ox + ny * oy + nz * oz
                ou = s1x * ox + s1y * oy + s1z * oz - p0s1
                ov = s2x * ox + s2y * oy + s2z * oz - p0s2

                nd = nx * dx + ny * dy + nz * dz
                # degenerate nd (|nd| <= eps) is rejected by ok_nd below;
                # inv_nd may be inf/nan there, and nan comparisons are
                # false, so no select is needed to keep the lanes safe
                ok_nd = jnp.abs(nd) > _DET_EPS
                if fast_recip:
                    # approx reciprocal (~12 bits) + one Newton step -> f32
                    inv0 = pl.reciprocal(nd, approx=True)
                    inv_nd = inv0 * (2.0 - nd * inv0)
                else:
                    inv_nd = 1.0 / nd
                t = (dist - no) * inv_nd
                du = s1x * dx + s1y * dy + s1z * dz
                dv = s2x * dx + s2y * dy + s2z * dz
                uu = ou + t * du
                vv = ov + t * dv
                ok = (
                    ok_nd
                    & (jnp.minimum(uu, vv) >= -_BARY_EPS)
                    & (uu + vv <= 1.0 + _BARY_EPS)
                    & (t > t_min)
                    & (t < t_best)
                )
                t_best = jnp.where(ok, t, t_best)
                if emit_prim:
                    pk = 4 * jr + tri
                    prim_id = prims_s[slot, pk // _ROW_PAD, pk % _ROW_PAD]
                    prim = jnp.where(ok, prim_id, prim)
                if emit_uv:
                    ub = _UV_BASE + 6 * tri
                    au = (rows_s[slot, jr, ub]
                          + uu * rows_s[slot, jr, ub + 1]
                          + vv * rows_s[slot, jr, ub + 2])
                    av = (rows_s[slot, jr, ub + 3]
                          + uu * rows_s[slot, jr, ub + 4]
                          + vv * rows_s[slot, jr, ub + 5])
                    u_best = jnp.where(ok, au, u_best)
                    v_best = jnp.where(ok, av, v_best)
                else:
                    u_best = jnp.where(ok, uu, u_best)
                    v_best = jnp.where(ok, vv, v_best)
        t_ref[rs] = t_best
        u_ref[rs] = u_best
        v_ref[rs] = v_best
        if emit_prim:
            prim_ref[rs] = prim
        # the group's refreshed exit threshold, from the in-register state
        return jnp.max(t_best)

    for g in range(ng):
        count_g = count_ref[0, g, 0]

        if stream_window:
            # window 0 must land before the first row prefetch reads cand
            @pl.when(count_g > 0)
            def _(g=g):
                for cp in win_dmas(0, g, 0):
                    cp.start()
                for cp in win_dmas(0, g, 0):
                    cp.wait()

            @pl.when(count_g > W)
            def _(g=g):
                for cp in win_dmas(1, g, 1):
                    cp.start()

        @pl.when(count_g > 0)
        def _(g=g):
            for cp in dmas(0, g, 0):
                cp.start()

        def cond(carry, g=g, count_g=count_g):
            j, thr = carry
            if stream_window:
                # window j//W was waited on entry (preamble / crossing);
                # j == count_g reads garbage safely behind the False &
                nxt = dist_s[jax.lax.rem(j // W, 2), jax.lax.rem(j, W)]
            else:
                nxt = dist_ref[0, g, jnp.minimum(j, c_max - 1)]
            return (j < count_g) & (nxt < jnp.minimum(thr, t_cap))

        def body(carry, g=g, count_g=count_g):
            j, thr = carry
            jn = j + 1

            if stream_window:
                # crossing into window w: wait it (started one window
                # ago), then launch w+1 into the slot window w-1 vacated
                @pl.when((jn < count_g) & (jax.lax.rem(jn, W) == 0))
                def _(g=g, jn=jn, count_g=count_g):
                    w = jn // W
                    for cp in win_dmas(jax.lax.rem(w, 2), g, w):
                        cp.wait()

                    @pl.when((w + 1) * W < count_g)
                    def _():
                        for cp in win_dmas(jax.lax.rem(w + 1, 2), g, w + 1):
                            cp.start()

            @pl.when(jn < count_g)
            def _():
                for cp in dmas(jax.lax.rem(jn, 2), g, jn):
                    cp.start()

            for cp in dmas(jax.lax.rem(j, 2), g, j):
                cp.wait()
            thr = process_group(g, jax.lax.rem(j, 2))
            return jn, thr

        j_end, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(jnp.inf))
        )

        # drain the in-flight prefetch if the loop exited early (j_end's
        # DMA was started by the initial prefetch or iteration j_end-1)
        @pl.when((count_g > 0) & (j_end < count_g))
        def _(g=g, count_g=count_g, j_end=j_end):
            for cp in dmas(jax.lax.rem(j_end, 2), g, j_end):
                cp.wait()

        if stream_window:
            # drain the in-flight window: W(w_end+1) was started iff its
            # first entry is within count (at the crossing into w_end, or
            # the preamble for w_end=0) and is only waited on crossing
            w_end = j_end // W

            @pl.when((count_g > 0) & ((w_end + 1) * W < count_g))
            def _(g=g, w_end=w_end):
                for cp in win_dmas(jax.lax.rem(w_end + 1, 2), g, w_end + 1):
                    cp.wait()

        if debug_emit_visits:
            # debug telemetry: u = clusters visited, v = candidate count
            rs = slices[g]
            u_ref[rs] = jnp.full((er, r), j_end.astype(jnp.float32))
            v_ref[rs] = jnp.full((er, r), count_g.astype(jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "fan_block", "t_min", "interpret", "emit_uv", "per_ray",
        "debug_no_cull", "debug_no_exit", "fast_recip", "debug_emit_visits",
        "exit_rows", "emit_prim", "t_cap_frac", "stream_cands",
    ),
)
def cast_fans_culled(
    scene: ClusterScene,
    origins,
    dirs: Vec3s,
    t_min: float = 0.0,
    fan_block: int = 8,
    interpret: bool = False,
    emit_uv: bool = False,
    per_ray: bool = False,
    debug_no_cull: bool = False,
    debug_no_exit: bool = False,
    fast_recip: Optional[bool] = None,
    debug_emit_visits: bool = False,
    exit_rows: int = 0,
    emit_prim: Optional[bool] = None,
    t_cap_frac: Optional[float] = None,
    cull=None,
    seed: Optional[RayHit] = None,
    proxy: Optional[ClusterScene] = None,
    occluders=None,
    stream_cands: Optional[int] = None,
) -> RayHit:
    """Closest-hit trace of wedge rows with culled, early-exiting clusters.

    Args:
        origins: 3×[T'] per-row shared origins (per_ray=False) or 3×[T', R]
            per-ray origins (per_ray=True; culling then uses per-row origin
            boxes).
        dirs: 3×[T', R] directions; R a multiple of 128; rows should be
            direction-coherent (see sort_dirs_octant / wedge_rows).
        t_cap_frac: walk-stop distance as a fraction of the scene diameter
            (default 1.05 = exact trace).  Fractions < 1 TRUNCATE the walk:
            hits with t <= t_cap_frac·diameter are exact; rays beyond are
            left unresolved (t may be inf or a too-far hit) — the two-pass
            entry point (cast_fans_culled_twopass) re-traces them.
        seed: optional RayHit [T', R] of VALID (but possibly non-closest)
            hits used to initialize the kernel's accumulators — per-ray t
            upper bounds that (a) let each group's occlusion exit fire from
            the first visit and (b) truncate the candidate lists at cull
            time (clusters whose distance bound >= the group's worst seed t
            provably cannot improve any ray).  Exact.
        proxy: optional occlusion-proxy ClusterScene
            (ClusterScene.proxy_from_fan) traced internally to produce
            `seed` when seed is None.  Must match emit_uv (has_uv).
        occluders: optional geometry.occluders.OccluderSet of proven
            rectangular occluders — removes provably-occluded clusters from
            the candidate lists at cull time (exact; see cull_blocks).
        stream_cands: candidate-window streaming (see _culled_kernel).
            None (default) auto-enables a 1024-entry window when the
            per-block SMEM candidate tables would exceed ~512 KB — the
            regime where the SMEM-table kernel fails to compile (fine exit
            groups x many clusters).  0 forces the SMEM tables; W > 0
            forces a W-entry window.  Bit-exact either way.
    Returns:
        RayHit of shape [T', R] — exact closest hits (when t_cap_frac
        covers the scene).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if proxy is not None and seed is None:
        # occluders stay valid on the proxy subset: culling only weakens
        # seeds toward inf (seeds must be valid hits or inf — both are)
        seed = cast_fans_culled(
            proxy, origins, dirs, t_min=t_min, fan_block=fan_block,
            interpret=interpret, emit_uv=emit_uv, per_ray=per_ray,
            fast_recip=fast_recip, exit_rows=exit_rows,
            emit_prim=emit_prim, occluders=occluders,
        )

    tp, r = dirs[0].shape
    tf = fan_block
    t_pad = (-tp) % tf
    d = dirs
    if per_ray:
        o_rows = origins
        if t_pad:
            o_rows = tuple(
                jnp.concatenate([a, jnp.zeros((t_pad, r))]) for a in o_rows
            )
        if t_pad:
            d = tuple(jnp.concatenate([a, jnp.zeros((t_pad, r))]) for a in d)
        o_pack = jnp.concatenate(o_rows, axis=1)  # [T', 3R]
        cull_origins = tuple(jnp.mean(a, axis=1) for a in o_rows)
        # widen block origin boxes by per-row spread (conservative)
        cull_o_lo = tuple(jnp.min(a, axis=1) for a in o_rows)
        cull_o_hi = tuple(jnp.max(a, axis=1) for a in o_rows)
    else:
        o_rows = origins
        if t_pad:
            o_rows = tuple(jnp.concatenate([a, jnp.zeros(t_pad)]) for a in o_rows)
            d = tuple(jnp.concatenate([a, jnp.zeros((t_pad, r))]) for a in d)
        o_pack = jnp.pad(
            jnp.stack([o_rows[0], o_rows[1], o_rows[2]], axis=-1),
            ((0, 0), (0, 5)),
        )  # [T', 8]
        cull_o_lo = cull_o_hi = o_rows

    er = exit_rows if (exit_rows and tf % exit_rows == 0) else 0
    ng = (tf // er) if er else 1
    rb = (tp + t_pad) // tf

    # per-GROUP candidate lists (XLA, dense, cheap relative to the trace):
    # culling at exit-group granularity gives each group a tighter origin
    # box and thus a shorter list to walk than the whole block's
    if cull is None:
        cull = cull_blocks(
            scene, cull_o_lo, cull_o_hi, d, er if er else tf,
            occluders=occluders,
        )
    cand, count, dist = cull
    cc = scene.num_clusters
    cand = cand.reshape(rb, ng, cc)
    dist = dist.reshape(rb, ng, cc)
    count = count.reshape(rb, ng, 1)
    if debug_no_cull:
        cand = jnp.broadcast_to(
            jnp.arange(cc, dtype=jnp.int32)[None, None, :], (rb, ng, cc)
        )
        count = jnp.full((rb, ng, 1), cc, jnp.int32)
        dist = jnp.zeros((rb, ng, cc), jnp.float32)
    elif debug_no_exit:
        dist = jnp.zeros_like(dist)

    c = scene.num_clusters
    lb = scene.lb
    grid = (rb,)
    if fast_recip is None:
        fast_recip = not interpret  # pl.reciprocal is TPU-only
    if emit_prim is None:
        # the uv-emitting estimator never reads prim; dropping it halves
        # the per-candidate DMA traffic
        emit_prim = not emit_uv
    # exit threshold cap = scene diameter (+ margin for surface-eps offset
    # origins): no real hit can be farther, so miss rays can't pin the exit
    cap_frac = 1.05 if t_cap_frac is None else t_cap_frac
    capv = cap_frac * scene.diameter.astype(jnp.float32)
    tcap = jnp.reshape(capv, (1, 1, 1))

    seed_in = ()
    if seed is not None:
        def pad_seed(a, fill):
            a = a[:tp]
            if t_pad:
                a = jnp.concatenate(
                    [a, jnp.full((t_pad, r), fill, a.dtype)]
                )
            return a

        st = pad_seed(seed.t, jnp.inf)
        su = pad_seed(seed.u, 0.0)
        sv = pad_seed(seed.v, 0.0)
        seed_in = (st,) + (
            (pad_seed(seed.prim, -1),) if emit_prim else ()
        ) + (su, sv)
        if not (debug_no_cull or debug_no_exit):
            # clusters whose distance bound >= the group's worst seed t
            # cannot strictly improve any ray in the group (hit t >= bound
            # >= every ray's current t_best): drop them from the walk at
            # cull time — dist is sorted, so shrinking count truncates
            bound = jnp.minimum(
                st.reshape(rb, ng, tf // ng, r).max(axis=(2, 3)), capv
            )
            count = jnp.sum(
                dist < bound[:, :, None], axis=-1, keepdims=True
            ).astype(jnp.int32)

    # candidate-window streaming: the SMEM tables are 2 x ng x C x 4 B per
    # block; past ~512 KB (fine exit groups x scan-scale cluster counts)
    # the SMEM-table kernel fails to COMPILE (PERF.md round 4's er=4 wall).
    # Auto-switch to HBM tables + W-entry double-buffered SMEM windows.
    if stream_cands is None:
        stream_w = 1024 if 2 * ng * c * 4 > 512 * 1024 else 0
    else:
        stream_w = int(stream_cands)
    if stream_w:
        # at least TWO windows: the preamble constructs window-1's copy
        # descriptor unconditionally (execution is pl.when-guarded, but the
        # static slice start must be in bounds)
        c_pad = max(2, (c + stream_w - 1) // stream_w) * stream_w
        if c_pad != c:
            cand = jnp.concatenate(
                [cand, jnp.zeros((rb, ng, c_pad - c), jnp.int32)], axis=-1
            )
            dist = jnp.concatenate(
                [dist, jnp.full((rb, ng, c_pad - c), jnp.inf, jnp.float32)],
                axis=-1,
            )
        cand_spec = pl.BlockSpec(memory_space=pl.ANY)
        dist_spec = cand_spec
        stream_scratch = [
            pltpu.SMEM((2, stream_w), jnp.int32),
            pltpu.SMEM((2, stream_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    else:
        cand_spec = pl.BlockSpec(
            (1, ng, c), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
        )
        dist_spec = cand_spec
        stream_scratch = []

    kernel = functools.partial(
        _culled_kernel, lb=lb, t_min=t_min, emit_uv=emit_uv,
        per_ray_origins=per_ray, fast_recip=fast_recip,
        debug_emit_visits=debug_emit_visits, exit_rows=er,
        emit_prim=emit_prim, seeded=seed is not None,
        stream_window=stream_w,
    )
    out_shape = [
        jax.ShapeDtypeStruct((tp + t_pad, r), jnp.float32),
        jax.ShapeDtypeStruct((tp + t_pad, r), jnp.int32),
        jax.ShapeDtypeStruct((tp + t_pad, r), jnp.float32),
        jax.ShapeDtypeStruct((tp + t_pad, r), jnp.float32),
    ]
    row_spec = pl.BlockSpec((tf, r), lambda b: (b, 0), memory_space=pltpu.VMEM)
    o_width = 3 * r if per_ray else 8
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ng, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            cand_spec,
            dist_spec,
            pl.BlockSpec((1, 1, 1), lambda b: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tf, o_width), lambda b: (b, 0), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ]
        + [row_spec] * len(seed_in)
        + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[row_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((2, lb, _ROW_PAD), jnp.float32),
            pltpu.SMEM((2, _PRIM_ROWS, _ROW_PAD), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ] + stream_scratch,
        interpret=interpret,
    )(count, cand, dist, tcap, o_pack, d[0], d[1], d[2], *seed_in,
      scene.rows3, scene.prims3)

    return RayHit(t=t[:tp], prim=prim[:tp], u=u[:tp], v=v[:tp])


def cull_blocks(
    scene, o_lo: Vec3s, o_hi: Vec3s, dirs: Vec3s, tf: int, occluders=None
):
    """Per-block candidate cluster lists, sorted near-to-far.

    Static tests per (block of tf rows, cluster): swept-beam AABB overlap
    (length = scene diameter) + front-halfspace, both against the block's
    joint origin box and direction cone (the fan_raycast tests lifted to
    origin intervals).  Returns cand [RB, 1, C] int32 nearest-first,
    count [RB, 1, 1] int32, dist [RB, 1, C] float32 sorted bounds.

    occluders: optional geometry.occluders.OccluderSet of PROVEN
    mesh-covered rectangles.  Per group, each occluder whose rectangle
    provably contains every crossing point of the group's rays yields an
    effective blocking plane; clusters strictly behind it are removed from
    the candidate list — exactly (any ray reaching them records a strictly
    closer hit on the occluder first).  This is the host-precomputed PVS
    that removes the behind-wall candidate mass distance bounds cannot
    (VERDICT r3 #2 / PERF.md round-3 saturation analysis)."""
    tp = dirs[0].shape[0]
    rb = tp // tf
    c = scene.num_clusters
    diam = scene.diameter

    bo_lo, bo_hi, d_lo, d_hi = [], [], [], []
    for k in range(3):
        bo_lo.append(jnp.min(o_lo[k].reshape(rb, tf), axis=1))
        bo_hi.append(jnp.max(o_hi[k].reshape(rb, tf), axis=1))
        d = dirs[k].reshape(rb, tf, -1)
        d_lo.append(jnp.min(d, axis=(1, 2)))
        d_hi.append(jnp.max(d, axis=(1, 2)))

    overlap = jnp.ones((rb, c), jnp.bool_)
    front = jnp.zeros((rb, c), jnp.float32)
    dist2 = jnp.zeros((rb, c), jnp.float32)
    t_lb = jnp.zeros((rb, c), jnp.float32)
    for k in range(3):
        c_lo = scene.cluster_lo[:, k][None, :]
        c_hi = scene.cluster_hi[:, k][None, :]
        lo_k = (bo_lo[k] + diam * jnp.minimum(d_lo[k], 0.0))[:, None]
        hi_k = (bo_hi[k] + diam * jnp.maximum(d_hi[k], 0.0))[:, None]
        overlap &= (c_lo <= hi_k) & (c_hi >= lo_k)
        r_lo = c_lo - bo_hi[k][:, None]
        r_hi = c_hi - bo_lo[k][:, None]
        front += jnp.maximum(
            jnp.maximum(r_lo * d_lo[k][:, None], r_lo * d_hi[k][:, None]),
            jnp.maximum(r_hi * d_lo[k][:, None], r_hi * d_hi[k][:, None]),
        )
        # direction-projected t lower bound: a hit at o + t*d with o in the
        # origin box and d in the cone must close each axis gap with that
        # axis's best-case direction component — for clusters off to the
        # side of a narrow wedge this is FAR tighter than the Euclidean
        # box distance (gap / ~0 → unreachable), so they sort later and the
        # kernel's occlusion early-exit fires sooner.
        gap_p = r_lo  # > 0 when the cluster is on the + side
        gap_m = -r_hi  # > 0 when the cluster is on the - side
        dp = jnp.maximum(d_hi[k], 0.0)[:, None]
        dm = jnp.maximum(-d_lo[k], 0.0)[:, None]
        bound_p = jnp.where(
            gap_p > 0.0,
            jnp.where(dp > 1e-12, gap_p / jnp.maximum(dp, 1e-12), jnp.inf),
            0.0,
        )
        bound_m = jnp.where(
            gap_m > 0.0,
            jnp.where(dm > 1e-12, gap_m / jnp.maximum(dm, 1e-12), jnp.inf),
            0.0,
        )
        t_lb = jnp.maximum(t_lb, jnp.maximum(bound_p, bound_m))
        gap = jnp.maximum(jnp.maximum(gap_p, gap_m), 0.0)
        dist2 += gap * gap
    ok = overlap & (front >= 0.0) & jnp.isfinite(t_lb)
    if occluders is not None and occluders.num_occluders:
        from texir_code_tpu.geometry.occluders import occluder_blocked_clusters

        blocked = occluder_blocked_clusters(
            occluders, bo_lo, bo_hi, d_lo, d_hi,
            scene.cluster_lo, scene.cluster_hi,
        )
        ok &= ~blocked
    dist = jnp.maximum(jnp.sqrt(dist2), t_lb)
    key = jnp.where(ok, dist, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    dist_sorted = jnp.take_along_axis(key, order, axis=1)
    count = jnp.sum(ok, axis=1).astype(jnp.int32)
    return order[:, None, :], count[:, None, None], dist_sorted[:, None, :]


# ---------------------------------------------------------------------------
# two-pass trace: truncated walk + compacted straggler re-trace
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_min", "fan_block", "exit_rows", "emit_uv", "interpret",
        "cut_frac", "cap_frac", "per_ray", "cut_frac2", "cap_frac2",
        "stream_cands",
    ),
)
def cast_fans_culled_twopass(
    scene: ClusterScene,
    origins,
    dirs: Vec3s,
    t_min: float = 0.0,
    fan_block: int = 8,
    exit_rows: int = 0,
    emit_uv: bool = False,
    interpret: bool = False,
    cut_frac: float = 0.3,
    cap_frac: float = 0.125,
    per_ray: bool = False,
    proxy: Optional[ClusterScene] = None,
    cut_frac2: Optional[float] = None,
    cap_frac2: float = 0.25,
    occluders=None,
    stream_cands: Optional[int] = None,
) -> RayHit:
    """Exact closest-hit trace in two passes — per-RAY early termination.

    The single-pass kernel's occlusion exit is gated by the WORST ray in
    each exit group: a handful of rays that genuinely see far geometry
    (doorways, corridors) pin max(t_best) high and drag every other lane
    through the far candidate tail.  Measured on the 104k-tri building
    (scripts/twopass_estimate.py): groups walk ~1.6k clusters while 98% of
    rays would finish within 0.3x the scene diameter — the worst-ray gate
    costs ~2x.

    Two passes restore per-ray adaptivity in lockstep SIMD form:

      1. the walk is TRUNCATED at cut = cut_frac * diameter (reusing the
         kernel's exit-threshold cap — no kernel change).  A ray is
         provably FINAL if its hit t <= cut (every unvisited cluster's
         distance lower bound is >= cut), or if its group's whole
         candidate list lies below cut (nothing was truncated).
      2. non-final rays (~2% at cut=0.3) are lane-compacted — a stable
         sort keeps wedge coherence — into cap_frac * T dense rows and
         re-traced from scratch (exact, full diameter cap); their results
         are scattered back over pass 1's.

    If stragglers overflow the static capacity, a lax.cond falls back to
    one exact full-cap trace of everything (correct, just not faster).
    Returns bit-exact closest hits (same contract as cast_fans_culled).

    Args:
        origins: 3x[T] per-row shared origins (the bake layout), or
            3x[T, R] per-ray origins with per_ray=True (specular MC).
        cut_frac: pass-1 walk truncation, fraction of scene diameter.
        cap_frac: straggler row capacity, fraction of T (rounded up to
            whole fan blocks).
        cut_frac2: optional SECOND truncation level — the straggler
            re-trace itself runs as a two-pass at this cut (a 3-pass
            ladder: cheap near walk for everyone, medium walk for the
            minority, full walk for the tail).  cap_frac2 is the inner
            straggler capacity (fraction of the compacted rows).
    """
    tp, r = dirs[0].shape
    tf = fan_block
    t_pad = (-tp) % tf
    d = dirs
    o_rows = origins
    if t_pad:
        zrow = (t_pad, r) if per_ray else (t_pad,)
        o_rows = tuple(jnp.concatenate([a, jnp.zeros(zrow)]) for a in o_rows)
        d = tuple(jnp.concatenate([a, jnp.zeros((t_pad, r))]) for a in d)
    tpad = tp + t_pad
    er = exit_rows if (exit_rows and tf % exit_rows == 0) else tf

    if per_ray:
        o_lo = tuple(jnp.min(a, axis=1) for a in o_rows)
        o_hi = tuple(jnp.max(a, axis=1) for a in o_rows)
    else:
        o_lo = o_hi = o_rows
    cull = cull_blocks(scene, o_lo, o_hi, d, er, occluders=occluders)
    _, count, dist = cull
    hit1 = cast_fans_culled(
        scene, o_rows, d, t_min=t_min, fan_block=tf, exit_rows=exit_rows,
        emit_uv=emit_uv, interpret=interpret, t_cap_frac=cut_frac,
        cull=cull, per_ray=per_ray, proxy=proxy, stream_cands=stream_cands,
    )

    diam = scene.diameter.astype(jnp.float32)
    cut = cut_frac * diam
    ngru = tpad // er
    c = scene.num_clusters
    dist2 = dist.reshape(ngru, c)
    count2 = count.reshape(ngru)
    last = jnp.take_along_axis(
        dist2, jnp.maximum(count2 - 1, 0)[:, None], axis=1
    )[:, 0]
    group_final = (count2 == 0) | (last < cut)
    group_final = jnp.repeat(group_final, er)

    # hit1 covers the padded grid (inputs were pre-padded); padding rows
    # are marked final so they never occupy straggler capacity
    pad_row = jnp.arange(tpad) >= tp
    final = (hit1.t <= cut) | (group_final | pad_row)[:, None]

    cap_rows = max(tf, -(-int(round(cap_frac * tpad)) // tf) * tf)
    cap_rows = min(cap_rows, tpad)
    cap_rays = cap_rows * r

    order = jnp.argsort(final.reshape(-1).astype(jnp.int32))
    sel = order[:cap_rays]
    overflow = jnp.sum(~final) > cap_rays

    d2 = tuple(a.reshape(-1)[sel].reshape(cap_rows, r) for a in d)
    if per_ray:
        o2 = tuple(a.reshape(-1)[sel].reshape(cap_rows, r) for a in o_rows)
    else:
        o2 = tuple(a[sel // r].reshape(cap_rows, r) for a in o_rows)

    def two_pass():
        if cut_frac2 is not None:
            hit2 = cast_fans_culled_twopass(
                scene, o2, d2, t_min=t_min, fan_block=tf,
                exit_rows=exit_rows, emit_uv=emit_uv, interpret=interpret,
                per_ray=True, proxy=proxy, cut_frac=cut_frac2,
                cap_frac=cap_frac2, occluders=occluders,
                stream_cands=stream_cands,
            )
        else:
            hit2 = cast_fans_culled(
                scene, o2, d2, t_min=t_min, fan_block=tf,
                exit_rows=exit_rows, emit_uv=emit_uv, interpret=interpret,
                per_ray=True, proxy=proxy, occluders=occluders,
                stream_cands=stream_cands,
            )
        # re-traced FINAL rays that padded the capacity produce identical
        # results, so all cap_rays slots scatter back unconditionally
        def put(a1, a2):
            return a1.reshape(-1).at[sel].set(
                a2.reshape(-1), unique_indices=True
            ).reshape(tpad, r)

        return (
            put(hit1.t, hit2.t), put(hit1.prim, hit2.prim),
            put(hit1.u, hit2.u), put(hit1.v, hit2.v),
        )

    def full_fallback():
        h = cast_fans_culled(
            scene, o_rows, d, t_min=t_min, fan_block=tf,
            exit_rows=exit_rows, emit_uv=emit_uv, interpret=interpret,
            per_ray=per_ray, proxy=proxy, occluders=occluders,
            stream_cands=stream_cands,
        )
        return h.t, h.prim, h.u, h.v

    t, prim, u, v = jax.lax.cond(overflow, full_fallback, two_pass)
    return RayHit(t=t[:tp], prim=prim[:tp], u=u[:tp], v=v[:tp])


# ---------------------------------------------------------------------------
# high-level fan entry point (bake workloads)
# ---------------------------------------------------------------------------


def cast_ray_fans_wedged(
    scene: ClusterScene,
    origins: Vec3s,
    dirs: Vec3s,
    wedges: int = 8,
    t_min: float = 0.0,
    fan_block: int = 8,
    interpret: bool = False,
    emit_uv: bool = False,
    occluders=None,
) -> Tuple[RayHit, Vec3s]:
    """Full fan trace via direction wedges: sort, split, cull, cast.

    Args:
        origins: 3×[T] per-fan origins; dirs: 3×[T, S] (S/G a multiple
            of 128).
    Returns:
        (RayHit [T, S], dirs_sorted 3×[T, S]) — hits are aligned with the
        *sorted* directions, which the caller must use for estimation
        (order-invariant estimators can consume them directly).
    """
    t, s = dirs[0].shape
    g = wedges
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, g) for a in ds)
    rows_o = tuple(tile_rows(a, g) for a in origins)
    hit = cast_fans_culled(
        scene, rows_o, rows_d, t_min=t_min, fan_block=fan_block,
        interpret=interpret, emit_uv=emit_uv, occluders=occluders,
    )
    back = lambda x: unwedge_rows(x, g)
    return (
        RayHit(t=back(hit.t), prim=back(hit.prim), u=back(hit.u), v=back(hit.v)),
        ds,
    )
