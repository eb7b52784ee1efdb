"""Shared-origin ray-fan tracing — the bake/G-buffer fast path.

The two biggest ray workloads have a special structure the general tracer
can't exploit: every ray in a group shares ONE origin —

  * IrT bake: each texel shoots `spp` hemisphere rays from its surface point
    (reference models/tracer_o3d_irt.py:156-174);
  * primary visibility: each camera shoots one ray per pixel
    (replacing dr.rasterize).

With a shared origin the Möller–Trumbore chain collapses: precompute per
triangle the plane (n, dist = n·p0) and the barycentric dual vectors
s1 = (e2 × n)/|n|², s2 = (n × e1)/|n|², so that for a fan at origin o:

    t = (dist − n·o) / (n·d)
    u = (o − p0)·s1 + t·(d·s1)
    v = (o − p0)·s2 + t·(d·s2)

(o−p0)·s1 etc. are per-(fan, triangle) scalars computed once; the per-ray
work is three 3-dots against d plus a handful of VPU ops (~30 flops/pair vs
~60 for full MT — and this workload is VPU-flop-bound, measured ~1.2 Tflop/s
sustained).  Culling and leaf streaming follow ops.tiled_raycast: dense
fan × leaf-AABB tests (swept box + front-halfspace), top_k candidate lists,
lax.scan over leaves with broadcast math, overflow fans re-traced exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.geometry.bvh import FlatBVH
from texir_code_tpu.ops.raycast import RayHit, Vec3s

_DET_EPS = 1e-12
_BARY_EPS = 1e-7

# per-leaf row: aabb(6) count(1) pad(1) prim(4) + 4 × [n(3) dist(1) s1(3)
# p0s1(1) s2(3) p0s2(1) p0(3)] = 8 + 4 + 4*15 = 72.  With texture uvs
# (FanScene.from_flat(..., triangle_uvs=...)) each tri appends
# (tu0, du1, du2, tv0, dv1, dv2) at 72 + 6*tri → width 96.
FAN_ROW_WIDTH = 72
FAN_ROW_WIDTH_UV = 96
_TRI_BASE = 12
_TRI_STRIDE = 15
_UV_BASE = 72


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FanScene:
    """Leaf rows with plane-dual triangle data (a pytree)."""

    rows: jnp.ndarray      # [L, 72]
    diameter: jnp.ndarray  # scalar

    def tree_flatten(self):
        return (self.rows, self.diameter), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def num_leaves(self) -> int:
        return int(self.rows.shape[0])

    @classmethod
    def from_flat(cls, bvh: FlatBVH, triangle_uvs=None) -> "FanScene":
        """Args:
            triangle_uvs: optional [F*3, 2] per-corner uvs (mesh.triangle_uvs);
                when given, rows carry interpolation coefficients for the
                atlas uv at the hit (used by the uv-emitting Pallas kernel).
        """
        if bvh.leaf_width != 4:
            raise ValueError("fan tracing assumes leaf_width == 4")
        is_leaf = bvh.leaf_count > 0
        idx = np.nonzero(is_leaf)[0]
        l = len(idx)
        width = FAN_ROW_WIDTH_UV if triangle_uvs is not None else FAN_ROW_WIDTH
        rows = np.zeros((l, width), np.float32)
        rows[:, 0:3] = bvh.aabb_min[idx]
        rows[:, 3:6] = bvh.aabb_max[idx]
        rows[:, 6] = bvh.leaf_count[idx].view(np.float32)
        starts = bvh.leaf_start[idx]
        for j in range(4):
            sl = starts + j
            p0 = bvh.tri_p0[sl].astype(np.float64)
            e1 = bvh.tri_e1[sl].astype(np.float64)
            e2 = bvh.tri_e2[sl].astype(np.float64)
            n = np.cross(e1, e2)
            nn = np.maximum((n * n).sum(-1, keepdims=True), 1e-30)
            s1 = np.cross(e2, n) / nn
            s2 = np.cross(n, e1) / nn
            rows[:, 8 + j] = bvh.tri_prim[sl].view(np.float32)
            base = _TRI_BASE + _TRI_STRIDE * j
            rows[:, base : base + 3] = n.astype(np.float32)
            rows[:, base + 3] = (n * p0).sum(-1).astype(np.float32)
            rows[:, base + 4 : base + 7] = s1.astype(np.float32)
            rows[:, base + 7] = (s1 * p0).sum(-1).astype(np.float32)
            rows[:, base + 8 : base + 11] = s2.astype(np.float32)
            rows[:, base + 11] = (s2 * p0).sum(-1).astype(np.float32)
            rows[:, base + 12 : base + 15] = p0.astype(np.float32)
            # degenerate padded slots: zero normal → |n·d| below eps → no hit
            if triangle_uvs is not None:
                prim = bvh.tri_prim[sl]
                safe = np.maximum(prim, 0)
                t0 = triangle_uvs[safe * 3]
                t1 = triangle_uvs[safe * 3 + 1]
                t2 = triangle_uvs[safe * 3 + 2]
                ub = _UV_BASE + 6 * j
                rows[:, ub] = t0[:, 0]
                rows[:, ub + 1] = t1[:, 0] - t0[:, 0]
                rows[:, ub + 2] = t2[:, 0] - t0[:, 0]
                rows[:, ub + 3] = t0[:, 1]
                rows[:, ub + 4] = t1[:, 1] - t0[:, 1]
                rows[:, ub + 5] = t2[:, 1] - t0[:, 1]
        lo = bvh.aabb_min.min(axis=0)
        hi = bvh.aabb_max.max(axis=0)
        scene = cls(
            rows=jnp.asarray(rows),
            diameter=jnp.float32(float(np.linalg.norm(hi - lo))),
        )
        # host copy for downstream host-side packing (ClusterScene) — avoids
        # a device->host readback, which crawls over the axon tunnel
        scene.rows_np = rows
        scene.diameter_np = float(np.linalg.norm(hi - lo))
        return scene


@partial(jax.jit, static_argnames=("max_leaves", "return_overflow"))
def cast_ray_fans(
    scene: FanScene,
    origins: Vec3s,
    dirs: Vec3s,
    t_min: float = 0.0,
    max_leaves: int = 512,
    return_overflow: bool = False,
    fan_normals: Vec3s = None,
):
    """Closest-hit trace of T fans × R rays sharing per-fan origins.

    Args:
        scene: FanScene.
        origins: 3-tuple of [T] per-fan origins.
        dirs: 3-tuple of [T, R] directions.
        t_min: minimum hit distance.
        max_leaves: per-fan candidate-leaf budget K; overflowing fans are
            flagged (use return_overflow + an exact fallback, or a budget
            from the geometry).
        fan_normals: optional 3-tuple of [T] hemisphere axes; when all of a
            fan's directions satisfy n·d ≥ 0 (bake texels), leaves entirely
            behind the fan's tangent plane are culled exactly.
    Returns:
        RayHit of shape [T, R] (+ [T, R] overflow flags if requested).
    """
    t_fans, r = dirs[0].shape
    rows = scene.rows
    l = rows.shape[0]
    diam = scene.diameter

    # ---- dense fan × leaf culling (swept point-beam + front halfspace) ----
    dmin = tuple(jnp.min(dirs[k], axis=1) for k in range(3))
    dmax = tuple(jnp.max(dirs[k], axis=1) for k in range(3))
    overlap = jnp.ones((t_fans, l), jnp.bool_)
    front = jnp.zeros((t_fans, l), jnp.float32)
    for k in range(3):
        lo_k = origins[k] + diam * jnp.minimum(dmin[k], 0.0)
        hi_k = origins[k] + diam * jnp.maximum(dmax[k], 0.0)
        overlap &= rows[None, :, k] <= hi_k[:, None]
        overlap &= rows[None, :, 3 + k] >= lo_k[:, None]
        r_lo = rows[None, :, k] - origins[k][:, None]
        r_hi = rows[None, :, 3 + k] - origins[k][:, None]
        cand = jnp.maximum(
            jnp.maximum(r_lo * dmin[k][:, None], r_lo * dmax[k][:, None]),
            jnp.maximum(r_hi * dmin[k][:, None], r_hi * dmax[k][:, None]),
        )
        front = front + cand
    overlap &= front >= 0.0

    if fan_normals is not None:
        # leaf reachable only if some AABB corner is on the hemisphere side:
        # max over corners of (c - o)·n ≥ 0, separable per axis
        plane = jnp.zeros((t_fans, l), jnp.float32)
        for k in range(3):
            nk = fan_normals[k][:, None]
            r_lo = rows[None, :, k] - origins[k][:, None]
            r_hi = rows[None, :, 3 + k] - origins[k][:, None]
            plane = plane + jnp.maximum(r_lo * nk, r_hi * nk)
        overlap &= plane >= 0.0

    kk = min(max_leaves, l)
    scores, leaf_ids = jax.lax.top_k(overlap.astype(jnp.int8), kk)
    counts = jnp.sum(overlap.astype(jnp.int32), axis=1)

    # ---- leaf stream ------------------------------------------------------
    t0 = jnp.full((t_fans, r), jnp.inf)
    prim0 = jnp.full((t_fans, r), -1, jnp.int32)
    z0 = jnp.zeros((t_fans, r))

    def step(carry, k_idx):
        t_best, prim, u_best, v_best = carry
        ids = leaf_ids[:, k_idx]
        valid_leaf = (scores[:, k_idx] > 0)[:, None]
        row = jnp.take(rows, ids, axis=0)  # [T, 72]
        lc = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)[:, None]
        for j in range(4):
            base = _TRI_BASE + _TRI_STRIDE * j
            n = tuple(row[:, base + c, None] for c in range(3))
            dist = row[:, base + 3, None]
            s1 = tuple(row[:, base + 4 + c, None] for c in range(3))
            p0s1 = row[:, base + 7, None]
            s2 = tuple(row[:, base + 8 + c, None] for c in range(3))
            p0s2 = row[:, base + 11, None]

            # per-(fan, tri) scalars from the shared origin
            no = sum(n[c] * origins[c][:, None] for c in range(3))
            ou = sum(s1[c] * origins[c][:, None] for c in range(3)) - p0s1
            ov = sum(s2[c] * origins[c][:, None] for c in range(3)) - p0s2

            nd = n[0] * dirs[0] + n[1] * dirs[1] + n[2] * dirs[2]   # [T, R]
            inv_nd = jnp.where(jnp.abs(nd) > _DET_EPS, 1.0 / jnp.where(nd == 0, 1.0, nd), 0.0)
            t = (dist - no) * inv_nd
            du = s1[0] * dirs[0] + s1[1] * dirs[1] + s1[2] * dirs[2]
            dv = s2[0] * dirs[0] + s2[1] * dirs[1] + s2[2] * dirs[2]
            u = ou + t * du
            v = ov + t * dv
            ok = (
                (jnp.abs(nd) > _DET_EPS)
                & (u >= -_BARY_EPS)
                & (v >= -_BARY_EPS)
                & (u + v <= 1.0 + _BARY_EPS)
                & (t > t_min)
                & (t < t_best)
                & valid_leaf
                & (j < lc)
            )
            t_best = jnp.where(ok, t, t_best)
            pj = jax.lax.bitcast_convert_type(row[:, 8 + j], jnp.int32)[:, None]
            prim = jnp.where(ok, pj, prim)
            u_best = jnp.where(ok, u, u_best)
            v_best = jnp.where(ok, v, v_best)
        return (t_best, prim, u_best, v_best), None

    (t_best, prim, u_best, v_best), _ = jax.lax.scan(
        step, (t0, prim0, z0, z0), jnp.arange(kk)
    )

    hit = RayHit(t=t_best, prim=prim, u=u_best, v=v_best)
    if not return_overflow:
        return hit
    over = jnp.broadcast_to((counts > kk)[:, None], (t_fans, r))
    return hit, over


def cast_ray_fans_exact(
    scene: FanScene,
    bvh,
    origins: Vec3s,
    dirs: Vec3s,
    t_min: float = 0.0,
    max_leaves: int = 512,
    fan_normals: Vec3s = None,
) -> RayHit:
    """Fan fast path + exact skip-link fallback for overflowing fans."""
    from texir_code_tpu.ops.raycast import cast_rays_soa

    hit, over = cast_ray_fans(
        scene, origins, dirs, t_min=t_min, max_leaves=max_leaves,
        return_overflow=True, fan_normals=fan_normals,
    )
    over_np = np.asarray(over[:, 0])
    n_over = int(over_np.sum())
    if n_over == 0:
        return hit
    idx = np.nonzero(over_np)[0]
    t_fans, r = dirs[0].shape
    # chunk the fallback: the skip-link traversal materializes [B, row]
    # gathers, so bound B ≈ chunk·r
    chunk = max(1, (1 << 20) // r)
    t_out, p_out, u_out, v_out = hit.t, hit.prim, hit.u, hit.v
    for s in range(0, len(idx), chunk):
        ii = jnp.asarray(idx[s : s + chunk])
        m = len(idx[s : s + chunk])
        sub_o = tuple(
            jnp.broadcast_to(jnp.take(origins[k], ii)[:, None], (m, r))
            for k in range(3)
        )
        sub_d = tuple(jnp.take(dirs[k], ii, axis=0) for k in range(3))
        sub = cast_rays_soa(bvh, sub_o, sub_d, t_min=t_min)
        t_out = t_out.at[ii].set(sub.t)
        p_out = p_out.at[ii].set(sub.prim)
        u_out = u_out.at[ii].set(sub.u)
        v_out = v_out.at[ii].set(sub.v)
    return RayHit(t=t_out, prim=p_out, u=u_out, v=v_out)
