"""Tiled ("stream") ray casting — the TPU speed-of-light traversal.

Why this exists: measured on v5e, XLA's dynamic gather delivers ~1.4 G
elements/s — per-ray BVH traversal (tens of gathered node rows per ray) tops
out near 1 Mray/s/chip no matter how nodes are packed.  The VPU, meanwhile,
does trillions of elementwise flops/s.  So the fast design trades gathers
for broadcast compute:

  1. **Sort rays into coherent tiles** (direction octant ⊕ origin cell;
     XLA sort is ~0.06 ms for 262k keys).  A tile's rays share a conservative
     swept volume: per axis, [omin + D·min(dmin,0), omax + D·max(dmax,0)]
     where D bounds the scene diameter.
  2. **Cull leaves per tile, densely**: one [T, L] AABB-overlap matrix
     (pure elementwise) + top_k → ≤K candidate leaf ids per tile.  No
     per-ray work at all.
  3. **Dense intersection stream**: scan k = 0..K-1; each step gathers ONE
     leaf row per tile ([T, 40] — thousands of elements, not millions) and
     Möller–Trumbores all R rays of every tile against the leaf's 4
     triangles with broadcast [T, R] elementwise math.  Zero per-ray
     gathers in the hot loop.
  4. Scatter hits back through the inverse sort permutation.

Correctness is exact (validated against the brute-force oracle): culling is
conservative, and closest-hit selection happens per ray in step 3.

This replaces per-ray traversal for the bake/material/G-buffer workloads
(millions of rays per call, which is exactly when tiles are coherent).  The
skip-link traversal in ops.raycast remains as the small-batch/reference
path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.geometry.bvh import FlatBVH
from texir_code_tpu.ops.raycast import RayHit, Vec3s, _moller_trumbore_soa

LEAF_ROW_WIDTH = 48  # 6 aabb + 1 count + 1 pad + 4 prim + 4×9 tris


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TiledScene:
    """Leaf-level scene arrays for tiled tracing (a pytree).

    leaf_rows: [L, 48] — per leaf: aabb_min(3), aabb_max(3), count, pad,
        4× prim id (i32 bitcast), 4× (p0, e1, e2).
    diameter: scalar scene diameter bound for swept-volume culling.
    """

    leaf_rows: jnp.ndarray
    diameter: jnp.ndarray

    def tree_flatten(self):
        return (self.leaf_rows, self.diameter), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def num_leaves(self) -> int:
        return int(self.leaf_rows.shape[0])

    @classmethod
    def from_flat(cls, bvh: FlatBVH) -> "TiledScene":
        if bvh.leaf_width != 4:
            raise ValueError("tiled tracing assumes leaf_width == 4")
        is_leaf = bvh.leaf_count > 0
        rows_idx = np.nonzero(is_leaf)[0]
        l = len(rows_idx)
        rows = np.zeros((l, LEAF_ROW_WIDTH), np.float32)
        rows[:, 0:3] = bvh.aabb_min[rows_idx]
        rows[:, 3:6] = bvh.aabb_max[rows_idx]
        rows[:, 6] = bvh.leaf_count[rows_idx].view(np.float32)
        starts = bvh.leaf_start[rows_idx]
        for j in range(4):
            sl = starts + j
            rows[:, 8 + j] = bvh.tri_prim[sl].view(np.float32)
            rows[:, 12 + 9 * j : 15 + 9 * j] = bvh.tri_p0[sl]
            rows[:, 15 + 9 * j : 18 + 9 * j] = bvh.tri_e1[sl]
            rows[:, 18 + 9 * j : 21 + 9 * j] = bvh.tri_e2[sl]
        lo = bvh.aabb_min.min(axis=0)
        hi = bvh.aabb_max.max(axis=0)
        diam = float(np.linalg.norm(hi - lo))
        return cls(leaf_rows=jnp.asarray(rows), diameter=jnp.float32(diam))


def _morton3(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, bits: int = 5):
    """Interleave `bits` bits of each of three uint coordinates."""
    out = jnp.zeros_like(x)
    for b in range(bits):
        out = out | (((x >> b) & 1) << (3 * b + 2))
        out = out | (((y >> b) & 1) << (3 * b + 1))
        out = out | (((z >> b) & 1) << (3 * b))
    return out


def ray_sort_keys(
    origins: Vec3s,
    dirs: Vec3s,
    scene_lo: Vec3s,
    scene_inv_extent: Vec3s,
    cell_bits: int = 4,
) -> jnp.ndarray:
    """Coherence keys: direction octant (3 bits) then origin morton cell."""
    oct_key = (
        ((dirs[0] >= 0).astype(jnp.int32) << 2)
        | ((dirs[1] >= 0).astype(jnp.int32) << 1)
        | (dirs[2] >= 0).astype(jnp.int32)
    )
    cells = []
    n_cells = (1 << cell_bits) - 1
    for k in range(3):
        c = (origins[k] - scene_lo[k]) * scene_inv_extent[k] * (1 << cell_bits)
        cells.append(jnp.clip(c.astype(jnp.int32), 0, n_cells))
    morton = _morton3(cells[0], cells[1], cells[2], cell_bits)
    return (oct_key << (3 * cell_bits)) | morton


@partial(
    jax.jit,
    static_argnames=(
        "tile_size", "max_leaves", "sort_rays", "cell_bits", "return_overflow",
    ),
)
def cast_rays_tiled(
    scene: TiledScene,
    origins: Vec3s,
    dirs: Vec3s,
    t_min: float = 0.0,
    tile_size: int = 1024,
    max_leaves: int = 256,
    sort_rays: bool = True,
    cell_bits: int = 4,
    return_overflow: bool = False,
):
    """Closest-hit trace via tile-coherent dense leaf streaming.

    Args:
        scene: TiledScene.
        origins / dirs: 3-tuples of same-shape float32 component arrays; the
            flattened ray count must be a multiple of tile_size (callers pad).
        t_min: minimum hit distance.
        tile_size: rays per tile (R).
        max_leaves: K — per-tile candidate-leaf budget.  Tiles whose
            conservative swept volume overlaps more than K leaf AABBs fall
            back correctly ONLY if K covers them; choose K from
            `required_leaf_budget` (or generously) — an overflowing tile
            raises no error but may miss hits, so callers validate.
        sort_rays: sort by coherence key first (off for pre-sorted inputs).
    Returns:
        RayHit with the input shape.
    """
    shape = origins[0].shape
    o = tuple(a.reshape(-1) for a in origins)
    d = tuple(a.reshape(-1) for a in dirs)
    b = o[0].shape[0]
    if b % tile_size:
        raise ValueError(f"ray count {b} not a multiple of tile_size {tile_size}")
    n_tiles = b // tile_size

    leaf = scene.leaf_rows
    l = leaf.shape[0]

    # ---- 1. sort rays into tiles ------------------------------------------
    scene_lo = tuple(jnp.min(leaf[:, k]) for k in range(3))
    scene_hi = tuple(jnp.max(leaf[:, 3 + k]) for k in range(3))
    inv_ext = tuple(
        1.0 / jnp.maximum(scene_hi[k] - scene_lo[k], 1e-6) for k in range(3)
    )
    if sort_rays:
        keys = ray_sort_keys(o, d, scene_lo, inv_ext, cell_bits)
        order = jnp.argsort(keys)
    else:
        order = jnp.arange(b, dtype=jnp.int32)
    so = tuple(jnp.take(a, order) for a in o)
    sd = tuple(jnp.take(a, order) for a in d)

    # tile shapes [T, R]
    to = tuple(a.reshape(n_tiles, tile_size) for a in so)
    td = tuple(a.reshape(n_tiles, tile_size) for a in sd)

    # ---- 2. dense tile × leaf culling -------------------------------------
    # (a) swept-box overlap: per axis the tile's rays reach
    #     [omin + D·min(dmin,0), omax + D·max(dmax,0)]
    # (b) direction half-space: a leaf is reachable only if some corner of
    #     its AABB lies at non-negative t along SOME tile direction — the
    #     interval bound max_d max_corner (c - o)·d ≥ 0.  For hemisphere
    #     tiles (the bake: one texel, dirs about one normal) this removes
    #     everything behind the surface.
    diam = scene.diameter
    box_lo, box_hi = [], []
    omin, omax, dmin, dmax = [], [], [], []
    for k in range(3):
        omin.append(jnp.min(to[k], axis=1))
        omax.append(jnp.max(to[k], axis=1))
        dmin.append(jnp.min(td[k], axis=1))
        dmax.append(jnp.max(td[k], axis=1))
        box_lo.append(omin[k] + diam * jnp.minimum(dmin[k], 0.0))
        box_hi.append(omax[k] + diam * jnp.maximum(dmax[k], 0.0))

    overlap = jnp.ones((n_tiles, l), jnp.bool_)
    for k in range(3):
        overlap &= leaf[None, :, k] <= box_hi[k][:, None]
        overlap &= leaf[None, :, 3 + k] >= box_lo[k][:, None]

    # interval upper bound of (c - o)·d over corners c, origins o, dirs d
    front = jnp.zeros((n_tiles, l), jnp.float32)
    for k in range(3):
        # interval of (c_k - o_k): [leaf_lo - omax, leaf_hi - omin]
        r_lo = leaf[None, :, k] - omax[k][:, None]
        r_hi = leaf[None, :, 3 + k] - omin[k][:, None]
        # interval product with d_k ∈ [dmin, dmax]: take the max combination
        cand = jnp.maximum(
            jnp.maximum(r_lo * dmin[k][:, None], r_lo * dmax[k][:, None]),
            jnp.maximum(r_hi * dmin[k][:, None], r_hi * dmax[k][:, None]),
        )
        front = front + cand
    overlap &= front >= 0.0

    # top_k over {0,1} scores puts overlapping leaves first; counts bound k
    kk = min(max_leaves, l)
    scores, leaf_ids = jax.lax.top_k(overlap.astype(jnp.int8), kk)
    counts = jnp.sum(overlap.astype(jnp.int32), axis=1)  # may exceed kk

    # ---- 3. dense intersection stream -------------------------------------
    t0 = jnp.full((n_tiles, tile_size), jnp.inf)
    prim0 = jnp.full((n_tiles, tile_size), -1, jnp.int32)
    z0 = jnp.zeros((n_tiles, tile_size))

    def step(carry, k_idx):
        t_best, prim, u_best, v_best = carry
        ids = leaf_ids[:, k_idx]                        # [T]
        valid_leaf = (scores[:, k_idx] > 0)[:, None]    # [T, 1]
        row = jnp.take(leaf, ids, axis=0)               # [T, 48]
        lc = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)[:, None]
        for j in range(4):
            base = 12 + 9 * j
            p0 = tuple(row[:, base + c, None] for c in range(3))
            e1 = tuple(row[:, base + 3 + c, None] for c in range(3))
            e2 = tuple(row[:, base + 6 + c, None] for c in range(3))
            hit, t, u, v = _moller_trumbore_soa(to, td, p0, e1, e2, t_min)
            ok = hit & valid_leaf & (j < lc) & (t < t_best)
            t_best = jnp.where(ok, t, t_best)
            pj = jax.lax.bitcast_convert_type(row[:, 8 + j], jnp.int32)[:, None]
            prim = jnp.where(ok, pj, prim)
            u_best = jnp.where(ok, u, u_best)
            v_best = jnp.where(ok, v, v_best)
        return (t_best, prim, u_best, v_best), None

    (t_best, prim, u_best, v_best), _ = jax.lax.scan(
        step, (t0, prim0, z0, z0), jnp.arange(kk)
    )

    # ---- 4. unsort --------------------------------------------------------
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(b, dtype=order.dtype))
    flat = lambda a: jnp.take(a.reshape(-1), inv)
    hit = RayHit(
        t=flat(t_best).reshape(shape),
        prim=flat(prim).reshape(shape),
        u=flat(u_best).reshape(shape),
        v=flat(v_best).reshape(shape),
    )
    if not return_overflow:
        return hit
    # per-ray flag: this ray's tile had more candidate leaves than kk, so
    # its result may be incomplete (callers re-trace those rays exactly)
    over_tile = counts > kk                                    # [T]
    over = jnp.broadcast_to(over_tile[:, None], (n_tiles, tile_size))
    return hit, flat(over).reshape(shape)


def cast_rays_exact(
    scene: TiledScene,
    bvh,
    origins: Vec3s,
    dirs: Vec3s,
    t_min: float = 0.0,
    tile_size: int = 1024,
    max_leaves: int = 256,
    sort_rays: bool = True,
    cell_bits: int = 4,
) -> RayHit:
    """Tiled fast path + exact fallback for overflowing tiles.

    Rays whose tile exceeded the leaf budget are re-traced with the
    skip-link traversal (ops.raycast.cast_rays_soa) in one padded batch —
    a host round trip per call, amortized over millions of rays.
    """
    from texir_code_tpu.ops.raycast import cast_rays_soa

    hit, over = cast_rays_tiled(
        scene, origins, dirs, t_min=t_min, tile_size=tile_size,
        max_leaves=max_leaves, sort_rays=sort_rays, cell_bits=cell_bits,
        return_overflow=True,
    )
    over_np = np.asarray(over).reshape(-1)
    n_over = int(over_np.sum())
    if n_over == 0:
        return hit
    idx = np.nonzero(over_np)[0]
    pad = 128 - (len(idx) % 128 or 128)
    idx_p = np.concatenate([idx, np.zeros(pad, idx.dtype)]) if pad else idx
    sub_o = tuple(jnp.take(a.reshape(-1), jnp.asarray(idx_p)) for a in origins)
    sub_d = tuple(jnp.take(a.reshape(-1), jnp.asarray(idx_p)) for a in dirs)
    sub = cast_rays_soa(bvh, sub_o, sub_d, t_min=t_min)
    n = len(idx)
    shape = origins[0].shape
    return RayHit(
        t=hit.t.reshape(-1).at[idx].set(sub.t[:n]).reshape(shape),
        prim=hit.prim.reshape(-1).at[idx].set(sub.prim[:n]).reshape(shape),
        u=hit.u.reshape(-1).at[idx].set(sub.u[:n]).reshape(shape),
        v=hit.v.reshape(-1).at[idx].set(sub.v[:n]).reshape(shape),
    )


def required_leaf_budget(
    scene: TiledScene,
    origins: Vec3s,
    dirs: Vec3s,
    tile_size: int = 1024,
    cell_bits: int = 4,
) -> int:
    """Host helper: the max per-tile overlapping-leaf count for this ray
    population (run once on representative rays to choose max_leaves)."""
    o = tuple(np.asarray(a).reshape(-1) for a in origins)
    d = tuple(np.asarray(a).reshape(-1) for a in dirs)
    leaf = np.asarray(scene.leaf_rows)
    lo = leaf[:, 0:3].min(axis=0)
    hi = leaf[:, 3:6].max(axis=0)
    inv_ext = 1.0 / np.maximum(hi - lo, 1e-6)
    keys = np.asarray(
        ray_sort_keys(
            tuple(jnp.asarray(a) for a in o),
            tuple(jnp.asarray(a) for a in d),
            tuple(jnp.float32(v) for v in lo),
            tuple(jnp.float32(v) for v in inv_ext),
            cell_bits,
        )
    )
    order = np.argsort(keys)
    diam = float(np.asarray(scene.diameter))
    n_tiles = len(order) // tile_size
    worst = 0
    for t in range(n_tiles):
        sel = order[t * tile_size : (t + 1) * tile_size]
        blo, bhi = [], []
        for k in range(3):
            omin, omax = o[k][sel].min(), o[k][sel].max()
            dmin, dmax = d[k][sel].min(), d[k][sel].max()
            blo.append(omin + diam * min(dmin, 0.0))
            bhi.append(omax + diam * max(dmax, 0.0))
        ov = np.ones(leaf.shape[0], bool)
        for k in range(3):
            ov &= leaf[:, k] <= bhi[k]
            ov &= leaf[:, 3 + k] >= blo[k]
        worst = max(worst, int(ov.sum()))
    return worst
