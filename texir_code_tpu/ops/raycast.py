"""On-device ray casting: stackless skip-link BVH traversal in XLA.

The device half of the engine replacing the reference's CPU Embree round
trip.  In the reference every light-transport ray leaves the GPU, crosses to
numpy, is traced by Open3D on CPU threads, and comes back
(reference models/mat_nvdiffrast.py:292-320 — "attention: RaycastingScene
only support cpu"; models/tracer_o3d_irrf.py:90-92;
models/tracer_o3d_irt.py:243-244).  Here rays never leave the chip.

Contract (matches `o3d.t.geometry.RaycastingScene.cast_rays`):

    cast_rays(bvh, origins, dirs) -> RayHit(t, prim, u, v)
      t    : [B]  hit distance, +inf on miss
      prim : [B]  original face index (primitive_ids), -1 on miss
      u, v : [B]  barycentric coords of corners 1 and 2 (primitive_uvs):
                  hit_point = (1-u-v)·p0 + u·p1 + v·p2

Traversal is a lockstep `lax.while_loop` over the whole ray batch: one node
index per ray, advanced by skip links (see geometry/bvh.py for the layout).
Per iteration each ray performs one AABB slab test plus an unrolled
`leaf_width`-wide Möller–Trumbore batch; all node/triangle accesses are XLA
gathers from HBM.  No backface culling (Embree's default behavior, which the
reference relies on for hemisphere rays that graze their own surface).

A brute-force all-triangles intersector is provided as the correctness
oracle for tests and tiny scenes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.geometry.bvh import FlatBVH

_DET_EPS = 1e-12
_BARY_EPS = 1e-7


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceBVH:
    """FlatBVH mirrored to device memory (a pytree of jnp arrays)."""

    aabb_min: jnp.ndarray
    aabb_max: jnp.ndarray
    miss: jnp.ndarray
    leaf_start: jnp.ndarray
    leaf_count: jnp.ndarray
    tri_p0: jnp.ndarray
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    tri_prim: jnp.ndarray
    leaf_width: int  # static

    def tree_flatten(self):
        leaves = (
            self.aabb_min, self.aabb_max, self.miss, self.leaf_start,
            self.leaf_count, self.tri_p0, self.tri_e1, self.tri_e2,
            self.tri_prim,
        )
        return leaves, self.leaf_width

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, leaf_width=aux)

    @classmethod
    def from_flat(cls, bvh: FlatBVH) -> "DeviceBVH":
        return cls(
            aabb_min=jnp.asarray(bvh.aabb_min),
            aabb_max=jnp.asarray(bvh.aabb_max),
            miss=jnp.asarray(bvh.miss),
            leaf_start=jnp.asarray(bvh.leaf_start),
            leaf_count=jnp.asarray(bvh.leaf_count),
            tri_p0=jnp.asarray(bvh.tri_p0),
            tri_e1=jnp.asarray(bvh.tri_e1),
            tri_e2=jnp.asarray(bvh.tri_e2),
            tri_prim=jnp.asarray(bvh.tri_prim),
            leaf_width=bvh.leaf_width,
        )


@dataclasses.dataclass
class RayHit:
    t: jnp.ndarray     # [B] float32, +inf on miss
    prim: jnp.ndarray  # [B] int32, -1 on miss
    u: jnp.ndarray     # [B] float32 barycentric (corner 1)
    v: jnp.ndarray     # [B] float32 barycentric (corner 2)


jax.tree_util.register_pytree_node(
    RayHit,
    lambda h: ((h.t, h.prim, h.u, h.v), None),
    lambda _, leaves: RayHit(*leaves),
)


def _moller_trumbore(
    o: jnp.ndarray,
    d: jnp.ndarray,
    p0: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    t_min: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched ray/triangle intersection. Shapes broadcast over leading dims.

    Returns (hit_mask, t, u, v)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = o - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= -_BARY_EPS)
        & (v >= -_BARY_EPS)
        & (u + v <= 1.0 + _BARY_EPS)
        & (t > t_min)
    )
    return hit, t, u, v


def _slab_test(
    o: jnp.ndarray,
    inv_d: jnp.ndarray,
    bmin: jnp.ndarray,
    bmax: jnp.ndarray,
    t_best: jnp.ndarray,
    t_min: float,
) -> jnp.ndarray:
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tnear <= tfar) & (tfar >= t_min) & (tnear <= t_best)


def _safe_inv(d: jnp.ndarray) -> jnp.ndarray:
    """1/d with near-zero components mapped to a huge finite value.

    Keeps the slab test NaN-free without inf·0 hazards: slabs containing the
    origin on a degenerate axis yield (-huge, +huge) and pass; slabs strictly
    to one side yield same-signed huge values and correctly miss."""
    tiny = 1e-12
    ok = jnp.abs(d) > tiny
    return jnp.where(ok, 1.0 / jnp.where(ok, d, 1.0), 1e30)


@partial(jax.jit, static_argnames=("max_iters",))
def cast_rays(
    bvh: DeviceBVH,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    t_min: float = 0.0,
    max_iters: int = 0,
) -> RayHit:
    """Trace a batch of rays against the BVH.

    Args:
        bvh: DeviceBVH.
        origins: [B, 3] float32.
        dirs: [B, 3] float32 (need not be normalized; t is in units of |dir|,
            matching Open3D).
        t_min: minimum hit distance (reference masks hits with t<=1e-4 at the
            call sites, models/mat_nvdiffrast.py:299 — keep 0 here, mask there).
        max_iters: optional hard bound on traversal iterations (0 = until all
            rays terminate).

    Returns:
        RayHit with t=+inf / prim=-1 for misses.
    """
    b = origins.shape[0]
    inv_d = _safe_inv(dirs)

    t_best0 = jnp.full((b,), jnp.inf, jnp.float32)
    prim0 = jnp.full((b,), -1, jnp.int32)
    uv0 = jnp.zeros((b,), jnp.float32)
    node0 = jnp.zeros((b,), jnp.int32)
    it0 = jnp.zeros((), jnp.int32)

    def cond(state):
        node, _, _, _, _, it = state
        alive = jnp.any(node >= 0)
        if max_iters:
            return alive & (it < max_iters)
        return alive

    def body(state):
        node, t_best, prim, u_best, v_best, it = state
        active = node >= 0
        nidx = jnp.where(active, node, 0)

        bmin = jnp.take(bvh.aabb_min, nidx, axis=0)
        bmax = jnp.take(bvh.aabb_max, nidx, axis=0)
        ls = jnp.take(bvh.leaf_start, nidx)
        lc = jnp.take(bvh.leaf_count, nidx)
        ms = jnp.take(bvh.miss, nidx)

        hit_box = _slab_test(origins, inv_d, bmin, bmax, t_best, t_min) & active
        is_leaf = lc > 0

        do_leaf = hit_box & is_leaf
        for j in range(bvh.leaf_width):
            tid = ls + j
            valid = do_leaf & (j < lc)
            safe_tid = jnp.where(valid, tid, 0)
            p0 = jnp.take(bvh.tri_p0, safe_tid, axis=0)
            e1 = jnp.take(bvh.tri_e1, safe_tid, axis=0)
            e2 = jnp.take(bvh.tri_e2, safe_tid, axis=0)
            hit, t, u, v = _moller_trumbore(origins, dirs, p0, e1, e2, t_min)
            closer = hit & valid & (t < t_best)
            t_best = jnp.where(closer, t, t_best)
            prim = jnp.where(closer, jnp.take(bvh.tri_prim, safe_tid), prim)
            u_best = jnp.where(closer, u, u_best)
            v_best = jnp.where(closer, v, v_best)

        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, nidx + 1, ms)
        node = jnp.where(active, nxt, -1)
        return node, t_best, prim, u_best, v_best, it + 1

    _, t, prim, u, v = jax.lax.while_loop(
        cond, body, (node0, t_best0, prim0, uv0, uv0, it0)
    )[:5]
    return RayHit(t=t, prim=prim, u=u, v=v)


def cast_rays_brute(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    t_min: float = 0.0,
    chunk: int = 512,
) -> RayHit:
    """O(B·F) reference intersector (correctness oracle; small scenes only).

    Scans triangle chunks with a fori_loop to bound memory at B×chunk."""
    tri = vertices[faces]  # [F, 3, 3]
    p0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    f = faces.shape[0]
    b = origins.shape[0]
    nchunks = (f + chunk - 1) // chunk
    pad = nchunks * chunk - f
    if pad:
        p0 = jnp.concatenate([p0, jnp.zeros((pad, 3))])
        e1 = jnp.concatenate([e1, jnp.zeros((pad, 3))])
        e2 = jnp.concatenate([e2, jnp.zeros((pad, 3))])

    def body(c, state):
        t_best, prim, u_best, v_best = state
        sl = c * chunk
        cp0 = jax.lax.dynamic_slice_in_dim(p0, sl, chunk)
        ce1 = jax.lax.dynamic_slice_in_dim(e1, sl, chunk)
        ce2 = jax.lax.dynamic_slice_in_dim(e2, sl, chunk)
        hit, t, u, v = _moller_trumbore(
            origins[:, None, :], dirs[:, None, :],
            cp0[None, :, :], ce1[None, :, :], ce2[None, :, :], t_min,
        )  # [B, chunk]
        fidx = sl + jnp.arange(chunk)
        hit = hit & (fidx[None, :] < f)
        t = jnp.where(hit, t, jnp.inf)
        best = jnp.argmin(t, axis=1)
        bt = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
        closer = bt < t_best
        sel = lambda arr: jnp.take_along_axis(arr, best[:, None], axis=1)[:, 0]
        t_best = jnp.where(closer, bt, t_best)
        prim = jnp.where(closer, (sl + best).astype(jnp.int32), prim)
        u_best = jnp.where(closer, sel(u), u_best)
        v_best = jnp.where(closer, sel(v), v_best)
        return t_best, prim, u_best, v_best

    t0 = jnp.full((b,), jnp.inf, jnp.float32)
    prim0 = jnp.full((b,), -1, jnp.int32)
    z = jnp.zeros((b,), jnp.float32)
    t, prim, u, v = jax.lax.fori_loop(0, nchunks, body, (t0, prim0, z, z))
    return RayHit(t=t, prim=prim, u=u, v=v)
