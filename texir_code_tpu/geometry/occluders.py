"""Proven rectangular occluders — host-side PVS precompute for the culled
ray kernels.

The culled wedge kernel's candidate lists are built from geometric distance
bounds only (ops/pallas_culled.cull_blocks), so clusters *behind a wall* are
geometrically close and stay in every list; the occlusion early-exit then
walks them each dispatch.  Round-3 telemetry on the 104k-tri building
(PERF.md): 2440 candidates/group vs ~734 actually visible — the excluded
~1700 are the near shells of neighboring rooms, unreachable through the
walls.  Per-dispatch verification schemes cannot remove them (any exact
seeded/verified walk still visits every candidate whose distance bound is
under the group's worst hit t — the same set the baseline walks), so the
only structural lever is to remove provably-occluded clusters from the
candidate lists BEFORE the walk.

This module provides the proof system:

  1. **Extraction** (`extract_occluders`, host-side, once per scene): find
     axis-aligned rectangles that are *provably fully covered* by mesh
     triangles.  Triangles lying in an axis-aligned plane are grouped by
     (axis, offset); the plane's 2D arrangement grid (unique projected
     vertex coordinates) is tested cell by cell: a cell is covered iff the
     exact union of the triangles clipped to it equals the cell area.  The
     union is computed soundly — identical (double-sided) triangles are
     deduplicated, pairwise overlaps among the clipped polygons must vanish
     (otherwise the cell is conservatively rejected), and then the clipped
     areas sum to the union.  Maximal all-covered rectangles of the boolean
     grid become occluders, shrunk by a safety margin.  A mesh with no such
     planes (or with over-dense arrangements) simply yields no occluders —
     the trace is then unchanged.

  2. **Blocking test** (`occluder_plane_bounds`, device-side, inside
     cull_blocks): for an exit group with origin box O and direction cone D,
     an occluder (axis k, plane p, rect R) *blocks* the group iff every ray
     from O with direction in D that crosses plane p does so strictly inside
     R (interval arithmetic over the crossing point o_ab + gap·d_ab/d_k —
     far tighter than box-shaft tests for narrow wedge cones).  A blocked
     plane yields a per-group effective bound: every cluster strictly
     behind it is unreachable — any ray that could reach it crosses the
     plane inside R, where the mesh provably has a triangle, so the ray
     records a strictly closer hit first.  Culling those clusters is
     therefore EXACT (bit-equal hits), not approximate.

Reference workload: models/tracer_o3d_irt.py:95,156-174 bakes scan meshes
(multi-room buildings) where this removes the behind-wall candidate mass
the round-3 exit-engineering analysis proved unreachable by any other
lockstep mechanism.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# direction-cone minimum toward-plane component for a blocker to engage:
# crossing-point intervals scale with 1/d_k, so near-tangent cones have
# unbounded crossings and can never be proven inside a rectangle anyway
_D_MIN = 1e-4


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class OccluderSet:
    """K proven rectangular occluders (a pytree).

    Attributes:
        axis: length-K tuple of ints — plane normal axis k.  STATIC (pytree
            aux data): the blocking test unrolls over occluders and selects
            coordinate axes per occluder at trace time.
        p: [K] float32 — plane offset (x_k = p).
        rect_lo / rect_hi: [K, 2] float32 — rectangle bounds in the two
            other axes, ordered ((k+1)%3, (k+2)%3), pre-shrunk by the
            extraction safety margin.
        sep_margin: scalar float32 — minimum origin-box/plane separation
            for the blocking test (absorbs ray-origin surface offsets and
            t_min; an origin within the margin is never considered blocked).
    """

    axis: tuple
    p: jnp.ndarray
    rect_lo: jnp.ndarray
    rect_hi: jnp.ndarray
    sep_margin: jnp.ndarray

    def tree_flatten(self):
        return (
            (self.p, self.rect_lo, self.rect_hi, self.sep_margin),
            self.axis,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux, *leaves)

    @property
    def num_occluders(self) -> int:
        return len(self.axis)


# ---------------------------------------------------------------------------
# extraction (host-side numpy)
# ---------------------------------------------------------------------------


def _clip_poly_to_box(poly: np.ndarray, lo, hi) -> np.ndarray:
    """Sutherland–Hodgman clip of convex polygon [n, 2] to an axis box."""
    def clip_half(pts, axis, bound, keep_leq):
        if len(pts) == 0:
            return pts
        out = []
        n = len(pts)
        for i in range(n):
            a = pts[i]
            b = pts[(i + 1) % n]
            ina = (a[axis] <= bound) if keep_leq else (a[axis] >= bound)
            inb = (b[axis] <= bound) if keep_leq else (b[axis] >= bound)
            if ina:
                out.append(a)
            if ina != inb:
                t = (bound - a[axis]) / (b[axis] - a[axis])
                out.append(a + t * (b - a))
        return np.asarray(out, np.float64) if out else np.zeros((0, 2))

    pts = np.asarray(poly, np.float64)
    pts = clip_half(pts, 0, lo[0], keep_leq=False)
    pts = clip_half(pts, 0, hi[0], keep_leq=True)
    pts = clip_half(pts, 1, lo[1], keep_leq=False)
    pts = clip_half(pts, 1, hi[1], keep_leq=True)
    return pts


def _poly_area(poly: np.ndarray) -> float:
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(
        float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    )


def _convex_intersection_area(pa: np.ndarray, pb: np.ndarray) -> float:
    """Area of the intersection of two convex polygons (clip a by b's
    half-planes)."""
    pts = np.asarray(pa, np.float64)
    nb = len(pb)
    # pb counter-clockwise orientation
    if _signed_area(pb) < 0:
        pb = pb[::-1]
    for i in range(nb):
        a = pb[i]
        b = pb[(i + 1) % nb]
        e = b - a
        if len(pts) == 0:
            return 0.0
        d = (pts[:, 0] - a[0]) * e[1] - (pts[:, 1] - a[1]) * e[0]
        inside = d <= 1e-15
        out = []
        n = len(pts)
        for j in range(n):
            pj, pk = pts[j], pts[(j + 1) % n]
            inj, ink = inside[j], inside[(j + 1) % n]
            if inj:
                out.append(pj)
            if inj != ink:
                dj, dk = d[j], d[(j + 1) % n]
                t = dj / (dj - dk)
                out.append(pj + t * (pk - pj))
        pts = np.asarray(out, np.float64) if out else np.zeros((0, 2))
        if len(pts) == 0:
            return 0.0
        d = (pts[:, 0] - a[0]) * e[1] - (pts[:, 1] - a[1]) * e[0]
        inside = d <= 1e-15
    return _poly_area(pts)


def _signed_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _maximal_rectangles(cov: np.ndarray) -> List[Tuple[int, int, int, int]]:
    """All maximal all-True rectangles (i0, j0, i1, j1) of a boolean grid
    (half-open index ranges), via the histogram-stack sweep per bottom row."""
    h, w = cov.shape
    heights = np.zeros(w, np.int64)
    rects = set()
    for i in range(h):
        heights = np.where(cov[i], heights + 1, 0)
        # maximal rectangles with bottom edge on row i: pop STRICTLY taller
        # entries (equal heights stay — popping on equality would emit one
        # nested rect per column of an equal-height run)
        stack: List[Tuple[int, int]] = []  # (start_col, height)
        for j in range(w + 1):
            cur = int(heights[j]) if j < w else 0
            start = j
            while stack and stack[-1][1] > cur:
                s, hh = stack.pop()
                # left/right-maximal by stack discipline (strictly shorter
                # columns on both sides); height-maximal upward since hh
                # counts ALL consecutive covered rows; downward iff row i+1
                # doesn't extend the full width
                if i + 1 >= h or not cov[i + 1, s:j].all():
                    rects.add((i + 1 - hh, s, i + 1, j))
                start = s
            if cur > 0 and (not stack or stack[-1][1] < cur):
                stack.append((start, cur))
    return sorted(rects)


def extract_occluders(
    mesh,
    min_side_frac: float = 0.02,
    min_area_frac: float = 0.0012,
    max_occluders: int = 96,
    max_grid: int = 768,
    margin_frac: float = 5e-5,
    sep_margin_frac: float = 1.5e-3,
    coord_tol_frac: float = 1e-6,
) -> Optional[OccluderSet]:
    """Extract proven axis-aligned rectangular occluders from a mesh.

    Fractions are relative to the scene diameter (min_area_frac to its
    square).  Returns None when no rectangle passes the proof + size
    filters (the trace then runs exactly as before).
    """
    tri = np.asarray(mesh.triangle_corners(), np.float64)  # [F, 3, 3]
    if len(tri) == 0:
        return None
    lo = tri.reshape(-1, 3).min(axis=0)
    hi = tri.reshape(-1, 3).max(axis=0)
    diam = float(np.linalg.norm(hi - lo))
    if diam <= 0:
        return None
    tol = coord_tol_frac * diam
    min_side = min_side_frac * diam
    min_area = min_area_frac * diam * diam
    margin = margin_frac * diam

    found: List[Tuple[float, int, float, float, float, float, float]] = []
    for k in range(3):
        coord = tri[:, :, k]
        flat = np.abs(coord - coord[:, :1]).max(axis=1) <= tol
        if not flat.any():
            continue
        a_ax, b_ax = (k + 1) % 3, (k + 2) % 3
        p_all = coord[flat, 0]
        tri2 = tri[flat][:, :, (a_ax, b_ax)]  # [Fk, 3, 2]
        # group by quantized plane offset
        q = np.round(p_all / max(tol, 1e-12)).astype(np.int64)
        for qv in np.unique(q):
            sel = q == qv
            p = float(p_all[sel].mean())
            polys = tri2[sel]
            rects = _proven_rectangles(
                polys, tol=tol, max_grid=max_grid,
                min_side=min_side, min_area=min_area,
            )
            for (area, a0, b0, a1, b1) in rects:
                found.append((area, k, p, a0, b0, a1, b1))

    if not found:
        return None
    found.sort(reverse=True)
    found = found[:max_occluders]
    axis = np.asarray([f[1] for f in found], np.int32)
    p = np.asarray([f[2] for f in found], np.float32)
    rect_lo = np.asarray([[f[3] + margin, f[4] + margin] for f in found],
                         np.float32)
    rect_hi = np.asarray([[f[5] - margin, f[6] - margin] for f in found],
                         np.float32)
    keep = (rect_hi > rect_lo).all(axis=1)
    if not keep.any():
        return None
    return OccluderSet(
        axis=tuple(int(a) for a in axis[keep]),
        p=jnp.asarray(p[keep]),
        rect_lo=jnp.asarray(rect_lo[keep]),
        rect_hi=jnp.asarray(rect_hi[keep]),
        sep_margin=jnp.float32(sep_margin_frac * diam),
    )


def _proven_rectangles(
    polys: np.ndarray, tol: float, max_grid: int,
    min_side: float, min_area: float,
) -> List[Tuple[float, float, float, float, float]]:
    """Proven fully-covered rectangles of one plane's triangle set.

    polys: [F, 3, 2] float64 projected triangles.  Returns a list of
    (area, a0, b0, a1, b1)."""
    # dedupe identical triangles (double-sided walls duplicate geometry):
    # unordered vertex multiset, quantized
    qv = np.round(polys / max(tol, 1e-12)).astype(np.int64)  # [F, 3, 2]
    key = np.sort(
        qv[:, :, 0] * np.int64(2**31) + qv[:, :, 1], axis=1
    )
    _, first = np.unique(key, axis=0, return_index=True)
    polys = polys[np.sort(first)]
    qv = qv[np.sort(first)]

    # arrangement grid from unique quantized coords
    xs_q = np.unique(qv[:, :, 0])
    ys_q = np.unique(qv[:, :, 1])
    if len(xs_q) < 2 or len(ys_q) < 2:
        return []
    if len(xs_q) > max_grid or len(ys_q) > max_grid:
        return []  # over-dense arrangement: skip (conservative)
    # representative world coords per quantized value
    xmap = {int(v): 0.0 for v in xs_q}
    ymap = {int(v): 0.0 for v in ys_q}
    for f in range(len(polys)):
        for c in range(3):
            xmap[int(qv[f, c, 0])] = float(polys[f, c, 0])
            ymap[int(qv[f, c, 1])] = float(polys[f, c, 1])
    xs = np.asarray([xmap[int(v)] for v in xs_q])
    ys = np.asarray([ymap[int(v)] for v in ys_q])

    nx, ny = len(xs) - 1, len(ys) - 1
    cov_area = np.zeros((ny, nx), np.float64)
    slow_cells: dict = {}
    fast_sigs: dict = {}

    # fast path: half-cell lattice triangles (3 vertices on 3 distinct
    # corners of a single grid cell).  A cell is covered by the fast path
    # iff it holds BOTH halves of one diagonal — signature pairs whose
    # union is all 4 corners and whose intersection is a true diagonal
    # ({(0,0),(1,1)} or {(0,1),(1,0)}); same-side or opposite-diagonal
    # pairs overlap and prove nothing.
    xi = np.searchsorted(xs_q, qv[:, :, 0])
    yi = np.searchsorted(ys_q, qv[:, :, 1])
    xi_lo, xi_hi = xi.min(axis=1), xi.max(axis=1)
    yi_lo, yi_hi = yi.min(axis=1), yi.max(axis=1)
    half_cell = (xi_hi - xi_lo == 1) & (yi_hi - yi_lo == 1)
    # corner ids within the cell: (xoff)*2 + (yoff) ∈ {0, 1, 2, 3}
    corner_id = (xi - xi_lo[:, None]) * 2 + (yi - yi_lo[:, None])
    distinct = np.asarray(
        [len(set(map(int, row))) == 3 for row in corner_id]
    )
    half_cell &= distinct
    for f in np.nonzero(half_cell)[0]:
        i, j = int(yi_lo[f]), int(xi_lo[f])
        fast_sigs.setdefault((i, j), set()).add(
            frozenset(map(int, corner_id[f]))
        )

    _DIAGS = (frozenset((0, 3)), frozenset((1, 2)))

    def fast_covered(sigs) -> bool:
        sigs = list(sigs)
        for a in range(len(sigs)):
            for b in range(a + 1, len(sigs)):
                inter = sigs[a] & sigs[b]
                if len(sigs[a] | sigs[b]) == 4 and inter in _DIAGS:
                    return True
        return False

    # slow path: everything else, clipped per touched cell with pairwise
    # overlap rejection (area-sum is a union proof only without overlap)
    for f in np.nonzero(~half_cell)[0]:
        poly = polys[f]
        j0 = max(int(np.searchsorted(xs, poly[:, 0].min() + tol) - 1), 0)
        j1 = min(int(np.searchsorted(xs, poly[:, 0].max() - tol)), nx)
        i0 = max(int(np.searchsorted(ys, poly[:, 1].min() + tol) - 1), 0)
        i1 = min(int(np.searchsorted(ys, poly[:, 1].max() - tol)), ny)
        if (j1 - j0) * (i1 - i0) > 64:
            continue  # cap the work; uncounted area is conservative
        for i in range(i0, i1):
            for j in range(j0, j1):
                clip = _clip_poly_to_box(
                    poly, (xs[j], ys[i]), (xs[j + 1], ys[i + 1])
                )
                a = _poly_area(clip)
                if a <= 0:
                    continue
                slow_cells.setdefault((i, j), []).append(clip)
                cov_area[i, j] += a

    # overlap rejection for slow cells: area-sum proves the union only when
    # the clipped polygons are pairwise disjoint
    for (i, j), clips in slow_cells.items():
        ok = True
        for aidx in range(len(clips)):
            for bidx in range(aidx + 1, len(clips)):
                if _convex_intersection_area(clips[aidx], clips[bidx]) > tol * tol:
                    ok = False
                    break
            if not ok:
                break
        if not ok:
            cov_area[i, j] = 0.0

    cell_w = np.diff(xs)[None, :]
    cell_h = np.diff(ys)[:, None]
    cell_area = cell_w * cell_h
    # slow-path covered: union area (== sum, overlap-free) fills the cell.
    # The 1e-6 relative slack absorbs f64 clip arithmetic on f32-snapped
    # coords; over-covered cells would mean an undetected overlap — reject.
    covered = (cov_area >= cell_area * (1 - 1e-6)) & (
        cov_area <= cell_area * (1 + 1e-6)
    )
    # the fast proof (a complementary diagonal half-pair) is sufficient on
    # its own — coverage is monotone, extra triangles never invalidate a
    # covering subset — so it ORs with the slow-path proof
    for (i, j), sigs in fast_sigs.items():
        if fast_covered(sigs):
            covered[i, j] = True

    out = []
    for (i0, j0, i1, j1) in _maximal_rectangles(covered):
        a0, a1 = xs[j0], xs[j1]
        b0, b1 = ys[i0], ys[i1]
        if (a1 - a0) < min_side or (b1 - b0) < min_side:
            continue
        area = (a1 - a0) * (b1 - b0)
        if area < min_area:
            continue
        out.append((area, a0, b0, a1, b1))
    return out


# ---------------------------------------------------------------------------
# device-side blocking test (used by ops.pallas_culled.cull_blocks)
# ---------------------------------------------------------------------------


def occluder_plane_bounds(
    occ: OccluderSet,
    bo_lo, bo_hi,      # 3-tuples of [G] group origin-box bounds
    d_lo, d_hi,        # 3-tuples of [G] group direction-cone bounds
):
    """Per-group effective blocking planes (p_eff_lo, p_eff_hi), each [3, G].

    For axis k: every cluster with lo_k strictly greater than p_eff_hi[k]
    (resp. hi_k strictly less than p_eff_lo[k]) is provably unreachable by
    every ray of the group — its candidate entry can be dropped exactly.

    The crossing-point interval of rays (o ∈ origin box, d ∈ cone) at plane
    x_k = p is o_ab + gap·(d_ab/d_k) with gap = p − o_k; all three factors
    are intervals, composed conservatively.  Blocking requires the group's
    origin box strictly separated from the plane (sep_margin) and the cone
    strictly toward it (d_k ≥ _D_MIN for 'up', ≤ −_D_MIN for 'down'), so
    the crossing t is bounded away from 0 and never rejected by t_min.
    """
    G = bo_lo[0].shape[0]
    BO_LO = jnp.stack(bo_lo)   # [3, G]
    BO_HI = jnp.stack(bo_hi)
    D_LO = jnp.stack(d_lo)
    D_HI = jnp.stack(d_hi)

    ax = jnp.asarray(occ.axis, jnp.int32)   # [K] (static tuple → array)
    a_ax = (ax + 1) % 3
    b_ax = (ax + 2) % 3
    p = occ.p[:, None]         # [K, 1]
    m = occ.sep_margin

    def takeg(M, idx):
        return jnp.take(M, idx, axis=0)  # [K, G]

    o_lo_k, o_hi_k = takeg(BO_LO, ax), takeg(BO_HI, ax)
    dk_lo, dk_hi = takeg(D_LO, ax), takeg(D_HI, ax)

    def cross_within(gap_lo, gap_hi, dkl, dkh, axes):
        """Crossing interval containment for one rect axis set."""
        within = jnp.ones(gap_lo.shape, bool)
        for col, aidx in enumerate(axes):
            da_lo, da_hi = takeg(D_LO, aidx), takeg(D_HI, aidx)
            # ratio interval r = d_a / d_k over the 4 corner combos
            r00 = da_lo / dkl
            r01 = da_lo / dkh
            r10 = da_hi / dkl
            r11 = da_hi / dkh
            r_lo = jnp.minimum(jnp.minimum(r00, r01), jnp.minimum(r10, r11))
            r_hi = jnp.maximum(jnp.maximum(r00, r01), jnp.maximum(r10, r11))
            # product interval gap·r (gap > 0)
            c00 = gap_lo * r_lo
            c01 = gap_lo * r_hi
            c10 = gap_hi * r_lo
            c11 = gap_hi * r_hi
            prod_lo = jnp.minimum(jnp.minimum(c00, c01), jnp.minimum(c10, c11))
            prod_hi = jnp.maximum(jnp.maximum(c00, c01), jnp.maximum(c10, c11))
            o_a_lo, o_a_hi = takeg(BO_LO, aidx), takeg(BO_HI, aidx)
            cr_lo = o_a_lo + prod_lo
            cr_hi = o_a_hi + prod_hi
            within &= (cr_lo >= occ.rect_lo[:, col:col + 1]) & (
                cr_hi <= occ.rect_hi[:, col:col + 1]
            )
        return within

    # group below the plane, cone strictly upward in k
    gap_lo_u = p - o_hi_k
    gap_hi_u = p - o_lo_k
    up_ok = (gap_lo_u >= m) & (dk_lo >= _D_MIN)
    blocked_up = up_ok & cross_within(
        jnp.maximum(gap_lo_u, m), gap_hi_u,
        jnp.maximum(dk_lo, _D_MIN), jnp.maximum(dk_hi, _D_MIN),
        (a_ax, b_ax),
    )
    # group above the plane, cone strictly downward in k (mirror k)
    gap_lo_d = o_lo_k - p
    gap_hi_d = o_hi_k - p
    dn_ok = (gap_lo_d >= m) & (dk_hi <= -_D_MIN)
    blocked_dn = dn_ok & cross_within(
        jnp.maximum(gap_lo_d, m), gap_hi_d,
        jnp.maximum(-dk_hi, _D_MIN), jnp.maximum(-dk_lo, _D_MIN),
        (a_ax, b_ax),
    )

    inf = jnp.float32(jnp.inf)
    p_eff_hi = jnp.full((3, G), inf)
    p_eff_lo = jnp.full((3, G), -inf)
    pk = jnp.broadcast_to(p, blocked_up.shape)
    ax_np = np.asarray(occ.axis)
    for k in range(3):
        on_axis = jnp.asarray(ax_np == k)[:, None]
        hi_k = jnp.where(on_axis & blocked_up, pk, inf).min(axis=0)
        lo_k = jnp.where(on_axis & blocked_dn, pk, -inf).max(axis=0)
        p_eff_hi = p_eff_hi.at[k].set(hi_k)
        p_eff_lo = p_eff_lo.at[k].set(lo_k)
    return p_eff_lo, p_eff_hi


def occluder_blocked_clusters(
    occ: OccluderSet,
    bo_lo, bo_hi,          # 3-tuples of [G] group origin-box bounds
    d_lo, d_hi,            # 3-tuples of [G] group direction-cone bounds
    cluster_lo, cluster_hi,  # [C, 3] cluster AABBs
):
    """[G, C] mask of clusters provably unreachable by every ray of each
    group — the cull-time PVS test.

    Two conservative shaft arguments are OR-ed per occluder:

      * **Cone crossing** (occluder_plane_bounds): when the group's
        direction cone is strictly toward the plane, the crossing-point
        interval is direction-bounded — tight for narrow cones, but an
        octant-wedge cone always touches d_k = 0, so bake wedges never
        engage it.
      * **Box-union shaft** (direction-free): every segment from a point
        of the origin box O to a point of a cluster box B crosses the
        separating plane at a CONVEX COMBINATION of its endpoints, so the
        crossing point lies inside hull(O, B)'s projection — if that union
        interval fits inside the proven rectangle (and O, B are strictly
        separated by the plane with sep_margin), every such segment hits
        the occluder strictly first.  This is what fires on hemisphere
        fans: it removes the behind-wall near shell whose distance bounds
        sit under the occlusion-exit threshold (exactly the visited set
        the round-3 analysis proved no exit mechanism can skip).
    """
    G = bo_lo[0].shape[0]
    C = cluster_lo.shape[0]

    # cone path → per-axis effective planes → cluster compare
    p_eff_lo, p_eff_hi = occluder_plane_bounds(occ, bo_lo, bo_hi, d_lo, d_hi)
    m = occ.sep_margin
    blocked = jnp.zeros((G, C), jnp.bool_)
    for k in range(3):
        blocked |= cluster_lo[None, :, k] > p_eff_hi[k][:, None] + m
        blocked |= cluster_hi[None, :, k] < p_eff_lo[k][:, None] - m

    # box-shaft path, per occluder (K is small and static: unrolled loop
    # keeps the [G, C] working set to one mask).  The crossing point of a
    # segment o→h at the plane is (1−s)·o + s·h with s = (p−o_k)/(h_k−o_k);
    # s is monotone in both endpoints' k-coordinates, so with strict
    # separation s ∈ [s_min, s_max] computed from the box bounds, and the
    # crossing interval per rect axis is the hull of the two linear
    # endpoint evaluations.  This is FAR tighter than the plain union box:
    # a distant cluster (s_max ≪ 1) crosses near the group's own
    # projection, so whole far rooms fall inside one wall panel's
    # rectangle — occluder fusion is unnecessary for them.
    BO_LO = jnp.stack(bo_lo)
    BO_HI = jnp.stack(bo_hi)
    for i in range(occ.num_occluders):
        k = int(occ.axis[i])
        a, b = (k + 1) % 3, (k + 2) % 3
        p = occ.p[i]

        for sign in (+1, -1):
            # sign=+1: group below the plane, cluster above; −1 mirrored.
            if sign > 0:
                o_near, o_far = BO_HI[k][:, None], BO_LO[k][:, None]
                c_near = cluster_lo[None, :, k]
                c_far = cluster_hi[None, :, k]
                side = (o_near <= p - m) & (c_near > p + m)
                gap_lo = p - o_near
                gap_hi = p - o_far
                den_max = c_near - o_far     # pairs with gap_hi
                den_min = c_far - o_near     # pairs with gap_lo
            else:
                o_near, o_far = BO_LO[k][:, None], BO_HI[k][:, None]
                c_near = cluster_hi[None, :, k]
                c_far = cluster_lo[None, :, k]
                side = (o_near >= p + m) & (c_near < p - m)
                gap_lo = o_near - p
                gap_hi = o_far - p
                den_max = o_far - c_near
                den_min = o_near - c_far
            s_max = gap_hi / jnp.maximum(den_max, 1e-12)
            s_min = gap_lo / jnp.maximum(den_min, 1e-12)
            fit = jnp.ones((G, C), jnp.bool_)
            for col, aidx in ((0, a), (1, b)):
                o_lo_a = BO_LO[aidx][:, None]
                o_hi_a = BO_HI[aidx][:, None]
                c_lo_a = cluster_lo[None, :, aidx]
                c_hi_a = cluster_hi[None, :, aidx]
                lo1 = o_lo_a + s_min * (c_lo_a - o_lo_a)
                lo2 = o_lo_a + s_max * (c_lo_a - o_lo_a)
                hi1 = o_hi_a + s_min * (c_hi_a - o_hi_a)
                hi2 = o_hi_a + s_max * (c_hi_a - o_hi_a)
                fit &= (jnp.minimum(lo1, lo2) >= occ.rect_lo[i, col]) & (
                    jnp.maximum(hi1, hi2) <= occ.rect_hi[i, col]
                )
            blocked |= side & fit
    return blocked
