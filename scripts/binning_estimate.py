"""Estimate the win of t-class row binning before building it.

The culled kernel's occlusion exit is gated by the WORST ray of each exit
group; on multi-room scans rows that see far geometry (doorways) share
groups with rows that stop at the near wall, dragging the whole group
through the far candidate tail (PERF.md round 3).  Idea: the rays' walk
depths are cheaply predictable by a proxy trace (k largest triangles), so
REORDER the wedge rows — within (wedge, spatial bucket) — by their proxy
row-max-t before blocking.  Groups become homogeneous in walk depth: the
many short-range groups exit at the near wall; only the few far-range
groups stream the tail.  A pure permutation (the estimator is
order-invariant over rows after unwedging... rows must be scattered back),
exact by construction.

This script simulates group visit counts from a real trace + cull tables:
  baseline (current row order) vs binned (t-class within bucket) vs the
  per-row ideal, at the bench building config.

Usage: python scripts/binning_estimate.py [--scene big] [--bucket 256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096
G = 4


def visits(dist, count, thr):
    out = np.zeros(len(count), np.int64)
    for i in range(len(count)):
        d = dist[i, : count[i]]
        out[i] = int(np.searchsorted(d, thr[i]))
    return out


def main():
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import (
        make_apartment_scene,
        make_building_scene,
    )
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.models.tbl import build_tbl_from_flat
    from texir_code_tpu.models.tracer_irt import (
        IrradianceTextureBaker,
        bake_geometry_textures,
        morton_order,
    )
    from texir_code_tpu.ops.fan_raycast import FanScene
    from texir_code_tpu.ops.pallas_culled import (
        ClusterScene,
        cast_fans_culled,
        cull_blocks,
        sort_dirs_octant,
        tile_rows,
        wedge_rows,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="big", choices=["big", "apt"])
    ap.add_argument("--lb", type=int, default=4)
    ap.add_argument("--fb", type=int, default=16)
    ap.add_argument("--er", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=256)
    ap.add_argument("--proxy_k", type=int, default=1024)
    args = ap.parse_args()

    if args.scene == "big":
        syn = make_building_scene(atlas_res=256, subdiv=28)
    else:
        syn = make_apartment_scene(atlas_res=256, subdiv=24)
    ER, LB = args.er, args.lb

    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=LB, dense=True)
    proxy = ClusterScene.proxy_from_fan(fan, k=args.proxy_k)
    geom = bake_geometry_textures(syn.mesh, 128)

    vr, vc = np.nonzero(geom.valid)
    order = morton_order(geom.position[vr, vc])
    vr, vc = vr[order], vc[order]
    pts = geom.position[vr, vc][:BATCH]
    nrm = geom.normal[vr, vc][:BATCH]

    baker = IrradianceTextureBaker(
        tbl, spp=SPP, texel_batch=BATCH, cluster_scene=clusters, wedges=G
    )
    pts_j = jnp.asarray(pts)
    nrm_j = jnp.asarray(nrm)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    nrm_t = tuple(nrm_j[:, k] for k in range(3))
    dirs = baker._fan_dirs(nrm_t, ids, jnp.int32(7))
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, G) for a in ds)
    origins = tuple(
        pts_j[:, k] + baker.surface_eps * nrm_j[:, k] for k in range(3)
    )
    rows_o = tuple(tile_rows(a, G) for a in origins)

    hit = cast_fans_culled(clusters, rows_o, rows_d, fan_block=args.fb,
                           exit_rows=ER)
    t_true = np.asarray(hit.t)
    hp = cast_fans_culled(proxy, rows_o, rows_d, fan_block=args.fb,
                          exit_rows=ER)
    t_proxy = np.asarray(hp.t)
    T, R = t_true.shape
    diam = float(np.asarray(clusters.diameter))
    tcap = 1.05 * diam

    # per-row keys
    row_true = np.where(np.isfinite(t_true).any(1), np.nanmax(
        np.where(np.isfinite(t_true), t_true, np.nan), axis=1), tcap)
    row_proxy = np.where(np.isfinite(t_proxy).any(1), np.nanmax(
        np.where(np.isfinite(t_proxy), t_proxy, np.nan), axis=1), tcap)
    print(f"proxy row-max vs true row-max: corr="
          f"{np.corrcoef(row_true, row_proxy)[0, 1]:.3f} "
          f"ratio mean={np.mean(row_proxy / np.maximum(row_true, 1e-6)):.2f}")

    o_np = tuple(np.asarray(a) for a in rows_o)
    d_np = tuple(np.asarray(a) for a in rows_d)

    def eval_order(perm, label):
        op = tuple(jnp.asarray(o_np[k][perm]) for k in range(3))
        dp = tuple(jnp.asarray(d_np[k][perm]) for k in range(3))
        _, count, dist = cull_blocks(clusters, op, op, dp, ER)
        dist = np.asarray(dist).reshape(-1, clusters.num_clusters)
        count = np.asarray(count).reshape(-1)
        tg = t_true[perm].reshape(-1, ER * R)
        fin = np.isfinite(tg)
        maxt = np.where(fin.any(1), np.nanmax(
            np.where(fin, tg, np.nan), axis=1), np.inf)
        v = visits(dist, count, np.minimum(maxt, tcap))
        print(f"{label}: visits mean={v.mean():.0f} p90={np.percentile(v, 90):.0f} "
              f"cand mean={count.mean():.0f}")
        return v.mean()

    base = eval_order(np.arange(T), "baseline         ")

    # t-class binning: within (wedge, bucket of consecutive fans) sort rows
    # by proxy row-max-t.  Wedge-major layout: row w*BATCH + f.
    bt = args.bucket
    perm = np.arange(T)
    for w in range(G):
        for b0 in range(0, BATCH, bt):
            sl = slice(w * BATCH + b0, w * BATCH + min(b0 + bt, BATCH))
            idx = np.arange(sl.start, sl.stop)
            perm[sl] = idx[np.argsort(row_proxy[idx], kind="stable")]
    eval_order(perm, f"binned(proxy,{bt:4d})")

    # oracle keys (true t) — upper bound for the binning family
    perm2 = np.arange(T)
    for w in range(G):
        for b0 in range(0, BATCH, bt):
            sl = slice(w * BATCH + b0, w * BATCH + min(b0 + bt, BATCH))
            idx = np.arange(sl.start, sl.stop)
            perm2[sl] = idx[np.argsort(row_true[idx], kind="stable")]
    eval_order(perm2, f"binned(true, {bt:4d})")

    # per-row ideal (exit gated by each row alone, current lists)
    _, count, dist = cull_blocks(clusters, rows_o, rows_o, rows_d, 1)
    dist = np.asarray(dist).reshape(-1, clusters.num_clusters)
    count = np.asarray(count).reshape(-1)
    v = visits(dist, count, np.minimum(row_true, tcap))
    print(f"per-row ideal    : visits mean={v.mean():.0f} "
          f"(x{base / max(v.mean(), 1):.1f} fewer)")


if __name__ == "__main__":
    main()
