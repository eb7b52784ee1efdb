"""Estimate the two-pass trace's win before building it.

PERF.md round-3 idea: pass 1 walks each exit-group's candidate list only up
to a distance cutoff (beta * scene diameter); rays whose hit t <= the stop
bound are FINAL.  Stragglers (rays needing far clusters) are compacted into
dense rows and re-traced in a second, much smaller kernel launch seeded with
pass-1 hit state.

This script simulates both passes from one real trace (true per-ray t) plus
the static cull tables, at the bench's building config (lb=4 dense, fb=16,
er=8, wedges=4), and prints per-beta:

  pass1 visits/group, final-ray fraction, straggler rows, pass2 visits,
  total visit cost vs today's single-pass visits.

Visits are the dominant kernel cost (each = lb*4 tri tests + DMA), so the
visit ratio approximates the achievable speedup of the walk itself.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096
G = 4  # wedges


def group_visits(dist, count, maxt, tcap):
    """#clusters visited by the early-exiting walk (per group)."""
    thr = np.minimum(maxt, tcap)
    vis = np.zeros(len(count), np.int64)
    for i in range(len(count)):
        d = dist[i, : count[i]]
        vis[i] = int(np.searchsorted(d, thr[i]))
    return vis


def main():
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import make_building_scene
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

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="big", choices=["big", "apt"])
    ap.add_argument("--lb", type=int, default=4)
    ap.add_argument("--fb", type=int, default=16)
    ap.add_argument("--er", type=int, default=8)
    args = ap.parse_args()

    if args.scene == "big":
        syn = make_building_scene(atlas_res=256, subdiv=28)
    else:
        from texir_code_tpu.data.synthetic import make_apartment_scene

        syn = make_apartment_scene(atlas_res=256, subdiv=24)
    FB, ER, LB = args.fb, args.er, args.lb

    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=LB, dense=True)
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

    hit = cast_fans_culled(
        clusters, rows_o, rows_d, fan_block=FB, exit_rows=ER
    )
    t_true = np.asarray(hit.t)  # [T, R]
    T, R = t_true.shape
    diam = float(np.asarray(clusters.diameter))
    tcap = 1.05 * diam

    cand, count, dist = cull_blocks(clusters, rows_o, rows_o, rows_d, ER)
    dist = np.asarray(dist).reshape(-1, clusters.num_clusters)
    count = np.asarray(count).reshape(-1)
    ng = len(count)  # T/ER groups

    t_g = t_true.reshape(ng, ER * R)
    maxt = np.where(np.isinf(t_g).all(axis=1), np.inf, t_g.max(axis=1))
    base_vis = group_visits(dist, count, maxt, tcap)
    print(
        f"scene={args.scene} T={T} R={R} groups={ng} C={clusters.num_clusters} "
        f"diam={diam:.1f} single-pass visits mean={base_vis.mean():.0f} "
        f"cand mean={count.mean():.0f}",
        flush=True,
    )

    o_np = tuple(np.asarray(a) for a in rows_o)
    d_np = tuple(np.asarray(a) for a in rows_d)

    for beta in [0.15, 0.2, 0.3, 0.4, 0.5]:
        cut = beta * diam
        # pass-1 stop bound per group: min(cutoff, early-exit threshold on
        # capped t, tcap); capped t = min(t_true, cut-as-if-far-rays-pend)
        t_cap1 = np.minimum(t_g, np.inf)
        thr1 = np.minimum(np.minimum(maxt, cut), tcap)
        vis1 = np.zeros(ng, np.int64)
        stopd = np.zeros(ng)
        for i in range(ng):
            d = dist[i, : count[i]]
            j1 = int(np.searchsorted(d, thr1[i]))
            vis1[i] = j1
            stopd[i] = d[j1] if j1 < count[i] else np.inf
        # a ray is final if its t <= the group's stop bound (unvisited
        # clusters are all farther), incl. the count-exhausted case
        final = t_true <= np.repeat(stopd, ER)[:, None]
        final |= np.repeat(stopd, ER)[:, None] >= tcap
        frac_final = final.mean()

        # row-granular compaction: keep whole rows containing any straggler
        row_bad = (~final).any(axis=1)
        nrb = int(row_bad.sum())
        bad_rows = np.nonzero(row_bad)[0]
        rpad2 = (-nrb) % ER
        sel = np.concatenate([bad_rows, np.zeros(rpad2, np.int64)])
        o_lo_r = tuple(jnp.asarray(o_np[k][sel]) for k in range(3))
        d_r = tuple(jnp.asarray(d_np[k][sel]) for k in range(3))
        _, count_r, dist_r = cull_blocks(clusters, o_lo_r, o_lo_r, d_r, ER)
        dist_r = np.asarray(dist_r).reshape(-1, clusters.num_clusters)
        count_r = np.asarray(count_r).reshape(-1)
        # straggler rows' exit thresholds: max UNFINAL t in the row (final
        # rays enter pass 2 with their t already settled... no: the exit
        # threshold is the max over ALL rays' current t; final rays carry
        # their true t, stragglers their (optimistic) true t too — the walk
        # still can't stop before the max over true t of the group
        t_rows = t_true[sel.astype(np.int64)]
        ngr = len(count_r)
        t_gr = t_rows.reshape(ngr, -1)
        maxtr = np.where(np.isinf(t_gr).all(axis=1), np.inf, t_gr.max(axis=1))
        visr = group_visits(dist_r, count_r, maxtr, tcap)
        totalr = vis1.sum() + visr.sum()
        print(
            f"beta={beta:.2f} ROW-compact: bad rows={nrb}/{T} "
            f"({nrb / T:.3f}) p2 vis/grp={visr.mean():.0f} "
            f"total={totalr} ratio={totalr / max(base_vis.sum(), 1):.3f}",
            flush=True,
        )

        # lane-compact stragglers (stable order), rows of R, blocks of FB
        flat_idx = np.nonzero(~final.reshape(-1))[0]
        ns = len(flat_idx)
        rows_needed = (ns + R - 1) // R
        # build per-straggler origin/dir
        row_of = flat_idx // R
        so = [o_np[k][row_of] for k in range(3)]
        sd = [d_np[k].reshape(-1)[flat_idx] for k in range(3)]
        pad = rows_needed * R - ns
        so = [np.concatenate([a, np.zeros(pad)]) for a in so]
        sd = [np.concatenate([a, np.zeros(pad)]) for a in sd]
        st = np.concatenate([t_true.reshape(-1)[flat_idx], np.full(pad, 0.0)])
        so2 = [a.reshape(rows_needed, R) for a in so]
        sd2 = [a.reshape(rows_needed, R) for a in sd]
        st2 = st.reshape(rows_needed, R)
        # pad rows to a multiple of ER
        rpad = (-rows_needed) % ER
        if rpad:
            so2 = [np.concatenate([a, np.zeros((rpad, R))]) for a in so2]
            sd2 = [np.concatenate([a, np.zeros((rpad, R))]) for a in sd2]
            st2 = np.concatenate([st2, np.zeros((rpad, R))])
        o_lo = tuple(jnp.asarray(a.min(axis=1)) for a in so2)
        o_hi = tuple(jnp.asarray(a.max(axis=1)) for a in so2)
        d2 = tuple(jnp.asarray(a) for a in sd2)
        _, count2, dist2 = cull_blocks(clusters, o_lo, o_hi, d2, ER)
        dist2 = np.asarray(dist2).reshape(-1, clusters.num_clusters)
        count2 = np.asarray(count2).reshape(-1)
        ng2 = len(count2)
        t_g2 = st2.reshape(ng2, -1)
        maxt2 = np.where((t_g2 == 0).all(axis=1), 0.0, t_g2.max(axis=1))
        vis2 = group_visits(dist2, count2, maxt2, tcap)
        total = vis1.sum() + vis2.sum()
        print(
            f"beta={beta:.2f}: final={frac_final:.3f} pass1 vis/grp="
            f"{vis1.mean():.0f} stragglers={ns} ({ns / (T * R):.3f}) "
            f"p2 groups={ng2} p2 vis/grp={vis2.mean():.0f} "
            f"total visits={total} vs base={base_vis.sum()} "
            f"ratio={total / max(base_vis.sum(), 1):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
