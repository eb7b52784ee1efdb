"""Estimate a multi-cut (3-pass) trace ladder from one real trace.

Two-pass at cut=0.25 lifted the building bake 2.97->4.81; the per-row
ideal sits at ~2.2x fewer visits than single-pass (binning_estimate).
This script evaluates cut ladders (c1, c2) analytically: pass-k walks
groups to min(ck, group-max-t); rows with any ray unresolved re-trace in
the next pass.  Prints expected visit cost per ladder to pick (c1, c2)
before building the 3-pass entry point.

Usage: python scripts/cut_ladder_estimate.py [--scene big]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096
G = 4


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
    args = ap.parse_args()

    if args.scene == "big":
        syn = make_building_scene(atlas_res=256, subdiv=28)
    else:
        syn = make_apartment_scene(atlas_res=256, subdiv=24)
    ER = args.er

    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=args.lb, dense=True)
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
    T, R = t_true.shape
    diam = float(np.asarray(clusters.diameter))
    tcap = 1.05 * diam

    cand, count, dist = cull_blocks(clusters, rows_o, rows_o, rows_d, ER)
    dist = np.asarray(dist).reshape(-1, clusters.num_clusters)
    count = np.asarray(count).reshape(-1)
    ng = len(count)

    t_g = t_true.reshape(ng, ER * R)
    fin = np.isfinite(t_g)
    maxt = np.where(fin.any(1), np.nanmax(
        np.where(fin, t_g, np.nan), axis=1), tcap)

    def visits(thr):
        v = np.zeros(ng, np.int64)
        for i in range(ng):
            v[i] = np.searchsorted(dist[i, : count[i]], thr[i])
        return v

    base = visits(np.minimum(maxt, tcap))
    print(f"groups={ng} C={clusters.num_clusters} cand_mean={count.mean():.0f} "
          f"single-pass visits mean={base.mean():.0f}")

    # row-level t and finality: a row re-traces if any of its rays is
    # unresolved; resolution after pass at cut c: ray final iff t<=c or
    # its group's whole list < c (approximated by per-group last dist)
    last = np.array([
        dist[i, count[i] - 1] if count[i] else 0.0 for i in range(ng)
    ])
    t_rows = t_true.reshape(T, R)
    rowmax = np.where(np.isfinite(t_rows).any(1), np.nanmax(
        np.where(np.isfinite(t_rows), t_rows, np.nan), 1), tcap)

    rows_per_group = ER

    def ladder(cuts):
        # pass 1 over all groups
        total = visits(np.minimum(np.minimum(maxt, cuts[0]), tcap)).sum()
        # rows unresolved after pass k (group-exhausted lists count as final)
        grp_done = last < cuts[0]
        row_final = (rowmax <= cuts[0]) | np.repeat(grp_done, rows_per_group)
        frac_prev = 1.0
        for ci in range(1, len(cuts) + 1):
            c = cuts[ci] if ci < len(cuts) else tcap
            rows_left = np.nonzero(~row_final)[0]
            frac = len(rows_left) / T
            if len(rows_left) == 0:
                break
            # compacted groups of ER consecutive straggler rows: group max-t
            # over the straggler rows (per-row cull approximated by the
            # rows' ORIGINAL groups' lists — pessimistic on origin boxes,
            # optimistic on direction cones; good enough to rank ladders)
            rm = rowmax[rows_left]
            pad = (-len(rm)) % rows_per_group
            rm = np.concatenate([rm, np.zeros(pad)])
            gmax = rm.reshape(-1, rows_per_group).max(1)
            gsrc = np.repeat(rows_left // rows_per_group, 1)[
                : len(gmax) * rows_per_group // rows_per_group]
            # use each compacted group's first source group's list
            src = rows_left[::rows_per_group][: len(gmax)] // rows_per_group
            v = 0
            for gi, s in zip(range(len(gmax)), src):
                thr = min(min(gmax[gi], c), tcap)
                v += np.searchsorted(dist[s, : count[s]], thr)
            total += v
            row_final = row_final | (rowmax <= c)
            frac_prev = frac
        return total / ng, frac_prev

    for cuts in [
        (0.25 * diam,),
        (0.3 * diam,),
        (0.12 * diam, 0.3 * diam),
        (0.15 * diam, 0.35 * diam),
        (0.1 * diam, 0.25 * diam),
        (0.2 * diam, 0.45 * diam),
        (0.08 * diam, 0.2 * diam),
        (0.1 * diam, 0.2 * diam, 0.4 * diam),
    ]:
        tot, lastfrac = ladder(list(cuts))
        cstr = "/".join(f"{c/diam:.2f}" for c in cuts)
        print(f"ladder {cstr}: visits/group {tot:.0f} "
              f"({tot/base.mean():.2f}x base), last-pass rows {lastfrac:.3f}")


if __name__ == "__main__":
    main()
