"""Anchor the huge-scene (377k-tri, 30-room) bake number to a measured
own-room floor (VERDICT r5 task #4).

Round 3 derived the big scene's exit-family bound: per-ROW ideal visits
(each wedge row gated by its own worst ray, per-row candidate lists)
~= one room of clusters, giving ideal ~= single_pass_mrays x
(group_visits / row_visits) ~= 6.5 Mrays/s, of which the shipped two-pass
realizes ~85%.  The huge scene had no such anchor — 2.37 Mrays/s was
unplaced.  This script computes the same telemetry for BOTH scenes at the
shipped kernel config (lb=4, fan_block=16, exit_rows=8, occluder-culled
candidate lists):

  * t_true: real kernel trace of a 4096-texel bake batch (TPU),
  * baseline visits: per er-group candidate walk depth at the group's
    true max hit t (the lockstep exit's cost),
  * per-row ideal visits: tf=1 candidate lists gated per row — the
    unreachable floor of any exit-based schedule,
  * measured single-pass + shipped two-pass throughput (same process),
  * ideal = single_pass x (baseline visits / row-ideal visits); realized%
    = shipped / ideal.

Usage (TPU): python scripts/huge_bound.py [--scene huge|big] [--out f.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPP = 2048
BATCH = 4096
G = 4
LB = 4
FB = 16
ER = 8


def visits(dist, count, thr):
    out = np.zeros(len(count), np.int64)
    for i in range(len(count)):
        d = dist[i, : count[i]]
        out[i] = int(np.searchsorted(d, thr[i]))
    return out


def visits_device(clusters, op, dp, tf, occ, thr_np):
    """Per-group visit counts computed ON DEVICE: only [RB] ints cross the
    tunnel instead of the [RB, C] distance table (192 MB per call on the
    huge scene — transfer-bound through the relay)."""
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.ops.pallas_culled import cull_blocks

    @jax.jit
    def one(thr):
        _, count, dist = cull_blocks(clusters, op, op, dp, tf, occluders=occ)
        d = dist.reshape(-1, dist.shape[-1])
        c = count.reshape(-1)
        idx = jnp.arange(d.shape[-1])[None, :]
        v = jnp.sum((d < thr[:, None]) & (idx < c[:, None]), axis=1)
        return v, c

    v, c = one(jnp.asarray(thr_np))
    return np.asarray(v).astype(np.int64), np.asarray(c)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from texir_code_tpu.data.synthetic import make_building_scene
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.geometry.occluders import extract_occluders
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
    ap.add_argument("--scene", default="huge", choices=["big", "huge"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--row-chunk", type=int, default=2048)
    args = ap.parse_args()

    if args.scene == "huge":
        syn = make_building_scene(atlas_res=256, rooms=(6, 5), subdiv=28)
        cut = 0.16
    else:
        syn = make_building_scene(atlas_res=256, subdiv=28)
        cut = 0.25
    print(f"{args.scene}: {syn.mesh.num_faces} triangles", flush=True)

    fb = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    tbl = build_tbl_from_flat(fb, syn.mesh, syn.hdr_texture)
    fan = FanScene.from_flat(fb, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=LB, dense=True)
    occ = extract_occluders(syn.mesh)
    geom = bake_geometry_textures(syn.mesh, 128)
    print(f"clusters: {clusters.num_clusters}, occluders: "
          f"{len(occ.axis) if occ is not None else 0}", flush=True)

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

    print("tracing batch on the kernel...", flush=True)
    hit = cast_fans_culled(clusters, rows_o, rows_d, fan_block=FB,
                           exit_rows=ER, occluders=occ)
    t_true = np.asarray(hit.t)
    T, R = t_true.shape
    diam = float(np.asarray(clusters.diameter))
    tcap = 1.05 * diam
    row_true = np.where(
        np.isfinite(t_true).any(1),
        np.nanmax(np.where(np.isfinite(t_true), t_true, np.nan), axis=1),
        tcap,
    )

    # baseline: er-group lists + group max-t exit (the lockstep cost)
    tg = t_true.reshape(-1, ER * R)
    fin = np.isfinite(tg)
    maxt = np.where(
        fin.any(1), np.nanmax(np.where(fin, tg, np.nan), axis=1), np.inf
    )
    v_base, count = visits_device(
        clusters, rows_o, rows_d, ER, occ, np.minimum(maxt, tcap)
    )
    print(f"baseline (er={ER}, occ): visits mean={v_base.mean():.0f} "
          f"p90={np.percentile(v_base, 90):.0f} cand mean={count.mean():.0f}",
          flush=True)

    # exit-group-size ladder: visits at tf in {4, 2, 1} with tf-group
    # lists + tf-group max-t exits, chunked over rows.  Total kernel work
    # ∝ mean visits per group regardless of tf (each visited candidate is
    # tested against the group's tf rows; groups = T/tf — the round-3
    # accounting), so visits(tf=4)/visits(tf=8) IS the maximum payoff of
    # breaking the er=4 SMEM wall with HBM-streamed candidate windows,
    # before any streaming overhead.
    ladder = {}
    for tf in (4, 2, 1):
        v_parts, c_parts = [], []
        for i0 in range(0, T, args.row_chunk):
            sl = slice(i0, min(i0 + args.row_chunk, T))
            op = tuple(a[sl] for a in rows_o)
            dp = tuple(a[sl] for a in rows_d)
            tg1 = t_true[sl].reshape(-1, tf * R)
            fin1 = np.isfinite(tg1)
            mt = np.where(
                fin1.any(1),
                np.nanmax(np.where(fin1, tg1, np.nan), axis=1), np.inf,
            )
            v1, c1 = visits_device(
                clusters, op, dp, tf, occ, np.minimum(mt, tcap)
            )
            v_parts.append(v1)
            c_parts.append(c1)
        v_tf = np.concatenate(v_parts)
        c_tf = np.concatenate(c_parts)
        ladder[tf] = {
            "visits_mean": float(v_tf.mean()),
            "visits_p90": float(np.percentile(v_tf, 90)),
            "cand_mean": float(c_tf.mean()),
            "speedup_vs_er8": float(v_base.mean() / max(v_tf.mean(), 1.0)),
        }
        print(f"tf={tf} (occ): visits mean={v_tf.mean():.0f} "
              f"p90={np.percentile(v_tf, 90):.0f} cand mean={c_tf.mean():.0f} "
              f"-> x{ladder[tf]['speedup_vs_er8']:.2f} vs er={ER}", flush=True)
    v_row_mean = ladder[1]["visits_mean"]

    ratio = v_base.mean() / max(v_row_mean, 1.0)

    # throughput anchors, same process: single-pass + shipped two-pass
    print("measuring single-pass throughput...", flush=True)
    sp_mrays, _ = bench._bake_scene(
        syn, n_meas=2, fan_block=FB, exit_rows=ER, occluders=True
    )
    print(f"single-pass + occ: {sp_mrays:.2f} Mrays/s", flush=True)
    print("measuring shipped two-pass throughput...", flush=True)
    tp_mrays, _ = bench._bake_scene(
        syn, n_meas=2, fan_block=FB, exit_rows=ER, two_pass_cut=cut,
        occluders=True,
    )
    print(f"two-pass {cut} + occ: {tp_mrays:.2f} Mrays/s", flush=True)

    ideal = sp_mrays * ratio
    out = {
        "scene": args.scene,
        "triangles": int(syn.mesh.num_faces),
        "clusters": int(clusters.num_clusters),
        "visits_baseline_mean": float(v_base.mean()),
        "visits_row_ideal_mean": float(v_row_mean),
        "cand_group_mean": float(count.mean()),
        "exit_ladder": ladder,
        "visit_ratio": float(ratio),
        "single_pass_mrays": float(sp_mrays),
        "shipped_two_pass_mrays": float(tp_mrays),
        "two_pass_cut": cut,
        "row_ideal_mrays_est": float(ideal),
        "realized_pct_of_ideal": float(100 * tp_mrays / ideal),
    }
    print("BOUND " + json.dumps(out), flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
