"""Culled Pallas fan kernel vs the exhaustive tracers (interpret mode).

The culled kernel must be exact: candidate construction + near-to-far
early-exit may only skip clusters that provably cannot contain a closer hit.
Oracle: ops.fan_raycast.cast_ray_fans with an exhaustive leaf budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texir_code_tpu.data.synthetic import make_apartment_scene
from texir_code_tpu.geometry.bvh import build_bvh
from texir_code_tpu.ops.fan_raycast import FanScene, cast_ray_fans
from texir_code_tpu.ops.pallas_culled import (
    ClusterScene,
    cast_fans_culled,
    cast_fans_culled_twopass,
    cast_ray_fans_wedged,
    cull_blocks,
    sort_dirs_octant,
    tile_rows,
    unwedge_rows,
    wedge_rows,
)
from texir_code_tpu.ops.sampling import generate_dir_soa


@pytest.fixture(scope="module")
def scene():
    syn = make_apartment_scene(atlas_res=64, subdiv=6, clutter=2)
    bvh = build_bvh(syn.mesh.vertices, syn.mesh.faces)
    fan = FanScene.from_flat(bvh, triangle_uvs=syn.mesh.triangle_uvs())
    clusters = ClusterScene.from_fan(fan, lb=8)
    return syn, bvh, fan, clusters


def _fan_batch(syn, t=16, s=512, seed=3):
    rng = np.random.default_rng(seed)
    sx, sy, sz = syn.size
    pts = np.stack(
        [rng.uniform(0.3, sx - 0.3, t), rng.uniform(0.3, sy - 0.3, t),
         rng.uniform(0.3, sz - 0.3, t)], axis=-1,
    ).astype(np.float32)
    nrm = rng.standard_normal((t, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    origins = tuple(jnp.asarray(pts[:, k]) for k in range(3))
    normals = tuple(jnp.asarray(nrm[:, k]) for k in range(3))
    dirs = generate_dir_soa(normals, s, jax.random.PRNGKey(seed), mode="uniform")
    return origins, normals, dirs


def test_wedge_roundtrip():
    x = jnp.arange(6 * 512, dtype=jnp.float32).reshape(6, 512)
    w = wedge_rows(x, 4)
    assert w.shape == (24, 128)
    assert jnp.array_equal(unwedge_rows(w, 4), x)
    t = tile_rows(jnp.arange(6.0), 4)
    assert t.shape == (24,)
    assert float(t[6]) == 0.0 and float(t[7]) == 1.0


def test_sort_dirs_preserves_set(scene):
    syn = scene[0]
    _, _, dirs = _fan_batch(syn, t=4, s=256)
    ds = sort_dirs_octant(dirs)
    for k in range(3):
        assert np.allclose(
            np.sort(np.asarray(dirs[k]), axis=1),
            np.sort(np.asarray(ds[k]), axis=1),
            atol=0,
        )
    # sorted by octant key: key must be non-decreasing along rows
    key = (
        (np.asarray(ds[0]) < 0) * 4
        + (np.asarray(ds[1]) < 0) * 2
        + (np.asarray(ds[2]) < 0)
    )
    assert (np.diff(key, axis=1) >= 0).all()


def test_culled_matches_exhaustive(scene):
    syn, bvh, fan, clusters = scene
    origins, normals, dirs = _fan_batch(syn, t=16, s=512)

    ref = cast_ray_fans(
        fan, origins, dirs, max_leaves=fan.num_leaves,
    )

    hit, ds = cast_ray_fans_wedged(
        clusters, origins, dirs, wedges=4, interpret=True,
    )
    # compare per-ray sets: sort both by direction to realign rays
    for k in range(16):
        ref_t = np.asarray(ref.t[k])
        got_t = np.asarray(hit.t[k])
        # realign: ref rays sorted the same way the culled path sorted them
        order_ref = np.lexsort(
            (np.asarray(dirs[2][k]), np.asarray(dirs[1][k]), np.asarray(dirs[0][k]))
        )
        order_got = np.lexsort(
            (np.asarray(ds[2][k]), np.asarray(ds[1][k]), np.asarray(ds[0][k]))
        )
        np.testing.assert_allclose(
            ref_t[order_ref], got_t[order_got], rtol=1e-5, atol=1e-5
        )
        assert (
            np.asarray(ref.prim[k])[order_ref]
            == np.asarray(hit.prim[k])[order_got]
        ).all()


def test_culled_emit_uv(scene):
    syn, bvh, fan, clusters = scene
    assert clusters.has_uv
    origins, normals, dirs = _fan_batch(syn, t=8, s=256, seed=11)
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 2) for a in ds)
    rows_o = tuple(tile_rows(a, 2) for a in origins)
    plain = cast_fans_culled(clusters, rows_o, rows_d, interpret=True)
    withuv = cast_fans_culled(
        clusters, rows_o, rows_d, interpret=True, emit_uv=True
    )
    # uv-emitting kernel: same hits, uv = barycentric lerp of corner uvs
    np.testing.assert_allclose(plain.t, withuv.t, rtol=1e-6)
    tuv = syn.mesh.triangle_uvs()
    hitmask = np.isfinite(np.asarray(plain.t))
    prim = np.asarray(plain.prim)[hitmask]
    u = np.asarray(plain.u)[hitmask]
    v = np.asarray(plain.v)[hitmask]
    w0 = 1.0 - u - v
    want_u = (
        w0 * tuv[prim * 3, 0] + u * tuv[prim * 3 + 1, 0] + v * tuv[prim * 3 + 2, 0]
    )
    want_v = (
        w0 * tuv[prim * 3, 1] + u * tuv[prim * 3 + 1, 1] + v * tuv[prim * 3 + 2, 1]
    )
    np.testing.assert_allclose(np.asarray(withuv.u)[hitmask], want_u, atol=1e-4)
    np.testing.assert_allclose(np.asarray(withuv.v)[hitmask], want_v, atol=1e-4)


def test_culled_exit_groups_and_emit_prim(scene):
    """Per-group early exit (shared DMA stream) and the prim-skipping
    uv path must produce the same hits as the block-wide default."""
    syn, bvh, fan, clusters = scene
    origins, normals, dirs = _fan_batch(syn, t=8, s=256, seed=13)
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 2) for a in ds)
    rows_o = tuple(tile_rows(a, 2) for a in origins)
    base = cast_fans_culled(
        clusters, rows_o, rows_d, interpret=True, emit_uv=True, fan_block=8
    )
    for er in (2, 4):
        got = cast_fans_culled(
            clusters, rows_o, rows_d, interpret=True, emit_uv=True,
            fan_block=8, exit_rows=er,
        )
        np.testing.assert_array_equal(base.t, got.t)
        np.testing.assert_array_equal(base.u, got.u)
        np.testing.assert_array_equal(base.v, got.v)
    # emit_uv defaults to emit_prim=False: prim is all -1, hits unchanged
    assert (np.asarray(base.prim) == -1).all()
    withprim = cast_fans_culled(
        clusters, rows_o, rows_d, interpret=True, emit_uv=True,
        fan_block=8, emit_prim=True,
    )
    np.testing.assert_array_equal(base.t, withprim.t)
    assert (np.asarray(withprim.prim)[np.isfinite(np.asarray(base.t))] >= 0).all()


def test_culled_per_ray_origins(scene):
    syn, bvh, fan, clusters = scene
    rng = np.random.default_rng(5)
    t, r = 8, 128
    sx, sy, sz = syn.size
    o = rng.uniform(0.3, 1.0, (3, t, r)).astype(np.float32)
    o[0] *= sx - 0.6
    o[1] *= sy - 0.6
    o[2] *= sz - 0.6
    d = rng.standard_normal((3, t, r)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    origins = tuple(jnp.asarray(o[k]) for k in range(3))
    dirs = tuple(jnp.asarray(d[k]) for k in range(3))

    from texir_code_tpu.ops.raycast import DeviceBVH, cast_rays_soa

    ref = cast_rays_soa(DeviceBVH.from_flat(bvh), origins, dirs)
    hit = cast_fans_culled(clusters, origins, dirs, per_ray=True, interpret=True)
    np.testing.assert_allclose(hit.t, ref.t, rtol=1e-4, atol=1e-4)
    assert (np.asarray(hit.prim) == np.asarray(ref.prim)).all()


def test_cull_candidates_cover_hits(scene):
    """Every cluster containing a hit must appear within the candidate
    prefix (count) of its block."""
    syn, bvh, fan, clusters = scene
    origins, normals, dirs = _fan_batch(syn, t=8, s=256, seed=7)
    g, tf = 4, 8
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, g) for a in ds)
    rows_o = tuple(tile_rows(a, g) for a in origins)
    cand, count, dist = cull_blocks(
        clusters, rows_o, rows_o, rows_d, tf
    )
    ref = cast_ray_fans(fan, origins, dirs, max_leaves=fan.num_leaves)
    # leaf index of each hit prim: invert via rows' prim table
    rows = np.asarray(fan.rows)
    prim_to_cluster = {}
    for li in range(rows.shape[0]):
        for j, p in enumerate(rows[li, 8:12].view(np.int32)):
            if p >= 0:
                prim_to_cluster[int(p)] = li // clusters.lb
    ref_prim = np.asarray(ref.prim)  # [T, S] aligned with unsorted dirs
    # map (fan, sorted position) -> wedge row: recompute sorting
    key = (
        (np.asarray(ds[0]) < 0) * 4 + (np.asarray(ds[1]) < 0) * 2 + (np.asarray(ds[2]) < 0)
    )
    cand_np = np.asarray(cand)[:, 0, :]
    count_np = np.asarray(count)[:, 0, 0]
    # for each fan, each hit prim must be within the candidate prefix of at
    # least the wedge-block that contains that (fan, ray); rather than track
    # the permutation, check the weaker-but-sufficient property per fan:
    # union of candidate prefixes over the fan's wedge blocks covers all its
    # hit clusters.
    t = 8
    for f in range(t):
        hit_clusters = {
            prim_to_cluster[int(p)] for p in ref_prim[f] if p >= 0
        }
        covered = set()
        for w in range(g):
            row = w * t + f
            b = row // tf
            covered.update(cand_np[b, : count_np[b]].tolist())
        assert hit_clusters <= covered, (
            f"fan {f}: clusters {hit_clusters - covered} not candidates"
        )


def test_densepack_matches_leaf_aligned(scene):
    """Dense 4-per-row triangle packing must produce the same hits as
    leaf-aligned clusters (same DFS triangle order, conservative AABBs)."""
    syn, bvh, fan, clusters = scene
    dense = ClusterScene.from_fan(fan, lb=8, dense=True)
    assert dense.rows3.shape[0] <= clusters.rows3.shape[0]
    origins, normals, dirs = _fan_batch(syn, t=8, s=256, seed=17)
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 2) for a in ds)
    rows_o = tuple(tile_rows(a, 2) for a in origins)
    a = cast_fans_culled(clusters, rows_o, rows_d, interpret=True,
                         emit_uv=True, fan_block=8, exit_rows=4)
    b = cast_fans_culled(dense, rows_o, rows_d, interpret=True,
                         emit_uv=True, fan_block=8, exit_rows=4)
    np.testing.assert_allclose(a.t, b.t, rtol=1e-6, atol=1e-6)
    hit = np.isfinite(np.asarray(a.t))
    np.testing.assert_allclose(np.asarray(a.u)[hit], np.asarray(b.u)[hit],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.v)[hit], np.asarray(b.v)[hit],
                               atol=1e-5)


def test_twopass_matches_single(scene):
    """Two-pass trace (truncated walk + compacted straggler re-trace) must
    reproduce the single-pass hits exactly, at any cut."""
    from texir_code_tpu.ops.pallas_culled import cast_fans_culled_twopass

    syn, bvh, fan, clusters = scene
    origins, normals, dirs = _fan_batch(syn, t=16, s=512, seed=19)
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 4) for a in ds)
    rows_o = tuple(tile_rows(a, 4) for a in origins)
    base = cast_fans_culled(
        clusters, rows_o, rows_d, interpret=True, emit_uv=True,
        fan_block=8, exit_rows=4,
    )
    for cut in (0.15, 0.3, 1.2):
        got = cast_fans_culled_twopass(
            clusters, rows_o, rows_d, interpret=True, emit_uv=True,
            fan_block=8, exit_rows=4, cut_frac=cut, cap_frac=0.5,
        )
        np.testing.assert_array_equal(base.t, got.t, err_msg=f"cut={cut}")
        np.testing.assert_array_equal(base.u, got.u, err_msg=f"cut={cut}")
        np.testing.assert_array_equal(base.v, got.v, err_msg=f"cut={cut}")


def test_twopass_overflow_fallback(scene):
    """A tiny straggler capacity + tiny cut must trip the lax.cond overflow
    fallback and still return exact hits."""
    from texir_code_tpu.ops.pallas_culled import cast_fans_culled_twopass

    syn, bvh, fan, clusters = scene
    origins, normals, dirs = _fan_batch(syn, t=16, s=512, seed=23)
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 4) for a in ds)
    rows_o = tuple(tile_rows(a, 4) for a in origins)
    base = cast_fans_culled(
        clusters, rows_o, rows_d, interpret=True, fan_block=8,
    )
    got = cast_fans_culled_twopass(
        clusters, rows_o, rows_d, interpret=True, fan_block=8,
        cut_frac=0.02, cap_frac=0.01,
    )
    np.testing.assert_array_equal(base.t, got.t)
    np.testing.assert_array_equal(base.prim, got.prim)


def test_twopass_baker_bit_identical(scene):
    """The baker's two_pass_cut config must not change baked irradiance."""
    from texir_code_tpu.models.tbl import build_tbl_from_flat
    from texir_code_tpu.models.tracer_irt import IrradianceTextureBaker

    syn, bvh, fan, clusters = scene
    tbl = build_tbl_from_flat(bvh, syn.mesh, syn.hdr_texture)
    pts = np.asarray(
        [[1.0, 1.0, 0.5], [2.0, 1.5, 1.0], [0.7, 0.8, 1.2], [1.5, 2.0, 0.4]],
        np.float32,
    )
    nrm = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    ids = jnp.arange(4, dtype=jnp.int32)

    def run(two_pass_cut):
        baker = IrradianceTextureBaker(
            tbl, spp=256, texel_batch=4, cluster_scene=clusters, wedges=2,
            pallas_interpret=True,
        )
        baker.two_pass_cut = two_pass_cut
        return np.asarray(
            baker._bake_batch_culled(
                jnp.asarray(pts), jnp.asarray(nrm), ids, jnp.int32(5)
            )
        )

    np.testing.assert_array_equal(run(None), run(0.3))


def test_twopass_per_ray(scene):
    """Per-ray-origin two-pass (the specular MC layout) must match the
    single-pass per-ray trace exactly."""
    from texir_code_tpu.ops.pallas_culled import cast_fans_culled_twopass

    syn, bvh, fan, clusters = scene
    rng = np.random.default_rng(29)
    t, r = 16, 128
    sx, sy, sz = syn.size
    o = rng.uniform(0.3, 1.0, (3, t, r)).astype(np.float32)
    o[0] *= sx - 0.6
    o[1] *= sy - 0.6
    o[2] *= sz - 0.6
    d = rng.standard_normal((3, t, r)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    origins = tuple(jnp.asarray(o[k]) for k in range(3))
    dirs = tuple(jnp.asarray(d[k]) for k in range(3))

    base = cast_fans_culled(
        clusters, origins, dirs, per_ray=True, interpret=True, fan_block=8,
    )
    for cut, cap in ((0.25, 0.5), (0.1, 0.05)):
        got = cast_fans_culled_twopass(
            clusters, origins, dirs, per_ray=True, interpret=True,
            fan_block=8, cut_frac=cut, cap_frac=cap,
        )
        np.testing.assert_array_equal(base.t, got.t, err_msg=f"cut={cut}")
        np.testing.assert_array_equal(base.prim, got.prim)


def test_proxy_from_fan_is_largest_tris(scene):
    syn, bvh, fan, clusters = scene
    proxy = ClusterScene.proxy_from_fan(fan, k=64, lb=8)
    assert proxy.has_uv == clusters.has_uv
    prims = np.asarray(proxy.prims3).reshape(-1)
    prims = prims[prims >= 0]
    assert len(prims) == 64
    # proxy prims are real scene prims (a subset)
    all_prims = np.asarray(clusters.prims3).reshape(-1)
    assert np.isin(prims, all_prims[all_prims >= 0]).all()
    # they really are the largest-area triangles
    verts = np.asarray(syn.mesh.vertices)
    faces = np.asarray(syn.mesh.faces)
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    cut = np.sort(area)[-64]
    assert (area[prims] >= cut - 1e-6).all()


def test_proxy_seed_matches_unseeded(scene):
    """Occlusion-proxy seeding must not change any hit (exactness)."""
    syn, bvh, fan, clusters = scene
    proxy = ClusterScene.proxy_from_fan(fan, k=48, lb=8)
    origins, normals, dirs = _fan_batch(syn, t=8, s=256, seed=17)
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 2) for a in ds)
    rows_o = tuple(tile_rows(a, 2) for a in origins)
    for kw in (
        dict(),
        dict(emit_uv=True),
        dict(emit_uv=True, exit_rows=2),
        dict(emit_prim=True, emit_uv=True),
    ):
        base = cast_fans_culled(
            clusters, rows_o, rows_d, interpret=True, fan_block=8, **kw
        )
        got = cast_fans_culled(
            clusters, rows_o, rows_d, interpret=True, fan_block=8,
            proxy=proxy, **kw
        )
        np.testing.assert_array_equal(base.t, got.t, err_msg=f"{kw}")
        np.testing.assert_array_equal(base.prim, got.prim, err_msg=f"{kw}")
        np.testing.assert_array_equal(base.u, got.u, err_msg=f"{kw}")
        np.testing.assert_array_equal(base.v, got.v, err_msg=f"{kw}")


def test_proxy_seed_per_ray(scene):
    syn, bvh, fan, clusters = scene
    proxy = ClusterScene.proxy_from_fan(fan, k=48, lb=8)
    rng = np.random.default_rng(23)
    t, r = 8, 128
    sx, sy, sz = syn.size
    o = rng.uniform(0.3, 1.0, (3, t, r)).astype(np.float32)
    o[0] *= sx - 0.6
    o[1] *= sy - 0.6
    o[2] *= sz - 0.6
    d = rng.standard_normal((3, t, r)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    origins = tuple(jnp.asarray(o[k]) for k in range(3))
    dirs = tuple(jnp.asarray(d[k]) for k in range(3))
    base = cast_fans_culled(
        clusters, origins, dirs, per_ray=True, interpret=True, exit_rows=1,
    )
    got = cast_fans_culled(
        clusters, origins, dirs, per_ray=True, interpret=True, exit_rows=1,
        proxy=proxy,
    )
    np.testing.assert_array_equal(base.t, got.t)
    np.testing.assert_array_equal(base.prim, got.prim)


def test_twopass_proxy_matches(scene):
    from texir_code_tpu.ops.pallas_culled import cast_fans_culled_twopass

    syn, bvh, fan, clusters = scene
    proxy = ClusterScene.proxy_from_fan(fan, k=48, lb=8)
    origins, normals, dirs = _fan_batch(syn, t=8, s=256, seed=29)
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 2) for a in ds)
    rows_o = tuple(tile_rows(a, 2) for a in origins)
    base = cast_fans_culled(
        clusters, rows_o, rows_d, interpret=True, fan_block=8, emit_uv=True,
    )
    got = cast_fans_culled_twopass(
        clusters, rows_o, rows_d, interpret=True, fan_block=8, emit_uv=True,
        cut_frac=0.4, proxy=proxy,
    )
    np.testing.assert_array_equal(base.t, got.t)
    np.testing.assert_array_equal(base.u, got.u)
    np.testing.assert_array_equal(base.v, got.v)


def test_threepass_matches_single(scene):
    """3-pass ladder (cut_frac2): the straggler re-trace itself runs as a
    two-pass; results must stay bit-equal to the single pass."""
    from texir_code_tpu.ops.pallas_culled import cast_fans_culled_twopass

    syn, bvh, fan, clusters = scene
    origins, normals, dirs = _fan_batch(syn, t=8, s=256, seed=31)
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 2) for a in ds)
    rows_o = tuple(tile_rows(a, 2) for a in origins)
    base = cast_fans_culled(
        clusters, rows_o, rows_d, interpret=True, fan_block=8, emit_uv=True,
    )
    got = cast_fans_culled_twopass(
        clusters, rows_o, rows_d, interpret=True, fan_block=8, emit_uv=True,
        cut_frac=0.3, cap_frac=0.5, cut_frac2=0.6, cap_frac2=0.5,
    )
    np.testing.assert_array_equal(base.t, got.t)
    np.testing.assert_array_equal(base.u, got.u)
    np.testing.assert_array_equal(base.v, got.v)


def test_streamed_candidate_windows_bit_equal(scene):
    """HBM-streamed candidate windows (stream_cands=W) must be bit-equal to
    the SMEM-table kernel for every window size — including tiny windows
    that force many window crossings and the early-exit window drain, and
    windows larger than any candidate list (no crossing at all)."""
    syn, bvh, fan, clusters = scene
    origins, normals, dirs = _fan_batch(syn, t=8, s=256, seed=29)
    ds = sort_dirs_octant(dirs)
    rows_d = tuple(wedge_rows(a, 2) for a in ds)
    rows_o = tuple(tile_rows(a, 2) for a in origins)
    base = cast_fans_culled(
        clusters, rows_o, rows_d, interpret=True, emit_uv=True,
        fan_block=8, exit_rows=4, stream_cands=0,
    )
    for w in (2, 4, 64, 4096):
        got = cast_fans_culled(
            clusters, rows_o, rows_d, interpret=True, emit_uv=True,
            fan_block=8, exit_rows=4, stream_cands=w,
        )
        np.testing.assert_array_equal(base.t, got.t)
        np.testing.assert_array_equal(base.u, got.u)
        np.testing.assert_array_equal(base.v, got.v)
    # seeded/two-pass path through the stream as well
    tp0 = cast_fans_culled_twopass(
        clusters, rows_o, rows_d, interpret=True, emit_uv=True,
        fan_block=8, exit_rows=4, cut_frac=0.3, stream_cands=0,
    )
    tp1 = cast_fans_culled_twopass(
        clusters, rows_o, rows_d, interpret=True, emit_uv=True,
        fan_block=8, exit_rows=4, cut_frac=0.3, stream_cands=4,
    )
    np.testing.assert_array_equal(tp0.t, tp1.t)
