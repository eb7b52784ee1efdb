"""Proven rectangular occluders (geometry/occluders.py): extraction proofs,
blocking-test conservatism, and bit-equality of occluder-culled traces.

The occluder system is the host-precomputed PVS of VERDICT r3 #2: the
extraction must only emit rectangles provably covered by mesh triangles,
and the cull integration must leave hits bit-equal to the unculled trace.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from texir_code_tpu.data.synthetic import (  # noqa: E402
    make_apartment_scene,
    make_building_scene,
    make_room_mesh,
)
from texir_code_tpu.geometry.mesh import Mesh  # noqa: E402
from texir_code_tpu.geometry.occluders import (  # noqa: E402
    OccluderSet,
    extract_occluders,
    occluder_plane_bounds,
)


def _quad_mesh(quads, subdiv=1):
    """Mesh from a list of 4-corner quads (lattice-tessellated)."""
    from texir_code_tpu.data.synthetic import _cell_uv, _lattice_quad

    vertices, faces, uvs, uv_faces = [], [], [], []
    for q in quads:
        _lattice_quad(vertices, faces, uvs, uv_faces,
                      np.asarray(q, np.float32), _cell_uv(0), subdiv)
    return Mesh(
        vertices=np.asarray(vertices, np.float32),
        faces=np.asarray(faces, np.int32),
        uvs=np.asarray(uvs, np.float32),
        uv_faces=np.asarray(uv_faces, np.int32),
    )


# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------


def test_extract_full_room_walls():
    mesh = make_room_mesh(size=(4.0, 3.0, 5.0), subdiv=3)
    occ = extract_occluders(mesh)
    assert occ is not None
    # all six walls are fully covered rectangles; each axis contributes 2
    ax = np.asarray(occ.axis)
    assert all((ax == k).sum() >= 2 for k in range(3))
    # the floor occluder covers (nearly) the full footprint
    floor = [
        i for i in range(occ.num_occluders)
        if ax[i] == 1 and abs(float(occ.p[i])) < 1e-5
    ]
    assert floor
    i = floor[0]
    lo = np.asarray(occ.rect_lo[i])
    hi = np.asarray(occ.rect_hi[i])
    # axis 1 → rect axes (2, 0) = (z, x)
    assert lo[0] < 0.05 and lo[1] < 0.05
    assert hi[0] > 4.95 and hi[1] > 3.95


def test_extract_wall_with_door_excludes_doorway():
    scene = make_apartment_scene(atlas_res=32, subdiv=4, clutter=0)
    sx, sy, sz = scene.size
    occ = extract_occluders(scene.mesh)
    assert occ is not None
    ax = np.asarray(occ.axis)
    p = np.asarray(occ.p)
    divider = np.nonzero((ax == 0) & (np.abs(p - 0.55 * sx) < 1e-4))[0]
    assert len(divider) >= 1, "divider wall panel not found"
    # no divider occluder may contain a point inside the doorway
    # (z in [0.72·sz, 0.95·sz], y below the 0.75·sy header)
    door_pt = np.array([0.3 * sy, 0.85 * sz])  # (a, b) = (y, z) for axis 0
    for i in divider:
        lo = np.asarray(occ.rect_lo[i])
        hi = np.asarray(occ.rect_hi[i])
        inside = (lo <= door_pt).all() and (door_pt <= hi).all()
        assert not inside, f"occluder {i} covers the doorway"
    # but the big panel left of the door must be found (z < 0.72·sz)
    big = [
        i for i in divider
        if np.asarray(occ.rect_hi[i])[1] <= 0.72 * sz + 1e-3
        and np.asarray(occ.rect_hi[i])[0] > 0.9 * sy
    ]
    assert big, "full-height panel left of the door missing"


def test_extract_rejects_uncovered_overlap():
    """Two overlapping opposite-diagonal half-cell triangles sum to the cell
    area but do NOT cover it — no occluder may be emitted."""
    # quad [0,2]² at x=0, but built from two triangles of OPPOSITE diagonals
    # that overlap: {(0,0),(2,0),(2,2)} and {(2,0),(0,0),(0,2)} leave the
    # region near (1, 1.9) uncovered... actually construct precisely:
    # lower half of diagonal A and lower half of diagonal B (overlap, and
    # the top wedge stays uncovered).
    v = np.asarray(
        [
            [0, 0, 0], [0, 2, 0], [0, 2, 2],   # diag A half {00,10,11}
            [0, 0, 0], [0, 2, 0], [0, 0, 2],   # diag B half {00,10,01}
        ],
        np.float32,
    )
    f = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    uv = np.zeros((6, 2), np.float32)
    mesh = Mesh(vertices=v, faces=f, uvs=uv, uv_faces=f.copy())
    occ = extract_occluders(
        mesh, min_side_frac=0.01, min_area_frac=1e-4
    )
    assert occ is None


def test_extract_irregular_tiling_slow_path():
    """A rectangle tiled by a NON-lattice triangulation (center fan) is
    proven through the clipping slow path."""
    c = np.asarray([1.0, 1.5], np.float64)
    corners = [(0, 0), (2, 0), (2, 3), (0, 3)]
    v, f = [], []
    for i in range(4):
        a = corners[i]
        b = corners[(i + 1) % 4]
        base = len(v)
        v += [[0, a[0], a[1]], [0, b[0], b[1]], [0, c[0], c[1]]]
        f.append([base, base + 1, base + 2])
    v = np.asarray(v, np.float32)
    f = np.asarray(f, np.int32)
    mesh = Mesh(vertices=v, faces=f, uvs=np.zeros((len(v), 2), np.float32),
                uv_faces=f.copy())
    occ = extract_occluders(mesh, min_side_frac=0.05, min_area_frac=0.01)
    assert occ is not None and occ.num_occluders >= 1
    assert int(np.asarray(occ.axis)[0]) == 0
    lo = np.asarray(occ.rect_lo[0])
    hi = np.asarray(occ.rect_hi[0])
    assert lo[0] < 0.01 and hi[0] > 1.99 and lo[1] < 0.01 and hi[1] > 2.99


# ---------------------------------------------------------------------------
# blocking test (device-side bounds)
# ---------------------------------------------------------------------------


def _single_occ(axis, p, lo2, hi2, sep=0.01):
    return OccluderSet(
        axis=(axis,),
        p=jnp.asarray([p], jnp.float32),
        rect_lo=jnp.asarray([lo2], jnp.float32),
        rect_hi=jnp.asarray([hi2], jnp.float32),
        sep_margin=jnp.float32(sep),
    )


def test_plane_bounds_narrow_cone_blocked():
    occ = _single_occ(0, 1.0, [0.0, 0.0], [2.0, 2.0])
    bo_lo = (jnp.asarray([0.4]), jnp.asarray([0.9]), jnp.asarray([0.9]))
    bo_hi = (jnp.asarray([0.5]), jnp.asarray([1.0]), jnp.asarray([1.0]))
    d_lo = (jnp.asarray([0.9]), jnp.asarray([-0.1]), jnp.asarray([-0.1]))
    d_hi = (jnp.asarray([1.0]), jnp.asarray([0.1]), jnp.asarray([0.1]))
    p_lo, p_hi = occluder_plane_bounds(occ, bo_lo, bo_hi, d_lo, d_hi)
    assert float(p_hi[0, 0]) == pytest.approx(1.0)
    assert np.isinf(float(p_lo[0, 0]))


def test_plane_bounds_wide_cone_not_blocked():
    """Crossing points escape the rectangle → no block."""
    occ = _single_occ(0, 1.0, [0.0, 0.0], [2.0, 2.0])
    bo_lo = (jnp.asarray([0.4]), jnp.asarray([0.9]), jnp.asarray([0.9]))
    bo_hi = (jnp.asarray([0.5]), jnp.asarray([1.0]), jnp.asarray([1.0]))
    d_lo = (jnp.asarray([0.2]), jnp.asarray([-0.9]), jnp.asarray([-0.9]))
    d_hi = (jnp.asarray([1.0]), jnp.asarray([0.9]), jnp.asarray([0.9]))
    p_lo, p_hi = occluder_plane_bounds(occ, bo_lo, bo_hi, d_lo, d_hi)
    assert np.isinf(float(p_hi[0, 0]))


def test_plane_bounds_within_sep_margin_not_blocked():
    occ = _single_occ(0, 1.0, [-10, -10], [10, 10], sep=0.05)
    bo_lo = (jnp.asarray([0.97]), jnp.asarray([0.0]), jnp.asarray([0.0]))
    bo_hi = (jnp.asarray([0.98]), jnp.asarray([0.1]), jnp.asarray([0.1]))
    d_lo = (jnp.asarray([0.9]), jnp.asarray([-0.1]), jnp.asarray([-0.1]))
    d_hi = (jnp.asarray([1.0]), jnp.asarray([0.1]), jnp.asarray([0.1]))
    _, p_hi = occluder_plane_bounds(occ, bo_lo, bo_hi, d_lo, d_hi)
    assert np.isinf(float(p_hi[0, 0]))


def test_plane_bounds_mixed_sign_cone_not_blocked():
    """Cone not strictly toward the plane → cannot block."""
    occ = _single_occ(0, 1.0, [-10, -10], [10, 10])
    bo_lo = (jnp.asarray([0.4]), jnp.asarray([0.0]), jnp.asarray([0.0]))
    bo_hi = (jnp.asarray([0.5]), jnp.asarray([0.1]), jnp.asarray([0.1]))
    d_lo = (jnp.asarray([-0.5]), jnp.asarray([-1.0]), jnp.asarray([-1.0]))
    d_hi = (jnp.asarray([1.0]), jnp.asarray([1.0]), jnp.asarray([1.0]))
    _, p_hi = occluder_plane_bounds(occ, bo_lo, bo_hi, d_lo, d_hi)
    assert np.isinf(float(p_hi[0, 0]))


# ---------------------------------------------------------------------------
# bit-equality of occluder-culled traces
# ---------------------------------------------------------------------------


def _trace_setup(scene, lb=4):
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.ops.fan_raycast import FanScene
    from texir_code_tpu.ops.pallas_culled import ClusterScene

    flat = build_bvh(scene.mesh.vertices, scene.mesh.faces)
    fan = FanScene.from_flat(flat, triangle_uvs=scene.mesh.triangle_uvs())
    cs = ClusterScene.from_fan(fan, lb=lb, dense=True)
    return cs


def _fan_rays(scene, n_fans=16, r=256, seed=0, sep_rooms=True):
    """Shared-origin wedge-style rows: origins inside rooms, unit dirs."""
    rng = np.random.default_rng(seed)
    sx, sy, sz = scene.size
    o = np.stack([
        rng.uniform(0.3, sx - 0.3, n_fans),
        rng.uniform(0.3, sy - 0.3, n_fans),
        rng.uniform(0.3, sz - 0.3, n_fans),
    ], axis=-1).astype(np.float32)
    d = rng.normal(size=(n_fans, r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # octant-sort each row so groups have sign-pure cones (the production
    # wedge layout); mixed-sign rows are covered by the dedicated test above
    key = (d[..., 0] < 0) * 4 + (d[..., 1] < 0) * 2 + (d[..., 2] < 0)
    order = np.argsort(key, axis=1, kind="stable")
    d = np.take_along_axis(d, order[..., None], axis=1)
    origins = tuple(jnp.asarray(o[:, k]) for k in range(3))
    dirs = tuple(jnp.asarray(d[..., k]) for k in range(3))
    return origins, dirs


@pytest.mark.parametrize("two_pass", [False, True])
def test_occluder_trace_bit_equal_building(two_pass):
    from texir_code_tpu.ops.pallas_culled import (
        cast_fans_culled,
        cast_fans_culled_twopass,
    )

    scene = make_building_scene(
        atlas_res=32, rooms=(2, 2), subdiv=3, clutter_per_room=1
    )
    cs = _trace_setup(scene)
    occ = extract_occluders(scene.mesh)
    assert occ is not None and occ.num_occluders >= 4
    origins, dirs = _fan_rays(scene, n_fans=16, r=256)

    kw = dict(t_min=1e-4, fan_block=8, interpret=True, emit_uv=True)
    if two_pass:
        ref = cast_fans_culled_twopass(cs, origins, dirs, cut_frac=0.3, **kw)
        got = cast_fans_culled_twopass(
            cs, origins, dirs, cut_frac=0.3, occluders=occ, **kw
        )
    else:
        ref = cast_fans_culled(cs, origins, dirs, **kw)
        got = cast_fans_culled(cs, origins, dirs, occluders=occ, **kw)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(got.prim))
    np.testing.assert_array_equal(np.asarray(ref.u), np.asarray(got.u))
    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(got.v))


def test_occluder_trace_bit_equal_apartment_per_ray():
    """Per-ray origins (the Mat specular layout) + exit groups."""
    from texir_code_tpu.ops.pallas_culled import cast_fans_culled

    scene = make_apartment_scene(atlas_res=32, subdiv=3, clutter=1)
    cs = _trace_setup(scene)
    occ = extract_occluders(scene.mesh)
    assert occ is not None
    rng = np.random.default_rng(3)
    sx, sy, sz = scene.size
    t_rows, r = 16, 256
    o = np.stack([
        rng.uniform(0.3, sx - 0.3, (t_rows, r)),
        rng.uniform(0.3, sy - 0.3, (t_rows, r)),
        rng.uniform(0.3, sz - 0.3, (t_rows, r)),
    ]).astype(np.float32)
    d = rng.normal(size=(3, t_rows, r)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    origins = tuple(jnp.asarray(o[k]) for k in range(3))
    dirs = tuple(jnp.asarray(d[k]) for k in range(3))
    kw = dict(
        t_min=1e-4, fan_block=8, interpret=True, emit_uv=True,
        per_ray=True, exit_rows=1,
    )
    ref = cast_fans_culled(cs, origins, dirs, **kw)
    got = cast_fans_culled(cs, origins, dirs, occluders=occ, **kw)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(got.prim))


def test_occluder_actually_culls():
    """Sanity that the machinery fires: a narrow wedge aimed at a wall in a
    2-room scene must see its candidate count drop."""
    from texir_code_tpu.ops.pallas_culled import cull_blocks

    scene = make_apartment_scene(atlas_res=32, subdiv=3, clutter=0)
    cs = _trace_setup(scene)
    occ = extract_occluders(scene.mesh)
    sx, sy, sz = scene.size
    # origin in room 1 (x < 0.55 sx), narrow +x cone toward the divider at
    # z below the doorway (door z in [0.72, 0.95]·sz)
    t_rows, r = 8, 128
    o = (
        jnp.full((t_rows,), 0.2 * sx),
        jnp.full((t_rows,), 0.5 * sy),
        jnp.full((t_rows,), 0.3 * sz),
    )
    rng = np.random.default_rng(0)
    d = np.stack([
        np.ones((t_rows, r)),
        rng.uniform(-0.05, 0.05, (t_rows, r)),
        rng.uniform(-0.05, 0.05, (t_rows, r)),
    ]).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    dirs = tuple(jnp.asarray(d[k]) for k in range(3))
    _, count0, _ = cull_blocks(cs, o, o, dirs, 8)
    _, count1, _ = cull_blocks(cs, o, o, dirs, 8, occluders=occ)
    assert int(count1.sum()) < int(count0.sum())


def test_extract_unstructured_mesh_yields_none():
    """A mesh with no axis-aligned planar structure (random perturbed
    vertices, as on a real scan) must conservatively yield NO occluders —
    the trace then runs exactly as before (module docstring contract)."""
    rng = np.random.default_rng(3)
    base = make_room_mesh(subdiv=3)
    vertices = base.vertices + rng.normal(0, 0.01, base.vertices.shape).astype(
        np.float32
    )
    mesh = Mesh(vertices=vertices, faces=base.faces, uvs=base.uvs,
                uv_faces=base.uv_faces)
    assert extract_occluders(mesh) is None
