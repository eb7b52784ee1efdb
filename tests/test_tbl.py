"""TBL engine tests: fused raycast+uv+atlas lookup against analytic scenes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.models.tbl import build_tbl, query_tbl, query_tbl_multi, vhl_texture
from texir_code_tpu.ops import sampling, shading

from tests.test_gbuffer import make_box_mesh


@pytest.fixture(scope="module")
def furnace_box():
    """Closed unit box whose atlas is constant radiance L0=2."""
    mesh = make_box_mesh()
    tex = np.full((16, 16, 3), 2.0, np.float32)
    return build_tbl(mesh, tex)


def test_query_hits_return_texture_value(furnace_box):
    pts = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    out = np.asarray(query_tbl(furnace_box, pts, dirs))
    np.testing.assert_allclose(out, 2.0, atol=1e-5)


def test_query_miss_returns_zero():
    """Open scene (single quad): rays away from it return 0."""
    from tests.test_geometry import make_quad_mesh

    mesh = make_quad_mesh()
    tex = np.full((8, 8, 3), 5.0, np.float32)
    tbl = build_tbl(mesh, tex)
    pts = jnp.asarray([[0.5, 0.5, 1.0]], jnp.float32)
    out = np.asarray(query_tbl(tbl, pts, jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)))
    np.testing.assert_allclose(out, 0.0)


def test_self_hit_epsilon_masked(furnace_box):
    """A ray starting exactly on a wall pointing inward along the wall normal
    but hitting at t<=1e-4 must contribute zero."""
    pts = jnp.asarray([[0.5, 0.5, 1e-5]], jnp.float32)
    # pointing INTO the wall: immediate hit at t~1e-5 → masked to zero
    out = np.asarray(query_tbl(furnace_box, pts, jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)))
    np.testing.assert_allclose(out, 0.0)


def test_uv_interpolation_gradient_texture():
    """Atlas with a horizontal gradient: radiance equals u of the hit point."""
    mesh = make_box_mesh()
    ramp = np.linspace(0, 1, 32, dtype=np.float32)
    # vary along BOTH axes so any in-plane hit offset changes the value
    tex = (ramp[None, :, None] * 0.5 + ramp[:, None, None] * 0.5) * np.ones(
        (32, 32, 3), np.float32
    )
    tbl = build_tbl(mesh, tex)
    # hit the z=0 wall at various x; the box walls are uv-mapped per-quad
    pts = jnp.asarray([[0.25, 0.5, 0.5], [0.75, 0.5, 0.5]], jnp.float32)
    dirs = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]], jnp.float32)
    out = np.asarray(query_tbl(tbl, pts, dirs))
    # values must differ according to hit u and lie inside the ramp range
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert abs(out[0, 0] - out[1, 0]) > 0.1


def test_furnace_irradiance(furnace_box):
    """Uniform radiance L0 inside a closed box → irradiance π·L0 at any
    interior point/orientation.  Exercises the full NIrF/IrT ground-truth
    chain: generate_dir + query_tbl + irradiance estimator."""
    key = jax.random.PRNGKey(7)
    pts = jnp.asarray(
        [[0.5, 0.5, 0.5], [0.2, 0.7, 0.4], [0.8, 0.3, 0.6]], jnp.float32
    )
    normals = jnp.asarray(
        [[0, 0, 1.0], [0.577, 0.577, 0.577], [1.0, 0, 0]], jnp.float32
    )
    s = 512
    dirs = sampling.generate_dir(normals, s, key, mode="uniform")
    lighting = query_tbl_multi(furnace_box, pts, dirs)
    irr = np.asarray(shading.irradiance_estimator(lighting, dirs, normals))
    np.testing.assert_allclose(irr, np.pi * 2.0, rtol=5e-2)


def test_vhl_texture_keeps_only_bright_texels():
    tex = np.zeros((4, 4, 3), np.float32)
    tex[0, 0] = [100.0, 100.0, 100.0]   # a light source
    tex[1, 1] = [0.2, 0.2, 0.2]         # dim surface
    exposure = 3.0
    tex_exposed = tex * 2**exposure     # as stored in the TBL
    out = np.asarray(vhl_texture(jnp.asarray(tex_exposed), exposure))
    np.testing.assert_allclose(out[0, 0], tex_exposed[0, 0])
    np.testing.assert_allclose(out[1, 1], 0.0)


def test_occlusion():
    """A wall between point and light zeroes the contribution."""
    mesh = make_box_mesh()
    # bright only on the z=1 wall region via a v-gradient? simpler: put an
    # interior occluder quad and check radiance switches to occluder texel
    verts = np.concatenate(
        [
            mesh.vertices,
            np.array(
                [[0.4, 0.4, 0.5], [0.6, 0.4, 0.5], [0.6, 0.6, 0.5], [0.4, 0.6, 0.5]],
                np.float32,
            ),
        ]
    )
    n = len(mesh.vertices)
    faces = np.concatenate(
        [mesh.faces, np.array([[n, n + 1, n + 2], [n, n + 2, n + 3]], np.int32)]
    )
    uvf = np.concatenate(
        [mesh.uv_faces, np.array([[0, 1, 2], [0, 2, 3]], np.int32)]
    )
    from texir_code_tpu.geometry import Mesh

    m2 = Mesh(vertices=verts, faces=faces, uvs=mesh.uvs, uv_faces=uvf)
    # atlas: uniform 1.0
    tbl = build_tbl(m2, np.full((8, 8, 3), 1.0, np.float32))
    # ray from below toward +z through the occluder: hit at t=0.3 not wall t=0.8
    pts = jnp.asarray([[0.5, 0.5, 0.2]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    from texir_code_tpu.ops.raycast import cast_rays

    hit = cast_rays(tbl.bvh, pts, dirs)
    np.testing.assert_allclose(np.asarray(hit.t), [0.3], atol=1e-5)


def test_rgbe_prefilter_snaps_bilinear(rng):
    """nearest_rgbe on a rgbe_prefilter-ed atlas == bilinear_rgbe of the
    base planes at the SNAPPED (nearest supersample-center) coordinates, up
    to RGBE re-quantization — the deterministic contract behind the
    1-gather radiance fetch."""
    from texir_code_tpu.models.tbl import (
        bilinear_rgbe,
        nearest_rgbe,
        rgbe_pack,
        rgbe_prefilter,
    )

    h = w = 16
    tex = (rng.random((h, w, 3)).astype(np.float32) * 4.0) ** 2.0
    planes = tuple(jnp.asarray(tex[..., k]) for k in range(3))
    f = 2
    pre = rgbe_prefilter(planes, f)

    u = jnp.asarray(rng.random(512).astype(np.float32))
    v = jnp.asarray(rng.random(512).astype(np.float32))
    got = nearest_rgbe(pre, u, v)

    # snap uv to the supersample centers nearest_rgbe selects
    fu = (jnp.clip((u * f * w).astype(jnp.int32), 0, f * w - 1) + 0.5) / (f * w)
    fv = (jnp.clip((v * f * h).astype(jnp.int32), 0, f * h - 1) + 0.5) / (f * h)
    want = bilinear_rgbe(rgbe_pack(jnp.asarray(tex)), fu, fv)

    # two RGBE quantizations (base pack before interp vs prefilter re-pack
    # after interp): each step is maxc/255 with the SHARED exponent, so the
    # bound scales with the local max channel, not the channel itself
    maxc = np.maximum.reduce([np.asarray(x) for x in want])
    for g, wnt in zip(got, want):
        diff = np.abs(np.asarray(g) - np.asarray(wnt))
        assert np.all(diff <= 0.02 + 3.0 / 255.0 * np.maximum(maxc, 1e-6))
