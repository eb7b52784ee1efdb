"""Pallas fan kernel (interpret mode on CPU) vs the XLA exhaustive stream."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.geometry.bvh import build_bvh
from texir_code_tpu.models.tracer_irt import bake_geometry_textures
from texir_code_tpu.ops.fan_raycast import FanScene, cast_ray_fans
from texir_code_tpu.ops.pallas_fan import cast_ray_fans_pallas
from texir_code_tpu.ops.sampling import generate_dir_soa


def test_pallas_fan_matches_xla_stream():
    scene = make_scene(atlas_res=32, subdiv=2)
    fs = FanScene.from_flat(build_bvh(scene.mesh.vertices, scene.mesh.faces))
    geom = bake_geometry_textures(scene.mesh, 16)
    vr, vc = np.nonzero(geom.valid)
    t_fans, r = 16, 128
    P = geom.position[vr, vc][:t_fans]
    N = geom.normal[vr, vc][:t_fans]
    nrm = tuple(jnp.asarray(N[:, k]) for k in range(3))
    dirs = generate_dir_soa(nrm, r, jax.random.PRNGKey(0), mode="uniform")
    origins = tuple(jnp.asarray(P[:, k] + 1e-2 * N[:, k]) for k in range(3))

    want = cast_ray_fans(fs, origins, dirs, t_min=1e-4, max_leaves=fs.num_leaves)
    got = cast_ray_fans_pallas(fs, origins, dirs, t_min=1e-4, interpret=True)
    wt, gt = np.asarray(want.t), np.asarray(got.t)
    finite = np.isfinite(wt)
    assert (np.isfinite(gt) == finite).all()
    np.testing.assert_allclose(gt[finite], wt[finite], rtol=1e-4, atol=1e-4)
    assert (np.asarray(got.prim) == np.asarray(want.prim)).all()
    np.testing.assert_allclose(
        np.asarray(got.u)[finite], np.asarray(want.u)[finite], atol=2e-4
    )


def test_pallas_fan_padding_paths():
    """Non-multiple fan counts and leaf counts pad correctly."""
    scene = make_scene(atlas_res=32, subdiv=2)
    fs = FanScene.from_flat(build_bvh(scene.mesh.vertices, scene.mesh.faces))
    geom = bake_geometry_textures(scene.mesh, 16)
    vr, vc = np.nonzero(geom.valid)
    t_fans, r = 11, 128  # 11 not a multiple of fan_block 8
    P = geom.position[vr, vc][:t_fans]
    N = geom.normal[vr, vc][:t_fans]
    nrm = tuple(jnp.asarray(N[:, k]) for k in range(3))
    dirs = generate_dir_soa(nrm, r, jax.random.PRNGKey(1), mode="uniform")
    origins = tuple(jnp.asarray(P[:, k] + 1e-2 * N[:, k]) for k in range(3))
    got = cast_ray_fans_pallas(fs, origins, dirs, t_min=1e-4, interpret=True,
                               leaf_block=16)
    assert got.t.shape == (11, 128)
    assert np.isfinite(np.asarray(got.t)).all()  # closed room


def test_rgbe_roundtrip(rng):
    from texir_code_tpu.models.tbl import rgbe_decode, rgbe_pack

    tex = jnp.asarray((rng.random((16, 16, 3)) * 30).astype(np.float32))
    packed = rgbe_pack(tex)
    r, g, b = rgbe_decode(packed)
    back = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    pixmax = np.asarray(tex).max(-1, keepdims=True)
    assert (np.abs(back - np.asarray(tex)) <= 0.01 * pixmax + 1e-4).all()
    # zeros stay zero
    z = rgbe_pack(jnp.zeros((2, 2, 3)))
    rr, _, _ = rgbe_decode(z)
    assert (np.asarray(rr) == 0).all()


def test_uv_kernel_bake_matches_traversal_bake():
    """The uv-emitting kernel + RGBE radiance path agrees with the
    traversal-based bake to RGBE precision."""
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.models.tbl import build_tbl
    from texir_code_tpu.models.tracer_irt import (
        IrradianceTextureBaker,
        bake_geometry_textures,
    )

    scene = make_scene(atlas_res=32, subdiv=2)
    tbl = build_tbl(scene.mesh, scene.hdr_texture)
    fb = build_bvh(scene.mesh.vertices, scene.mesh.faces)
    fan = FanScene.from_flat(fb, triangle_uvs=scene.mesh.triangle_uvs())
    geom = bake_geometry_textures(scene.mesh, 16)
    key = jax.random.PRNGKey(5)
    ref = IrradianceTextureBaker(tbl, spp=64, texel_batch=64).bake(geom, key)

    # drive the uv-kernel path explicitly (bake_batch picks traversal on CPU,
    # so call the pieces directly in interpret mode)
    from texir_code_tpu.ops.pallas_fan import cast_ray_fans_pallas

    baker = IrradianceTextureBaker(
        tbl, spp=64, texel_batch=64, fan_scene=fan, max_leaves=fan.num_leaves
    )
    baker.rgbe_supersample = 0  # exact-bilinear fetch (RGBE-precision check)
    # (the prefiltered fetch's snapping property is tested deterministically
    # in test_tbl.py::test_rgbe_prefilter_snaps_bilinear)
    vr, vc = np.nonzero(geom.valid)
    # bake() assigns per-texel RNG ids by Morton rank — replicate the order
    from texir_code_tpu.models.tracer_irt import morton_order

    order = morton_order(geom.position[vr, vc])
    vr, vc = vr[order], vc[order]
    pts = jnp.asarray(geom.position[vr, vc])
    nrm_a = jnp.asarray(geom.normal[vr, vc])
    out = np.zeros((len(vr), 3), np.float32)
    import jax as _jax

    seed = _jax.random.randint(key, (), 0, 2**31 - 1)
    for s in range(0, len(vr), 64):
        sl = slice(s, min(s + 64, len(vr)))
        ids = jnp.arange(sl.start, sl.stop, dtype=jnp.int32)
        nrm = tuple(nrm_a[sl, k] for k in range(3))
        dirs = baker._fan_dirs(nrm, ids, seed)
        origins = tuple(pts[sl, k] + 1e-2 * nrm_a[sl, k] for k in range(3))
        hit = cast_ray_fans_pallas(
            fan, origins, dirs, t_min=0.0, emit_uv=True, interpret=True,
            leaf_block=16,
        )
        out[sl] = np.asarray(
            baker._fan_estimate_uv(hit.t, hit.u, hit.v, dirs, nrm)
        )
    want = ref[vr, vc]
    np.testing.assert_allclose(out, want, rtol=0.02, atol=0.02)
