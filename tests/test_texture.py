"""Texture sampler tests: parity with torch.grid_sample (the reference's
sampler) and gradient correctness of the differentiable paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.ops import texture


def test_bilinear_texel_centers(rng):
    tex = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    # uv at texel centers returns exact texel values
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    uv = jnp.asarray(
        np.stack([(xs + 0.5) / 8, (ys + 0.5) / 8], axis=-1).astype(np.float32)
    )
    out = np.asarray(texture.bilinear_sample(tex, uv))
    np.testing.assert_allclose(out, np.asarray(tex), atol=1e-6)


def test_bilinear_interpolates_halfway(rng):
    tex = jnp.zeros((4, 4, 1)).at[0, 0, 0].set(1.0)
    # halfway between texel (0,0) and (0,1) centers
    uv = jnp.asarray([[[1.0 / 4, 0.5 / 4]]], jnp.float32)
    out = np.asarray(texture.bilinear_sample(tex, uv, boundary="clamp"))
    np.testing.assert_allclose(out[0, 0, 0], 0.5, atol=1e-6)


def test_bilinear_wrap_vs_clamp():
    tex = jnp.asarray(
        np.stack([np.full((4, 4), 1.0), np.full((4, 4), 0.0)], -1)[..., :1]
    ).astype(jnp.float32)
    tex = tex.at[:, 0, 0].set(2.0)   # left column = 2, rest 1
    uv = jnp.asarray([[-0.01, 0.5]], jnp.float32)  # just left of u=0
    wrap = np.asarray(texture.bilinear_sample(tex, uv, boundary="wrap"))
    clamp = np.asarray(texture.bilinear_sample(tex, uv, boundary="clamp"))
    # wrap blends with the right edge (value 1), clamp stays at the 2 column
    assert clamp[0, 0] == pytest.approx(2.0, abs=1e-5)
    assert wrap[0, 0] < 2.0


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_grid_sample_matches_torch(rng, mode, padding):
    """Parity with torch.nn.functional.grid_sample — the exact op the
    reference uses for TBL lookups and warps."""
    import torch
    import torch.nn.functional as F

    tex = rng.random((7, 9, 3)).astype(np.float32)
    grid = (rng.random((5, 6, 2)).astype(np.float32) * 2.4 - 1.2)  # incl. OOB

    got = np.asarray(
        texture.grid_sample(
            jnp.asarray(tex), jnp.asarray(grid), mode=mode,
            padding_mode=padding, align_corners=False,
        )
    )
    t_tex = torch.from_numpy(tex).permute(2, 0, 1).unsqueeze(0)
    t_grid = torch.from_numpy(grid).unsqueeze(0)
    want = (
        F.grid_sample(t_tex, t_grid, mode=mode, padding_mode=padding,
                      align_corners=False)
        .squeeze(0).permute(1, 2, 0).numpy()
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_grid_sample_align_corners_true(rng):
    import torch
    import torch.nn.functional as F

    tex = rng.random((5, 5, 2)).astype(np.float32)
    grid = (rng.random((4, 4, 2)).astype(np.float32) * 2 - 1)
    got = np.asarray(
        texture.grid_sample(jnp.asarray(tex), jnp.asarray(grid),
                            align_corners=True)
    )
    want = (
        F.grid_sample(torch.from_numpy(tex).permute(2, 0, 1).unsqueeze(0),
                      torch.from_numpy(grid).unsqueeze(0),
                      mode="bilinear", padding_mode="border", align_corners=True)
        .squeeze(0).permute(1, 2, 0).numpy()
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_mip_pyramid_box_filter(rng):
    tex = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    pyr = texture.build_mip_pyramid(tex)
    assert [p.shape[0] for p in pyr] == [8, 4, 2, 1]
    np.testing.assert_allclose(
        np.asarray(pyr[1][0, 0]), np.asarray(tex[:2, :2]).mean(axis=(0, 1)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pyr[-1][0, 0]), np.asarray(tex).mean(axis=(0, 1)), atol=1e-6
    )
    pyr2 = texture.build_mip_pyramid(tex, max_levels=1)
    assert len(pyr2) == 2


def test_compute_lod_magnification_vs_minification():
    h = w = 16
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # 1:1 mapping of a 64-texel texture across 16 pixels → 4 texels/pixel → lod 2
    uv = np.stack([xs / w, ys / h], -1).astype(np.float32)
    lod = np.asarray(texture.compute_lod(jnp.asarray(uv), 64, 64))
    np.testing.assert_allclose(lod[2:-2, 2:-2], 2.0, atol=0.1)
    # magnified (tiny footprint) → lod clamped at 0
    lod0 = np.asarray(texture.compute_lod(jnp.asarray(uv * 0.01), 64, 64))
    assert lod0.max() == 0.0


def test_texture_sample_trilinear_blend(rng):
    tex = jnp.asarray(rng.random((8, 8, 1)).astype(np.float32))
    pyr = texture.build_mip_pyramid(tex)
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    s0 = np.asarray(texture.texture_sample(pyr, uv, jnp.asarray([0.0])))
    s1 = np.asarray(texture.texture_sample(pyr, uv, jnp.asarray([1.0])))
    s_half = np.asarray(texture.texture_sample(pyr, uv, jnp.asarray([0.5])))
    np.testing.assert_allclose(s_half, (s0 + s1) / 2, atol=1e-6)
    # lod beyond the chain clamps to the last level
    s_big = np.asarray(texture.texture_sample(pyr, uv, jnp.asarray([99.0])))
    np.testing.assert_allclose(s_big[0], np.asarray(pyr[-1]).reshape(1), atol=1e-6)


def test_bilinear_gradient_scatter(rng):
    """d(sum of samples)/d(texture) equals the bilinear weight footprint."""
    tex = jnp.asarray(rng.random((4, 4, 1)).astype(np.float32))
    uv = jnp.asarray([[0.5 / 4, 0.5 / 4]], jnp.float32)  # texel (0,0) center

    g = jax.grad(lambda t: texture.bilinear_sample(t, uv, "clamp").sum())(tex)
    g = np.asarray(g)[..., 0]
    want = np.zeros((4, 4))
    want[0, 0] = 1.0
    np.testing.assert_allclose(g, want, atol=1e-6)

    # halfway sample spreads gradient 0.5/0.5
    uv2 = jnp.asarray([[1.0 / 4, 0.5 / 4]], jnp.float32)
    g2 = np.asarray(
        jax.grad(lambda t: texture.bilinear_sample(t, uv2, "clamp").sum())(tex)
    )[..., 0]
    np.testing.assert_allclose(g2[0, :2], [0.5, 0.5], atol=1e-6)


def test_mipmap_gradient_flows_to_base(rng):
    """Sampling a coarse mip level must still propagate gradient into the
    base texture (through the differentiable pyramid build)."""
    tex = jnp.asarray(rng.random((8, 8, 1)).astype(np.float32))
    uv = jnp.asarray([[0.25, 0.25]], jnp.float32)

    def loss(t):
        pyr = texture.build_mip_pyramid(t)
        return texture.texture_sample(pyr, uv, jnp.asarray([2.0])).sum()

    g = np.asarray(jax.grad(loss)(tex))[..., 0]
    assert g.sum() == pytest.approx(1.0, abs=1e-5)  # partition of unity
    assert (g > 0).sum() >= 4  # spread over the 4×4 footprint of mip 2


def test_finite_difference_gradcheck(rng):
    """Full trilinear path vs numerical gradient."""
    tex0 = rng.random((8, 8, 2)).astype(np.float32)
    uv = jnp.asarray(rng.random((5, 2)).astype(np.float32) * 0.8 + 0.1)
    lod = jnp.asarray(rng.random(5).astype(np.float32) * 2)
    w = jnp.asarray(rng.random((5, 2)).astype(np.float32))

    def loss(t):
        pyr = texture.build_mip_pyramid(t)
        return (texture.texture_sample(pyr, uv, lod) * w).sum()

    g = np.asarray(jax.grad(loss)(jnp.asarray(tex0)))
    eps = 1e-2
    for (i, j, c) in [(0, 0, 0), (3, 4, 1), (7, 7, 0), (2, 5, 1)]:
        tp = tex0.copy(); tp[i, j, c] += eps
        tm = tex0.copy(); tm[i, j, c] -= eps
        fd = (float(loss(jnp.asarray(tp))) - float(loss(jnp.asarray(tm)))) / (2 * eps)
        np.testing.assert_allclose(g[i, j, c], fd, atol=2e-3)


def test_segsum_backward_matches_autodiff(rng):
    """take_segsum's sorted segment-sum VJP must equal XLA's scatter-add
    transpose on the full trilinear path (duplicate taps included)."""
    tex0 = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    # clustered uvs force duplicate texel indices across samples
    uv = jnp.asarray(
        (rng.random((64, 2)) * 0.2 + 0.4).astype(np.float32)
    )
    lod = jnp.asarray((rng.random(64) * 3).astype(np.float32))
    w = jnp.asarray(rng.random((64, 3)).astype(np.float32))

    def loss(t):
        pyr = texture.build_mip_pyramid(t)
        return (texture.texture_sample(pyr, uv, lod) * w).sum()

    g_ref = jax.grad(loss)(tex0)
    texture.SEGSUM_BACKWARD = True
    try:
        g_seg = jax.grad(loss)(tex0)
    finally:
        texture.SEGSUM_BACKWARD = False
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_seg),
                               rtol=1e-6, atol=1e-6)


def test_texture_sample_stochastic_lod():
    """rng= single-level sampling is an unbiased estimator of trilinear:
    rng→1 picks floor(lod), rng→0 picks ceil(lod) (when frac>0), and the
    frac-weighted average of the two equals the trilinear result."""
    import jax.numpy as jnp

    from texir_code_tpu.ops.texture import build_mip_pyramid, texture_sample

    rng_np = np.random.default_rng(3)
    tex = jnp.asarray(rng_np.random((16, 16, 3)).astype(np.float32))
    pyr = build_mip_pyramid(tex, None)
    uv = jnp.asarray(rng_np.random((64, 2)).astype(np.float32))
    lod = jnp.asarray((rng_np.random(64) * 3).astype(np.float32))

    tri = texture_sample(pyr, uv, lod)
    lo = texture_sample(pyr, uv, lod, rng=jnp.full((64,), 1.0 - 1e-7))
    hi = texture_sample(pyr, uv, lod, rng=jnp.zeros((64,)))
    frac = (lod - jnp.floor(lod))[:, None]
    blend = lo * (1 - frac) + hi * frac
    mask = np.asarray(frac) > 1e-6  # frac==0: hi picks lo's level too
    np.testing.assert_allclose(
        np.asarray(blend)[mask[:, 0]], np.asarray(tri)[mask[:, 0]],
        rtol=1e-5,
    )


def test_mat_forward_mip_stochastic_runs():
    """mip_stochastic knob: the step runs, stays finite, and the rendered
    image is close to the exact-trilinear forward."""
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import make_scene
    from texir_code_tpu.models.material import (
        MaterialModel,
        init_material_params,
    )
    from texir_code_tpu.ops.gbuffer import cube_mvp

    scene = make_scene(atlas_res=48)
    irt = np.maximum(scene.hdr_texture, 0.1)
    kw = dict(pano_res=(32, 64), sample_light=(8, 4))
    m0 = MaterialModel(scene.mesh, scene.hdr_texture, irt, **kw)
    m1 = MaterialModel(scene.mesh, scene.hdr_texture, irt,
                       render_knobs={"mip_stochastic": True}, **kw)
    params = init_material_params(64, 64)
    ext = np.eye(4, dtype=np.float32)
    ext[0:3, 3] = scene.camera_positions(1)[0]
    mvp = cube_mvp(jnp.asarray(ext))
    pos = jnp.asarray(ext[0:3, 3])
    key = jax.random.PRNGKey(9)
    o0 = m0.forward(params, mvp, pos, 2, key)
    o1 = m1.forward(params, mvp, pos, 2, key)
    assert np.isfinite(np.asarray(o1["rgb"])).all()
    # uniform init atlases: every albedo/roughness mip level is identical,
    # so the stochastic level pick cannot change those samples
    np.testing.assert_allclose(
        np.asarray(o1["albedo"]), np.asarray(o0["albedo"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o1["roughness"]), np.asarray(o0["roughness"]), rtol=1e-5
    )
    # the IrT pyramid is non-uniform → rgb differs, but only by the
    # one-level-vs-blend residual (small relative to the image)
    r0, r1 = np.asarray(o0["rgb"]), np.asarray(o1["rgb"])
    assert np.abs(r1 - r0).mean() < 0.05 * max(np.abs(r0).mean(), 1e-6)


def test_texture_sample_stochastic_bilinear_unbiased():
    """rng=[..., 3] one-corner sampling: the Monte-Carlo mean over many
    uniform draws converges to the exact trilinear result, and its gradient
    mean converges to the trilinear gradient (the corner weights are the
    selection probabilities)."""
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.ops.texture import build_mip_pyramid, texture_sample

    rng_np = np.random.default_rng(11)
    tex = jnp.asarray(rng_np.random((16, 16, 2)).astype(np.float32))
    pyr = build_mip_pyramid(tex, None)
    uv = jnp.asarray(rng_np.random((32, 2)).astype(np.float32))
    lod = jnp.asarray((rng_np.random(32) * 3).astype(np.float32))

    exact = texture_sample(pyr, uv, lod)

    n_draws = 4096
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (n_draws, 32, 3))

    @jax.jit
    def one(ui):
        return texture_sample(pyr, uv, lod, rng=ui)

    mean = jnp.mean(jax.vmap(one)(u), axis=0)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(exact), atol=0.02
    )

    # gradient unbiasedness: d(sum)/d(tex), exact vs stochastic mean
    def loss_exact(t):
        return texture_sample(build_mip_pyramid(t, None), uv, lod).sum()

    def loss_stoch(t, ui):
        return texture_sample(build_mip_pyramid(t, None), uv, lod, rng=ui).sum()

    g_exact = jax.grad(loss_exact)(tex)
    g_mean = jnp.mean(
        jax.vmap(lambda ui: jax.grad(loss_stoch)(tex, ui))(u[:1024]), axis=0
    )
    np.testing.assert_allclose(
        np.asarray(g_mean), np.asarray(g_exact), atol=0.05
    )


def test_mat_forward_bilinear_stochastic_runs():
    """bilinear_stochastic knob: the stage-2 forward runs, stays finite, and
    stays close to the exact-trilinear forward on smooth atlases."""
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import make_scene
    from texir_code_tpu.models.material import (
        MaterialModel,
        init_material_params,
    )
    from texir_code_tpu.ops.gbuffer import cube_mvp

    scene = make_scene(atlas_res=48)
    irt = np.maximum(scene.hdr_texture, 0.1)
    kw = dict(pano_res=(32, 64), sample_light=(8, 4))
    m0 = MaterialModel(scene.mesh, scene.hdr_texture, irt, **kw)
    m1 = MaterialModel(
        scene.mesh, scene.hdr_texture, irt,
        render_knobs={"mip_stochastic": True, "bilinear_stochastic": True},
        **kw,
    )
    params = init_material_params(64, 64)
    ext = np.eye(4, dtype=np.float32)
    ext[0:3, 3] = scene.camera_positions(1)[0]
    mvp = cube_mvp(jnp.asarray(ext))
    pos = jnp.asarray(ext[0:3, 3])
    key = jax.random.PRNGKey(9)
    o0 = m0.forward(params, mvp, pos, 2, key)
    o1 = m1.forward(params, mvp, pos, 2, key)
    assert np.isfinite(np.asarray(o1["rgb"])).all()
    # uniform init atlases: corner choice cannot change material samples
    np.testing.assert_allclose(
        np.asarray(o1["albedo"]), np.asarray(o0["albedo"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o1["roughness"]), np.asarray(o0["roughness"]), rtol=1e-5
    )
    # gradients exist and are finite through the 1-tap path
    def loss(p):
        out = m1._forward(p, mvp, pos, key, stage=2)
        return jnp.sum(out["rgb"])

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g.albedo)).all()
    assert np.isfinite(np.asarray(g.roughness)).all()
    assert float(jnp.abs(g.albedo).sum()) > 0
