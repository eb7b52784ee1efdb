"""End-to-end forward + pixel-gradient parity vs an independent torch oracle.

The BASELINE.json headline metric is "pixel-grad max abs err vs the
reference": the reference's differentiable path is mip texture sampling
(dr.texture, models/mat_nvdiffrast.py:128-139) -> BRDF math (:201-290) ->
RenderLoss (models/loss.py:81-115), with G-buffers and light directions
detached.  This test rebuilds that differentiable chain *in torch autograd*
from the same detached inputs (G-buffer, LODs, sample shifts, TBL radiance
values) on a tiny synthetic scene and asserts that the JAX step's forward
image, loss, and d(loss)/d(atlas) gradients match.

The torch oracle is written from the reference's formulas (cited per term),
not from the JAX code path — torch's autograd is the independent gradient
oracle for the texture-sampling VJP and the BRDF chain.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.models.losses import render_loss
from texir_code_tpu.models.material import MaterialModel, MaterialParams
from texir_code_tpu.ops.texture import compute_lod, texture_sample

TINY = 1e-6
TINY_TINY = 1e-14


# ---------------------------------------------------------------------------
# torch building blocks (reference formulas)
# ---------------------------------------------------------------------------


def t_mip_pyramid(tex, max_levels):
    """nvdiffrast mip build: 2x2 box filter chain."""
    levels = [tex]
    while True:
        cur = levels[-1]
        h, w = cur.shape[0], cur.shape[1]
        if h < 2 or w < 2 or h % 2 or w % 2 or len(levels) >= max_levels + 1:
            break
        levels.append(
            cur.reshape(h // 2, 2, w // 2, 2, -1).mean(dim=(1, 3))
        )
    return levels


def t_bilinear(tex, uv, wrap=True):
    """Bilinear fetch, wrap addressing (nvdiffrast default)."""
    h, w = tex.shape[0], tex.shape[1]
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = torch.floor(x)
    y0 = torch.floor(y)
    fx = (x - x0).unsqueeze(-1)
    fy = (y - y0).unsqueeze(-1)
    x0i = x0.long()
    y0i = y0.long()
    if wrap:
        xs = (x0i % w, (x0i + 1) % w)
        ys = (y0i % h, (y0i + 1) % h)
    else:
        xs = (x0i.clamp(0, w - 1), (x0i + 1).clamp(0, w - 1))
        ys = (y0i.clamp(0, h - 1), (y0i + 1).clamp(0, h - 1))
    flat = tex.reshape(h * w, -1)
    t00 = flat[ys[0] * w + xs[0]]
    t01 = flat[ys[0] * w + xs[1]]
    t10 = flat[ys[1] * w + xs[0]]
    t11 = flat[ys[1] * w + xs[1]]
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def t_trilinear(pyramid, uv, lod):
    """linear-mipmap-linear sample at per-pixel lod."""
    n = len(pyramid)
    lod = lod.clamp(0.0, n - 1.0)
    lo = torch.floor(lod).long()
    hi = torch.minimum(lo + 1, torch.full_like(lo, n - 1))
    frac = (lod - lo.float()).unsqueeze(-1)
    out_lo = torch.zeros(uv.shape[0], pyramid[0].shape[-1])
    out_hi = torch.zeros_like(out_lo)
    for lev in range(n):
        m_lo = lo == lev
        m_hi = hi == lev
        if m_lo.any():
            out_lo = out_lo + torch.where(
                m_lo.unsqueeze(-1), t_bilinear(pyramid[lev], uv), torch.zeros(1)
            )
        if m_hi.any():
            out_hi = out_hi + torch.where(
                m_hi.unsqueeze(-1), t_bilinear(pyramid[lev], uv), torch.zeros(1)
            )
    return out_lo * (1 - frac) + out_hi * frac


def t_onb(n):
    """reference utils/sample_util.py:84-91 (with the 1e-6 norm epsilons)."""
    big = n[:, 0].abs() > 0.99
    ax = torch.stack(
        [torch.where(big, 0.0, 1.0), torch.where(big, 1.0, 0.0),
         torch.zeros_like(n[:, 0])], dim=-1,
    )

    def norm(x):
        return x / (x.norm(dim=-1, keepdim=True) + TINY)

    nn = norm(n)
    u = norm(torch.cross(ax, nn, dim=-1))
    v = norm(torch.cross(nn, u, dim=-1))
    return nn, u, v


def t_ggx_half_vectors(normal, rough, samples):
    """GGX importance half-vectors (reference utils/sample_util.py:133-143)."""
    nn, u, v = t_onb(normal)
    u1 = samples[..., 0]
    u2 = samples[..., 1]
    a = (rough * rough).unsqueeze(-1) if rough.dim() == 1 else rough * rough
    cos_t = torch.sqrt((1.0 - u1) / (1.0 + (a * a - 1.0) * u1))
    cos_t = cos_t.clamp(-1.0 + TINY, 1.0 - TINY)
    phi = 2.0 * math.pi * u2 - math.pi
    sin_t = torch.sqrt((1.0 - cos_t * cos_t).clamp(0.0, 1.0))
    sp = torch.sin(phi) * sin_t
    cp = -(torch.cos(phi) * sin_t)
    return (
        v.unsqueeze(1) * sp.unsqueeze(-1)
        + nn.unsqueeze(1) * cos_t.unsqueeze(-1)
        + u.unsqueeze(1) * cp.unsqueeze(-1)
    )


def t_specular(lighting, half, normal, view, light_dirs, rough):
    """Cook-Torrance estimator (reference models/mat_nvdiffrast.py:260-279)."""

    def cdot(a, b):
        return (a * b).sum(-1).clamp(0.0, 1.0)

    vdh = cdot(half, view.unsqueeze(1))
    ndl = cdot(normal.unsqueeze(1), light_dirs)
    ndh = cdot(normal.unsqueeze(1), half)
    ndv = cdot(normal, view).unsqueeze(1)
    f = 0.04 + 0.96 * torch.pow(
        torch.tensor(2.0), (-5.55472 * vdh - 6.98316) * vdh
    )
    r = rough.unsqueeze(-1)
    k = (r + 1.0) * (r + 1.0) / 8.0
    g1v = ndv / (ndv * (1 - k) + k).clamp_min(TINY_TINY)
    g1l = ndl / (ndl * (1 - k) + k).clamp_min(TINY_TINY)
    g = g1l * g1v
    brdf = f * g / (4.0 * ndl * ndv).clamp_min(TINY_TINY)
    weight = brdf * ndl * 4.0 * vdh / ndh.clamp_min(TINY_TINY)
    return (lighting * weight.unsqueeze(-1)).sum(1)


def t_hdr_scale(x):
    return torch.log(x + 1.0)


def t_seg_mean_loss(values, seg, num_classes):
    """SegLoss mode 0 (reference models/loss.py:282-285 normalization)."""
    pix, c = values.shape
    sums = torch.zeros(num_classes, c).index_add_(0, seg, values)
    counts = torch.zeros(num_classes, 1).index_add_(
        0, seg, torch.ones(pix, 1)
    )
    means = sums / (counts + TINY)
    per_pixel = (values - means[seg]).abs()
    return per_pixel.sum() / (num_classes * pix * c)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    scene = make_scene(atlas_res=32)
    irt = rng.uniform(0.3, 1.5, (16, 16, 3)).astype(np.float32)
    model = MaterialModel(
        scene.mesh, scene.hdr_texture, irt, pano_res=(16, 32),
        sample_light=(8, 4),
    )
    params = MaterialParams(
        albedo=jnp.asarray(rng.uniform(0.2, 0.8, (16, 16, 3)).astype(np.float32)),
        roughness=jnp.asarray(
            rng.uniform(0.15, 0.7, (16, 16, 1)).astype(np.float32)
        ),
    )
    pos = jnp.asarray(scene.camera_positions(1)[0])
    ext = np.eye(4, dtype=np.float32)
    ext[0:3, 3] = np.asarray(pos)
    from texir_code_tpu.ops.gbuffer import cube_mvp

    mvp = cube_mvp(jnp.asarray(ext))
    key = jax.random.PRNGKey(3)
    res = model.cube_res
    gt = jnp.asarray(rng.uniform(0.05, 0.6, (6, res, res, 3)).astype(np.float32))

    # detached inputs shared with the oracle
    g = model._gbuffer(mvp, pos)
    uv = np.asarray(g.uv)
    normal = np.asarray(g.normal)
    position = np.asarray(g.position)
    mask = np.asarray(g.mask)
    prim = np.asarray(g.prim)
    seg_id = np.clip(prim // 2, 0, 5).astype(np.int32)  # wall id per pixel
    b = 6 * res * res

    lod_a = np.asarray(compute_lod(g.uv, 16, 16)).reshape(b)
    lod_r = lod_a
    lod_i = lod_a
    irr = np.asarray(
        texture_sample(
            model.irt_pyramid, g.uv.reshape(b, 2), jnp.asarray(lod_i)
        )
    )
    row_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(b, dtype=jnp.int32)
    )
    spec_shift = np.asarray(
        jax.vmap(lambda k: jax.random.uniform(k, (2,)))(row_keys)
    )
    return dict(
        scene=scene, model=model, params=params, mvp=mvp, pos=pos, key=key,
        gt=gt, uv=uv, normal=normal, position=position, mask=mask,
        seg_id=seg_id, lod=lod_a, irr=irr, spec_shift=spec_shift, res=res, b=b,
    )


def _jax_loss_and_grads(s, stage):
    model, params = s["model"], s["params"]
    res = s["res"]
    seg = jnp.asarray(s["seg_id"])
    ones = jnp.ones((6, res, res, 1))

    def loss_fn(p):
        out = model._forward(p, s["mvp"], s["pos"], s["key"], stage=stage)
        total, _ = render_loss(
            s["gt"], out, ones, seg, 6, stage, seg_region=ones,
        )
        return total, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return float(loss), out, grads


def test_stage0_forward_and_grad_parity(setup):
    s = setup
    loss_jax, out, grads = _jax_loss_and_grads(s, 0)
    b, res = s["b"], s["res"]

    alb_t = torch.tensor(np.asarray(s["params"].albedo), requires_grad=True)
    uv_t = torch.tensor(s["uv"].reshape(b, 2))
    lod_t = torch.tensor(s["lod"])
    pyr = t_mip_pyramid(alb_t, s["model"].max_mip_level)
    albedo_px = t_trilinear(pyr, uv_t, lod_t)                       # [B, 3]
    irr_t = torch.tensor(s["irr"])
    rgb = irr_t * albedo_px / math.pi                               # :232
    # RenderLoss stage 0 (reference models/loss.py:89-96)
    empty = torch.tensor(s["mask"].reshape(b, 1))
    gt_t = torch.tensor(np.asarray(s["gt"]).reshape(b, 3))
    direct = (t_hdr_scale(rgb * empty) - t_hdr_scale(gt_t)).abs().mean()
    seg_t = torch.tensor(s["seg_id"].reshape(b).astype(np.int64))
    seg_term = t_seg_mean_loss(albedo_px, seg_t, 6) * 20.0
    loss_t = direct + seg_term
    loss_t.backward()

    np.testing.assert_allclose(
        np.asarray(out["rgb"]).reshape(b, 3), rgb.detach().numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(loss_jax, float(loss_t), rtol=1e-4)
    grad_jax = np.asarray(grads.albedo)
    grad_t = alb_t.grad.numpy()
    err = np.abs(grad_jax - grad_t).max()
    scale = np.abs(grad_t).max()
    assert err <= 1e-4 * max(scale, 1e-3), (
        f"pixel-grad max abs err {err} (scale {scale})"
    )


def test_stage2_forward_and_grad_parity(setup):
    s = setup
    loss_jax, out, grads = _jax_loss_and_grads(s, 2)
    b, res = s["b"], s["res"]
    model = s["model"]

    # --- torch leafs -----------------------------------------------------
    alb_t = torch.tensor(np.asarray(s["params"].albedo), requires_grad=True)
    rgh_t = torch.tensor(np.asarray(s["params"].roughness), requires_grad=True)
    uv_t = torch.tensor(s["uv"].reshape(b, 2))
    lod_t = torch.tensor(s["lod"])

    albedo_px = t_trilinear(t_mip_pyramid(alb_t, model.max_mip_level), uv_t, lod_t)
    rough_px = t_trilinear(
        t_mip_pyramid(rgh_t, model.max_mip_level), uv_t, lod_t
    ).squeeze(-1)

    irr_t = torch.tensor(s["irr"])
    diffuse = irr_t * albedo_px / math.pi

    normal_t = torch.tensor(s["normal"].reshape(b, 3))
    # render input points: position + 1e-2 n (models/mat_nvdiffrast.py:181)
    pts = torch.tensor(
        (s["position"] + 1e-2 * s["normal"]).reshape(b, 3)
    )
    cam = torch.tensor(np.asarray(s["pos"]))
    view = cam - pts
    view = view / view.norm(dim=-1, keepdim=True).clamp_min(1e-4)

    # GGX sampling from the same Hammersley+shift draw
    from texir_code_tpu.ops.sampling import hammersley_np

    ham = hammersley_np(4)
    samples = np.mod(ham[None] + s["spec_shift"][:, None, :], 1.0)
    samples = np.clip(samples, TINY, 1.0 - TINY).astype(np.float32)
    half = t_ggx_half_vectors(normal_t, rough_px, torch.tensor(samples))
    vdh = (half * view.unsqueeze(1)).sum(-1).clamp(0.0, 1.0)
    light = 2.0 * vdh.unsqueeze(-1) * half - view.unsqueeze(1)

    # TBL radiance values along the same (detached) rays, from JAX
    from texir_code_tpu.models.tbl import query_tbl_soa

    light_np = jax.lax.stop_gradient(
        jnp.asarray(light.detach().numpy())
    )
    lighting = query_tbl_soa(
        model.tbl,
        tuple(jnp.broadcast_to(jnp.asarray(pts.numpy())[:, None, k], (b, 4))
              for k in range(3)),
        tuple(light_np[..., k] for k in range(3)),
    )
    lighting_t = torch.tensor(np.stack([np.asarray(x) for x in lighting], -1))

    spec = t_specular(lighting_t, half, normal_t, view, light, rough_px) / 4.0
    rgb = diffuse + spec

    empty = torch.tensor(s["mask"].reshape(b, 1))
    gt_t = torch.tensor(np.asarray(s["gt"]).reshape(b, 3))
    # RenderLoss stage 2 (reference models/loss.py:106-115)
    direct = (t_hdr_scale(gt_t) - t_hdr_scale(rgb * empty)).abs().mean() / 6.0
    seg_t = torch.tensor(s["seg_id"].reshape(b).astype(np.int64))
    seg_term = t_seg_mean_loss(rough_px.unsqueeze(-1), seg_t, 6) * 0.2
    loss_t = direct + seg_term
    loss_t.backward()

    np.testing.assert_allclose(
        np.asarray(out["rgb"]).reshape(b, 3), rgb.detach().numpy(),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(loss_jax, float(loss_t), rtol=1e-3)
    for name, gj, gt_ in (
        ("albedo", np.asarray(grads.albedo), alb_t.grad.numpy()),
        ("roughness", np.asarray(grads.roughness), rgh_t.grad.numpy()),
    ):
        err = np.abs(gj - gt_).max()
        scale = max(np.abs(gt_).max(), 1e-3)
        assert err <= 2e-3 * scale, (
            f"{name} pixel-grad max abs err {err} (scale {scale})"
        )
