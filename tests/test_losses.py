"""Loss tests: every seg-loss mode and the TV loss are checked against torch
oracle transcriptions of the reference formulas (models/loss.py), built from
the documented math with the one-hot mask expansion the reference uses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.models import losses

F, H, W, C = 2, 16, 16, 1
NUM_CLASSES = 6


@pytest.fixture
def seg_setup(rng):
    img = rng.random((F, H, W, 3)).astype(np.float32)
    seg_id = rng.integers(0, NUM_CLASSES, (F, H, W)).astype(np.int32)
    highlight = (rng.random((F, H, W, 1)) > 0.7).astype(np.float32)
    rough = rng.random((F, H, W, 1)).astype(np.float32)
    rough_womip = rng.random((F, H, W, 1)).astype(np.float32)
    room_id = rng.integers(0, 3, (F, H, W)).astype(np.int32)
    return img, seg_id, highlight, rough, rough_womip, room_id


def one_hot_masks(seg_id, n):
    """[n, F, H, W, 1] one-hot expansion (the reference's seg_mask layout)."""
    oh = np.stack([(seg_id == c).astype(np.float32) for c in range(n)])
    return oh[..., None]


def torch_seg_loss_mode0(img, seg_mask):
    import torch

    img = torch.from_numpy(img)
    seg_mask = torch.from_numpy(seg_mask)
    classes = seg_mask.shape[0]
    b, h, w, c = img.shape
    seg = seg_mask.reshape(classes, b, h * w, -1)
    img_segs = img.reshape(b, -1, c).unsqueeze(0).expand(classes, -1, -1, -1)
    mean_img = (img_segs * seg).reshape(classes, -1, c).sum(1, keepdim=True) / (
        seg.reshape(classes, -1, 1).sum(1, keepdim=True) + 1e-6
    )
    return torch.nn.L1Loss()(img_segs * seg, mean_img.unsqueeze(1) * seg).item()


def torch_seg_loss_mode1(img, img_womip, seg_mask, floor_mask,
                         delta=0.4, override_class=43, override_value=0.8):
    import torch

    img = torch.from_numpy(img)
    img_womip = torch.from_numpy(img_womip)
    seg_mask = torch.from_numpy(seg_mask)
    floor_mask = torch.from_numpy(floor_mask)
    classes = seg_mask.shape[0]
    b, h, w, c = img.shape
    seg = seg_mask.reshape(classes, b, h * w, -1)
    floor = floor_mask.reshape(classes, b, h * w, -1)
    img_segs = img.reshape(b, -1, c).unsqueeze(0).expand(classes, -1, -1, -1)
    womip = img_womip.reshape(b, -1, c).unsqueeze(0).expand(classes, -1, -1, -1)
    num_pixel = floor.reshape(classes, -1, 1).sum(1, keepdim=True)
    mean_img = torch.ones((classes, 1, c))
    for i in range(classes):
        if num_pixel[i, 0, 0].item() == 0:
            mean_img[i] = 0
            continue
        vals = womip.reshape(classes, -1, c)[i][floor.reshape(classes, -1, c)[i].bool()]
        mean_img[i] = torch.quantile(vals, delta, dim=0, keepdim=True)
        if i == override_class:
            mean_img[i] = torch.ones_like(mean_img[i]) * override_value
    mean_img = mean_img.unsqueeze(1)
    occ = (num_pixel / (num_pixel + 1e-6)).unsqueeze(1)
    return torch.nn.L1Loss()(
        img_segs * (seg - floor) * occ, mean_img * (seg - floor) * occ
    ).item()


def torch_seg_loss_mode2(img, seg_mask, room_mask):
    import torch

    img = torch.from_numpy(img)
    seg_mask = torch.from_numpy(seg_mask)
    room_mask = torch.from_numpy(room_mask)
    classes = seg_mask.shape[0]
    rooms = room_mask.shape[0]
    b, h, w, c = img.shape
    seg = seg_mask.reshape(classes, b, h * w, -1)
    room = room_mask.reshape(rooms, b, -1, 1)
    img_segs = img.reshape(b, -1, c).unsqueeze(0).expand(classes, -1, -1, -1)
    num = (img_segs.unsqueeze(0) * seg.unsqueeze(0) * room.unsqueeze(1)).reshape(
        rooms, classes, -1, c
    ).sum(2, keepdim=True)
    den = (seg.unsqueeze(0) * room.unsqueeze(1)).reshape(rooms, classes, -1, 1).sum(
        2, keepdim=True
    ) + 1e-6
    mean_img = num / den
    return torch.nn.L1Loss()(
        img_segs.unsqueeze(0) * seg.unsqueeze(0) * room.unsqueeze(1),
        mean_img.unsqueeze(2) * seg.unsqueeze(0) * room.unsqueeze(1),
    ).item()


def torch_tv_loss(img, seg_mask, weight=0.01):
    import torch

    x = torch.from_numpy(img).permute(0, 3, 1, 2)  # [F, C, H, W]
    seg_mask = torch.from_numpy(seg_mask)
    erode = torch.nn.MaxPool2d(5, stride=1, padding=2)
    batch, ch, h, w = x.shape
    count_h = ch * (h - 1) * w
    count_w = ch * h * (w - 1)
    classes, f, hh, ww, cc = seg_mask.shape
    sm = seg_mask.permute(0, 1, 4, 2, 3).reshape(-1, cc, hh, ww)
    w_mask = (-erode(-sm)[:, :, :, : w - 1]).reshape(classes, f, 1, hh, ww - 1)
    h_mask = (-erode(-sm)[:, :, : h - 1, :]).reshape(classes, f, 1, hh - 1, ww)
    h_tv = ((x[:, :, 1:, :] - x[:, :, : h - 1, :]).unsqueeze(0) * h_mask).pow(2).sum()
    w_tv = ((x[:, :, :, 1:] - x[:, :, :, : w - 1]).unsqueeze(0) * w_mask).pow(2).sum()
    return (weight * 2 * (h_tv / count_h + w_tv / count_w) / batch / classes).item()


def test_seg_loss_mode0_matches_torch(seg_setup):
    img, seg_id, *_ = seg_setup
    got = float(losses.seg_loss(jnp.asarray(img), jnp.asarray(seg_id), NUM_CLASSES, 0))
    want = torch_seg_loss_mode0(img, one_hot_masks(seg_id, NUM_CLASSES))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_seg_loss_mode1_matches_torch(seg_setup):
    _, seg_id, highlight, rough, rough_womip, _ = seg_setup
    oh = one_hot_masks(seg_id, NUM_CLASSES)
    floor = oh * highlight[None]
    got = float(
        losses.seg_loss(
            jnp.asarray(rough), jnp.asarray(seg_id), NUM_CLASSES, 1,
            img_womipmap=jnp.asarray(rough_womip), highlight=jnp.asarray(highlight),
            override_class=3, override_value=0.8,
        )
    )
    want = torch_seg_loss_mode1(rough, rough_womip, oh, floor, override_class=3)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_seg_loss_mode1_empty_highlight_class(seg_setup):
    """A class with zero highlight pixels contributes zero."""
    _, seg_id, _, rough, rough_womip, _ = seg_setup
    highlight = np.zeros((F, H, W, 1), np.float32)  # no highlights anywhere
    got = float(
        losses.seg_loss(
            jnp.asarray(rough), jnp.asarray(seg_id), NUM_CLASSES, 1,
            img_womipmap=jnp.asarray(rough_womip), highlight=jnp.asarray(highlight),
        )
    )
    assert got == pytest.approx(0.0, abs=1e-6)


def test_seg_loss_mode2_matches_torch(seg_setup):
    _, seg_id, _, rough, _, room_id = seg_setup
    oh = one_hot_masks(seg_id, NUM_CLASSES)
    room_oh = np.stack([(room_id == r).astype(np.float32) for r in range(3)])[..., None]
    got = float(
        losses.seg_loss(
            jnp.asarray(rough), jnp.asarray(seg_id), NUM_CLASSES, 2,
            room_id=jnp.asarray(room_id), num_rooms=3,
        )
    )
    want = torch_seg_loss_mode2(rough, oh, room_oh)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_tv_loss_matches_torch(seg_setup):
    img, seg_id, *_ = seg_setup
    got = float(losses.tv_loss(jnp.asarray(img), jnp.asarray(seg_id), NUM_CLASSES))
    want = torch_tv_loss(img, one_hot_masks(seg_id, NUM_CLASSES))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_masked_quantile_matches_torch(rng):
    import torch

    vals = rng.random(200).astype(np.float32)
    seg = rng.integers(0, 4, 200).astype(np.int32)
    mask = (rng.random(200) > 0.4).astype(np.float32)
    q, counts = losses.masked_quantile_per_class(
        jnp.asarray(vals), jnp.asarray(seg), jnp.asarray(mask), 4,
        jnp.full((4,), 0.4),
    )
    for c in range(4):
        sel = (seg == c) & (mask > 0)
        assert int(counts[c]) == sel.sum()
        if sel.sum():
            want = torch.quantile(torch.from_numpy(vals[sel]), 0.4).item()
            np.testing.assert_allclose(float(q[c]), want, rtol=1e-5)
        else:
            assert float(q[c]) == 0.0


def test_irf_loss():
    gt = jnp.asarray([[1.0, 2.0, 3.0]])
    pred = jnp.log(gt + 1.0)
    assert float(losses.irf_loss(gt, pred)) == pytest.approx(0.0, abs=1e-6)
    assert float(losses.irf_loss(gt, pred + 0.5)) == pytest.approx(0.5, abs=1e-5)


def test_ssim_matches_pytorch_msssim(rng):
    torch = pytest.importorskip("torch")
    try:
        from pytorch_msssim import ssim as t_ssim
    except ImportError:
        pytest.skip("pytorch_msssim not installed")
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = t_ssim(
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2),
        data_range=1.0, size_average=True, nonnegative_ssim=True,
    ).item()
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_ssim_identity(rng):
    a = jnp.asarray(rng.random((1, 24, 24, 3)).astype(np.float32))
    assert float(losses.ssim(a, a)) == pytest.approx(1.0, abs=1e-5)


def test_render_loss_stages(seg_setup, rng):
    img, seg_id, highlight, rough, rough_womip, room_id = seg_setup
    gt = jnp.asarray(rng.random((F, H, W, 3)).astype(np.float32))
    preds = {
        "rgb": jnp.asarray(img),
        "albedo": jnp.asarray(img),
        "roughness": jnp.asarray(rough),
        "roughness_womipmap": jnp.asarray(rough_womip),
        "empty_mask": jnp.ones((F, H, W, 1)),
    }
    gt_mask = jnp.ones((F, H, W, 1))
    seg_region = jnp.ones((F, H, W, 1))
    for stage in (0, 1, 2):
        total, seg_term = losses.render_loss(
            gt, preds, gt_mask, jnp.asarray(seg_id), NUM_CLASSES, stage,
            highlight=jnp.asarray(highlight), seg_region=seg_region,
            room_id=jnp.asarray(room_id), num_rooms=3,
        )
        assert np.isfinite(float(total)) and np.isfinite(float(seg_term))
        assert float(total) >= 0


def test_kl_divergence_minimized_at_rho():
    """KL is ~0 when mean activation equals rho."""
    import scipy.special as sp

    rho = 0.05
    latent = np.full((100, 8), sp.logit(rho), np.float32)
    val = float(losses.kl_divergence(rho, jnp.asarray(latent)))
    assert val == pytest.approx(0.0, abs=1e-5)
    latent2 = np.full((100, 8), sp.logit(0.5), np.float32)
    assert float(losses.kl_divergence(rho, jnp.asarray(latent2))) > 0.1


def test_neilf_and_nvdiffrec_losses(rng):
    out = {
        "rgb": jnp.asarray(rng.random((4, 8, 8, 3)).astype(np.float32)),
        "brdf_grad": jnp.asarray(rng.random((4, 8, 8, 3)).astype(np.float32)),
        "roughness": jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32)),
        "kd_grad": jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32)),
    }
    gt = jnp.asarray(rng.random((4, 8, 8, 3)).astype(np.float32))
    grad = jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32))
    assert np.isfinite(float(losses.neilf_loss(out, gt, grad)))
    assert np.isfinite(float(losses.nvdiffrec_loss(out, gt, jnp.asarray(50.0))))
