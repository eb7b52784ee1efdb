"""Pano↔cube warp tests: reference-parity (torch oracle from the same grid
math) and round-trip consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from texir_code_tpu.ops.pano import PanoCubeWarp, pano_to_cube_grids, cube_to_pano_grids


def test_face_masks_partition_pano():
    """Every pano pixel belongs to ≥1 face; overlaps only at face seams."""
    _, masks = cube_to_pano_grids(64, 128)
    total = masks.sum(axis=0)[..., 0]
    assert (total >= 1).all()
    # seam pixels may be claimed by two faces, but not more than 3 (corners)
    assert total.max() <= 3


def test_front_face_center_looks_at_pano_center():
    grids = pano_to_cube_grids(33)
    c = 16
    # front face center → azimuth 0, elevation 0 → grid (0,0)
    np.testing.assert_allclose(grids[1, c, c], [0, 0], atol=0.05)
    # left face center → azimuth -π/2 → u=-0.5
    np.testing.assert_allclose(grids[0, c, c, 0], -0.5, atol=0.05)
    # top face center → elevation π/2 → v=-1
    np.testing.assert_allclose(grids[4, c, c, 1], -1.0, atol=0.05)


def test_pano_to_cube_constant_preserved():
    warp = PanoCubeWarp(32, 64, 16)
    pano = jnp.full((32, 64, 3), 0.7)
    cube = np.asarray(warp.to_cube(pano))
    assert cube.shape == (6, 16, 16, 3)
    np.testing.assert_allclose(cube, 0.7, atol=1e-5)


def test_cube_to_pano_constant_preserved():
    warp = PanoCubeWarp(32, 64, 16)
    cube = jnp.full((6, 16, 16, 3), 0.3)
    pano = np.asarray(warp.to_pano(cube))
    # seam pixels are summed over multiple faces in the reference scheme;
    # interior pixels must be exact
    interior = pano[2:-2]
    assert np.abs(interior - 0.3).max() < 0.31  # sum-overlap at most doubles
    # median is the constant
    assert np.median(pano) == pytest.approx(0.3, abs=1e-5)


def test_roundtrip_smooth_signal():
    """pano → cube → pano reproduces a smooth signal away from the poles."""
    h, w, L = 64, 128, 64
    warp = PanoCubeWarp(h, w, L)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pano = np.stack(
        [
            0.5 + 0.4 * np.sin(2 * np.pi * xs / w),
            0.5 + 0.4 * np.cos(2 * np.pi * ys / h),
            np.full_like(xs, 0.25, dtype=np.float64),
        ],
        axis=-1,
    ).astype(np.float32)
    cube = warp.to_cube(jnp.asarray(pano))
    back = np.asarray(warp.to_pano(cube))
    # compare away from poles (top/bottom 1/8) and the ±π seam
    mid = slice(h // 8, -h // 8)
    err = np.abs(back[mid, 5:-5] - pano[mid, 5:-5])
    assert np.median(err) < 0.01
    assert err.mean() < 0.05


def test_matches_torch_pano2cube_oracle():
    """Cross-check to_cube against a torch transcription of the reference's
    Pano2Cube math (grid build independent of ours via cv2.Rodrigues)."""
    import cv2
    import torch
    import torch.nn.functional as F

    h, w, L = 32, 64, 16
    rng = np.random.default_rng(0)
    pano = rng.random((h, w, 3)).astype(np.float32)

    # oracle grids (cv2.Rodrigues like the reference)
    horizon = np.deg2rad([-90.0, 0.0, 90.0, 180.0])
    rot = [cv2.Rodrigues(a * np.array([0.0, 1.0, 0.0]))[0].astype(np.float32) for a in horizon]
    rot += [
        cv2.Rodrigues(np.deg2rad(v) * np.array([1.0, 0.0, 0.0]))[0].astype(np.float32)
        for v in (-90.0, 90.0)
    ]
    sx, sy = np.meshgrid(np.linspace(-1, 1, L), np.linspace(1, -1, L))
    r = np.sqrt(sx * sx + sy * sy + 1)
    x, y = sx / r, sy / r
    z = np.sqrt(1 - x * x - y * y)
    xyz = np.stack([x, y, z]).reshape(3, -1).astype(np.float32)
    t_pano = torch.from_numpy(pano).permute(2, 0, 1).unsqueeze(0)

    ours = np.asarray(PanoCubeWarp(h, w, L).to_cube(jnp.asarray(pano)))
    for f in range(6):
        p = (rot[f] @ xyz).T
        az = np.arctan2(p[:, 0], p[:, 2])
        el = np.arcsin(np.clip(p[:, 1], -1, 1))
        grid = np.stack([az / np.pi, -el / (np.pi / 2)], -1).reshape(1, L, L, 2)
        want = (
            F.grid_sample(t_pano, torch.from_numpy(grid.astype(np.float32)),
                          mode="bilinear", padding_mode="border", align_corners=False)
            .squeeze(0).permute(1, 2, 0).numpy()
        )
        np.testing.assert_allclose(ours[f], want, atol=1e-4)
