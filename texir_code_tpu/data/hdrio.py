"""HDR / EXR / LDR image IO and the training-time plot dumps.

Replaces the reference's cv2-based image handling (HDR atlases loaded with
``cv2.imread(..., -1)`` + BGR→RGB + vertical flip, e.g. models/
tracer_o3d_irrf.py:53-56) and utils/plots.py (pred/gt EXR grids).

All functions use RGB channel order and float32; `flip` handles the
v-up texture convention (OBJ uv v=0 = bottom row, image files store top row
first — the reference flips at load, we flip here).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _cv2():
    import cv2

    return cv2


def read_hdr(path: str, flip: bool = False) -> np.ndarray:
    """Read a .hdr/.exr image as float32 RGB [H, W, 3]."""
    img = _cv2().imread(path, -1)
    if img is None:
        raise FileNotFoundError(path)
    img = np.asarray(img, np.float32)
    if img.ndim == 3 and img.shape[2] >= 3:
        img = img[:, :, :3][:, :, ::-1]  # BGR→RGB
    if flip:
        img = img[::-1]
    return np.ascontiguousarray(img)


def write_hdr(path: str, img: np.ndarray, flip: bool = False) -> None:
    """Write float32 RGB [H, W, 3] (or [H, W, 1]/[H, W]) to .hdr/.exr."""
    img = np.asarray(img, np.float32)
    if flip:
        img = img[::-1]
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    ok = _cv2().imwrite(path, np.ascontiguousarray(img[:, :, ::-1]))
    if not ok:
        raise IOError(f"failed to write {path}")


def read_image(path: str) -> np.ndarray:
    """Read an LDR image as float32 RGB(A) in [0, 1]."""
    img = _cv2().imread(path, -1)
    if img is None:
        raise FileNotFoundError(path)
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 3 and img.shape[2] >= 3:
        rgb = img[:, :, :3][:, :, ::-1]
        if img.shape[2] == 4:
            return np.ascontiguousarray(
                np.concatenate([rgb, img[:, :, 3:4]], axis=2)
            )
        return np.ascontiguousarray(rgb)
    return img


def read_gray(path: str) -> np.ndarray:
    """Read a grayscale image as its raw values (float32 [H, W])."""
    img = _cv2().imread(path, -1)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = img[:, :, 0]
    return np.asarray(img, np.float32)


def write_png(path: str, img: np.ndarray) -> None:
    """Write float [0,1] (or uint8) RGB to PNG/JPG."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        img = img[:, :, ::-1]
    _cv2().imwrite(path, np.ascontiguousarray(img))


def tonemap_to_ldr(img: np.ndarray) -> np.ndarray:
    """γ-2.2 tonemapping to [0, 1] (reference tools/hdr2ldr.py)."""
    return np.clip(np.power(np.clip(img, 0, None), 1.0 / 2.2), 0.0, 1.0)


# ---------------------------------------------------------------------------
# training plot dumps (reference utils/plots.py)
# ---------------------------------------------------------------------------


def plot_irf(path: str, pred: np.ndarray, gt: np.ndarray) -> None:
    """Stacked pred/gt EXR grid (reference utils/plots.py:27-49)."""
    grid = np.concatenate([np.asarray(pred), np.asarray(gt)], axis=0)
    write_hdr(path, grid)


def plot_gbuffer(path: str, position: np.ndarray, normal: np.ndarray) -> None:
    """Position/normal dump (reference utils/plots.py:51-67)."""
    grid = np.concatenate(
        [np.asarray(position), np.asarray(normal) * 0.5 + 0.5], axis=0
    )
    write_hdr(path, grid)


def plot_mat(
    path: str,
    rgb: np.ndarray,
    gt: np.ndarray,
    albedo: Optional[np.ndarray] = None,
    roughness: Optional[np.ndarray] = None,
) -> None:
    """Render/GT (+materials) grid (reference utils/plots.py:69-85).

    Face stacks [F, H, W, C] are tiled horizontally, rows stacked
    vertically."""

    def tile(x):
        x = np.asarray(x)
        if x.ndim == 4:
            x = np.concatenate(list(x), axis=1)
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        return x

    rows = [tile(rgb), tile(gt)]
    if albedo is not None:
        rows.append(tile(albedo))
    if roughness is not None:
        rows.append(tile(roughness))
    write_hdr(path, np.concatenate(rows, axis=0))
