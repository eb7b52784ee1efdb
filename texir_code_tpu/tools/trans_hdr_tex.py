"""Repack pano-space images into the mesh atlas via the scan index texture.

Rebuild of reference tools/trans_hdr_tex.py:16-216.  The real-scan
pipeline's "index texture" `hdr_texture/0.png` stores, per atlas texel, a
*multi-view* pano lookup:

    channel 0: pano row as a fraction of height, fixed-point ×50000
    channel 1: pano col as a fraction of width,  fixed-point ×50000
    channel 2: view id — an index into info/aligned.txt (reference :27-34)

so each texel is pulled from the pano of the view that best observed it.
Texels whose three channels sum to zero are unmapped seams and stay black
(reference :56-57).  Four repack targets, matching the reference entry
points:

    hdr        hdr/<id>/ccm.hdr            → 0_hdr_ccm_upper.hdr  (:16-61)
    seg        derived/<id>/panoImage_gray.png → 0_seg_gray.png    (:64-110)
    albedo     methods/<m>/<id>/albedo.png → 0_<m>_albedo.png      (:112-163)
    roughness  methods/<m>/<id>/roughness.png → 0_<m>_roughness.png (:165-216)

The material variants apply the reference's 1/2.2 re-encode, 2048² resize
and 4×4 dilation (:152,157-159).

    python -m texir_code_tpu.tools.trans_hdr_tex hdr --project PATH
    python -m texir_code_tpu.tools.trans_hdr_tex albedo --project PATH \
        --method phyir
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Optional, Tuple

import numpy as np

PACK_SCALE = 50000.0  # the reference's fixed-point packing divisor


def read_scan_ids(project_path: str) -> list:
    with open(os.path.join(project_path, "info", "aligned.txt")) as f:
        return [ln.strip() for ln in f if ln.strip()]


def decode_index_texture(
    index_img: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Index texture → (row_frac, col_frac, view_id, valid).

    row/col are fractions of the pano extent (each view's pano may have
    its own resolution — scaling happens per view, reference :50-53).
    """
    idx = np.asarray(index_img)
    if idx.ndim != 3 or idx.shape[2] < 3:
        raise ValueError("index texture must have 3 channels (row/col/view)")
    row_frac = idx[..., 0].astype(np.float64) / PACK_SCALE
    col_frac = idx[..., 1].astype(np.float64) / PACK_SCALE
    view_id = idx[..., 2].astype(np.int64)
    valid = (
        idx[..., 0].astype(np.int64)
        + idx[..., 1].astype(np.int64)
        + idx[..., 2].astype(np.int64)
    ) > 0
    return row_frac, col_frac, view_id, valid


def repack_multiview(
    index_img: np.ndarray,
    load_pano,
    view_ids: Optional[list] = None,
    dtype=np.float32,
    channels: int = 3,
) -> np.ndarray:
    """Pull each atlas texel from its view's pano.

    load_pano(view_id:int) -> [H, W, C] array (H/W may differ per view).
    Vectorized per view id — one fancy-gather per distinct view
    (the reference loops views the same way, :28-54).
    """
    row_frac, col_frac, vid, valid = decode_index_texture(index_img)
    out = np.zeros(index_img.shape[:2] + (channels,), dtype)
    present = np.unique(vid[valid]) if view_ids is None else view_ids
    for v in present:
        sel = valid & (vid == v)
        if not sel.any():
            continue
        pano = load_pano(int(v))
        h, w = pano.shape[:2]
        rows = np.clip((row_frac[sel] * h).astype(np.int64), 0, h - 1)
        cols = np.clip((col_frac[sel] * w).astype(np.int64), 0, w - 1)
        out[sel] = pano[rows, cols, :channels].astype(dtype)
    return out


def _read_index(project_path: str) -> Tuple[str, np.ndarray]:
    import cv2

    matches = glob.glob(os.path.join(project_path, "hdr_texture", "0.png"))
    if not matches:
        raise FileNotFoundError(
            os.path.join(project_path, "hdr_texture", "0.png")
        )
    path = matches[0]
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    return path, img


def repack_hdr_texture(project_path: str) -> str:
    """hdr/<scanId>/ccm.hdr panos → atlas HDR (reference :16-61)."""
    import cv2

    index_path, index_img = _read_index(project_path)
    scan_ids = read_scan_ids(project_path)

    def load(v):
        p = os.path.join(project_path, "hdr", scan_ids[v], "ccm.hdr")
        pano = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        if pano is None:
            raise FileNotFoundError(p)
        return pano[..., :3]

    out = repack_multiview(index_img, load, dtype=np.float32)
    dst = index_path.replace(".png", "_hdr_ccm_upper.hdr")
    cv2.imwrite(dst, out)
    return dst


def repack_seg_texture(project_path: str) -> str:
    """derived/<scanId>/panoImage_gray.png → atlas seg (reference :64-110)."""
    import cv2

    index_path, index_img = _read_index(project_path)
    scan_ids = read_scan_ids(project_path)

    def load(v):
        p = os.path.join(
            project_path, "derived", scan_ids[v], "panoImage_gray.png"
        )
        pano = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        if pano is None:
            raise FileNotFoundError(p)
        if pano.ndim == 2:
            pano = np.repeat(pano[:, :, None], 3, axis=-1)
        return pano

    out = repack_multiview(index_img, load, dtype=np.uint8)
    dst = index_path.replace(".png", "_seg_gray.png")
    cv2.imwrite(dst, out)
    return dst


def repack_material_texture(
    project_path: str,
    method: str = "phyir",
    kind: str = "albedo",
    out_res: int = 2048,
) -> str:
    """methods/<method>/<scanId>/<kind>.png → re-encoded, resized, dilated
    atlas (reference :112-216)."""
    import cv2

    index_path, index_img = _read_index(project_path)
    scan_ids = read_scan_ids(project_path)

    def load(v):
        p = os.path.join(
            project_path, "methods", method, scan_ids[v], f"{kind}.png"
        )
        pano = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        if pano is None:
            raise FileNotFoundError(p)
        if pano.ndim == 2:
            pano = np.repeat(pano[:, :, None], 3, axis=-1)
        # the reference re-encodes LDR predictions: (x/255)^(1/2.2)*255
        return (
            np.power(pano[..., :3].astype(np.float64) / 255.0, 1.0 / 2.2)
            * 255.0
        )

    out = repack_multiview(index_img, load, dtype=np.uint8)
    out = cv2.resize(out, (out_res, out_res))
    out = cv2.dilate(out, np.ones((4, 4), np.uint8))
    dst = index_path.replace(".png", f"_{method}_{kind}.png")
    cv2.imwrite(dst, out)
    return dst


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="repack pano-space images into the mesh atlas"
    )
    ap.add_argument(
        "target", choices=["hdr", "seg", "albedo", "roughness"],
    )
    ap.add_argument("--project", required=True, help="scan project root")
    ap.add_argument("--method", default="phyir",
                    help="method name for albedo/roughness repack")
    args = ap.parse_args(argv)
    if args.target == "hdr":
        dst = repack_hdr_texture(args.project)
    elif args.target == "seg":
        dst = repack_seg_texture(args.project)
    else:
        dst = repack_material_texture(args.project, args.method, args.target)
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
