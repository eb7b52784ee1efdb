"""Repack pano-indexed textures into mesh-atlas textures.

Reference tools/trans_hdr_tex.py: the scan pipeline's "index texture" `0.png`
stores, per atlas texel, a packed pano (row, col) pair in fixed-point
(value/50000 → row*W+col style; reference :50-54 decodes `÷50000`).  This
tool resolves that indirection: given the index texture and any pano-space
image (HDR radiance, seg labels, GT materials), it produces the
corresponding mesh-atlas texture — `0_hdr_ccm_upper.hdr`, `0_seg_gray.png`,
or per-method material atlases.

    python -m texir_code_tpu.tools.trans_hdr_tex index.png pano.hdr out.hdr \
        [--pano-height H] [--nearest]
"""

from __future__ import annotations

import argparse

import numpy as np

PACK_SCALE = 50000.0  # the reference's fixed-point packing divisor


def decode_index_texture(index_img: np.ndarray, pano_w: int) -> tuple:
    """Packed index texture → (rows, cols, valid) arrays.

    Each texel's two leading channels carry row/col scaled by PACK_SCALE
    (fractions of the packing range); zero texels are unmapped seams."""
    idx = np.asarray(index_img, np.float64)
    if idx.ndim == 3:
        packed = idx[..., 0] * PACK_SCALE
    else:
        packed = idx * PACK_SCALE
    rows = (packed // pano_w).astype(np.int64)
    cols = (packed % pano_w).astype(np.int64)
    valid = packed > 0
    return rows, cols, valid


def repack(
    index_img: np.ndarray, pano: np.ndarray, nearest: bool = True
) -> np.ndarray:
    h, w = pano.shape[:2]
    rows, cols, valid = decode_index_texture(index_img, w)
    rows = np.clip(rows, 0, h - 1)
    cols = np.clip(cols, 0, w - 1)
    out = pano[rows, cols].astype(np.float32)
    out[~valid] = 0
    return out


def main(argv=None):
    from texir_code_tpu.data import hdrio

    ap = argparse.ArgumentParser()
    ap.add_argument("index")
    ap.add_argument("pano")
    ap.add_argument("output")
    args = ap.parse_args(argv)
    index_img = hdrio.read_gray(args.index)
    pano = hdrio.read_hdr(args.pano)
    out = repack(index_img, pano)
    hdrio.write_hdr(args.output, out)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
