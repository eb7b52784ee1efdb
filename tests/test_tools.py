"""Offline tools tests."""

import os

import numpy as np
import pytest

from texir_code_tpu.data import hdrio


def test_padding_tool(tmp_path, rng):
    from texir_code_tpu.tools.padding_texture import main

    tex = np.zeros((16, 16, 3), np.float32)
    tex[4:12, 4:12] = rng.random((8, 8, 3)) + 0.5
    p_in = str(tmp_path / "in.hdr")
    p_out = str(tmp_path / "out.hdr")
    hdrio.write_hdr(p_in, tex)
    assert main([p_in, p_out, "--no-denoise"]) == 0
    out = hdrio.read_hdr(p_out)
    assert (out.sum(-1) > 0).all()  # seams filled


def test_padding_tool_index_mode(tmp_path, rng):
    """--index: uint16 fixed-point index textures pad bit-exact (reference
    padding_index_texture, tools/padding_texture.py:8-47) — mapped texels
    untouched, zero texels take the nearest mapped texel's packed value."""
    cv2 = pytest.importorskip("cv2")
    from texir_code_tpu.tools.padding_texture import main

    idx = np.zeros((16, 16, 3), np.uint16)
    idx[4:12, 4:12] = rng.integers(1, 50000, (8, 8, 3), dtype=np.uint16)
    p_in = str(tmp_path / "in.png")
    p_out = str(tmp_path / "out.png")
    cv2.imwrite(p_in, idx)
    assert main([p_in, p_out, "--index"]) == 0
    out = cv2.imread(p_out, -1)
    assert out.dtype == np.uint16
    assert np.array_equal(out[4:12, 4:12], idx[4:12, 4:12])  # bit-exact
    assert (out.reshape(16, 16, -1).sum(-1) > 0).all()  # gutter filled
    # the fill comes from mapped texels (boundary texel takes its neighbor)
    assert np.array_equal(out[3, 4], idx[4, 4])


def test_trans_hdr_tex_multiview(rng):
    """Each texel pulls from the pano of the view id in channel 2
    (reference tools/trans_hdr_tex.py:27-54), at its own resolution."""
    from texir_code_tpu.tools.trans_hdr_tex import (
        PACK_SCALE,
        decode_index_texture,
        repack_multiview,
    )

    panos = {
        0: rng.random((8, 16, 3)).astype(np.float32),
        1: rng.random((12, 24, 3)).astype(np.float32),  # different res
    }

    idx = np.zeros((4, 4, 3), np.uint16)
    # texel (0,0): view 0, pano row 3/8, col 4/16
    idx[0, 0] = [int(3 / 8 * PACK_SCALE), int(4 / 16 * PACK_SCALE), 0]
    # texel (1, 2): view 1, pano row 7/12, col 20/24
    idx[1, 2] = [int(7 / 12 * PACK_SCALE + 1), int(20 / 24 * PACK_SCALE + 1), 1]
    # texel (3, 3): seam (all-zero) stays black

    rf, cf, vid, valid = decode_index_texture(idx)
    assert vid[1, 2] == 1 and valid[0, 0] and not valid[3, 3]

    out = repack_multiview(idx, lambda v: panos[v])
    np.testing.assert_allclose(out[0, 0], panos[0][3, 4], atol=1e-6)
    np.testing.assert_allclose(out[1, 2], panos[1][7, 20], atol=1e-6)
    np.testing.assert_allclose(out[3, 3], 0)


def test_trans_hdr_tex_project_layout(tmp_path, rng):
    """End-to-end over the on-disk scan layout: hdr + seg + material."""
    import cv2

    from texir_code_tpu.tools.trans_hdr_tex import (
        PACK_SCALE,
        main,
        repack_hdr_texture,
        repack_seg_texture,
    )

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "info"))
    os.makedirs(os.path.join(root, "hdr_texture"))
    with open(os.path.join(root, "info", "aligned.txt"), "w") as f:
        f.write("scanA\nscanB\n")
    for i, vid in enumerate(("scanA", "scanB")):
        os.makedirs(os.path.join(root, "hdr", vid))
        os.makedirs(os.path.join(root, "derived", vid))
        os.makedirs(os.path.join(root, "methods", "m", vid))
        pano = np.full((8, 16, 3), float(i + 1), np.float32)
        cv2.imwrite(os.path.join(root, "hdr", vid, "ccm.hdr"), pano)
        cv2.imwrite(
            os.path.join(root, "derived", vid, "panoImage_gray.png"),
            np.full((8, 16), (i + 1) * 10, np.uint8),
        )
        cv2.imwrite(
            os.path.join(root, "methods", "m", vid, "albedo.png"),
            np.full((8, 16, 3), (i + 1) * 100, np.uint8),
        )

    idx = np.zeros((4, 4, 3), np.uint16)
    idx[0, 0] = [int(0.5 * PACK_SCALE), int(0.5 * PACK_SCALE), 0]
    idx[1, 1] = [int(0.5 * PACK_SCALE), int(0.5 * PACK_SCALE), 1]
    cv2.imwrite(os.path.join(root, "hdr_texture", "0.png"), idx)

    dst = repack_hdr_texture(root)
    out = cv2.imread(dst, cv2.IMREAD_UNCHANGED)
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[1, 1], 2.0, atol=1e-5)
    np.testing.assert_allclose(out[2, 2], 0.0)

    dst = repack_seg_texture(root)
    out = cv2.imread(dst, cv2.IMREAD_UNCHANGED)
    assert out[0, 0, 0] == 10 and out[1, 1, 0] == 20

    assert main(["albedo", "--project", root, "--method", "m"]) == 0
    out = cv2.imread(
        os.path.join(root, "hdr_texture", "0_m_albedo.png"),
        cv2.IMREAD_UNCHANGED,
    )
    assert out.shape == (2048, 2048, 3)
    # (100/255)^(1/2.2)*255 ≈ 167
    assert abs(int(out[0, 0, 0]) - 167) <= 2


def test_hdr2ldr_tool(tmp_path, rng):
    from texir_code_tpu.tools.hdr2ldr import main

    img = rng.random((8, 8, 3)).astype(np.float32) * 3
    p = str(tmp_path / "frame.hdr")
    hdrio.write_hdr(p, img)
    assert main([p, "--out-dir", str(tmp_path)]) == 0
    out = hdrio.read_image(str(tmp_path / "frame.png"))
    assert out.shape == (8, 8, 3)
    assert out.max() <= 1.0


def test_relighting_varying_sequence():
    from texir_code_tpu.data.synthetic import make_scene
    from texir_code_tpu.tools.relighting_varying import render_sequence

    scene = make_scene(atlas_res=32)
    frames = render_sequence(
        scene.mesh, scene.gt_albedo, scene.gt_roughness,
        [2.0, 1.5, 2.5], num_frames=2, pano_res=(8, 16), spp=1,
        denoise=False,
    )
    assert len(frames) == 2
    for f in frames:
        assert np.isfinite(f).all()
    # color mode shifts the light toward red over time
    assert frames[1][..., 0].sum() >= frames[1][..., 2].sum()
