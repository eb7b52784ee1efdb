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


def test_trans_hdr_tex_repack(rng):
    from texir_code_tpu.tools.trans_hdr_tex import PACK_SCALE, repack

    pano = rng.random((8, 16, 3)).astype(np.float32)
    # build an index texture mapping texel (i, j) to pano (i % 8, j % 16)
    idx = np.zeros((4, 4), np.float32)
    for i in range(4):
        for j in range(4):
            idx[i, j] = ((i + 1) * 16 + j + 1) / PACK_SCALE
    out = repack(idx, pano)
    np.testing.assert_allclose(out[2, 3], pano[3, 4], atol=2e-2)
    # zero index → unmapped → zero output
    idx[0, 0] = 0
    out = repack(idx, pano)
    np.testing.assert_allclose(out[0, 0], 0)


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
