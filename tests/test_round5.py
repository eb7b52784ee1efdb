"""Round-5 features: roomseg export/lookup, seg-prior weight scale,
point-field SPMD trace invariance, head LR schedules, CLI conf overrides,
index-padding guard."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texir_code_tpu.data.export import export_reference_layout
from texir_code_tpu.data.synthetic import (
    make_apartment_scene,
    make_building_scene,
    make_scene,
)


# ---------------------------------------------------------------------------
# roomseg export + lookup (reference utils/general.py:115-125,
# trainer/train_material.py:274-282)
# ---------------------------------------------------------------------------


def test_apartment_roomseg_split():
    from texir_code_tpu.train.material import room_ids_at

    scene = make_apartment_scene(atlas_res=32, subdiv=2)
    assert scene.roomseg is not None
    sx, sy, sz = scene.size
    pts = np.array([
        [0.2 * sx, 1.0, 0.5 * sz],   # left of the divider (x = 0.55 sx)
        [0.9 * sx, 1.0, 0.5 * sz],   # right of it
    ], np.float32)
    ids = room_ids_at(scene.roomseg, pts)
    assert ids[0] != ids[1]
    assert (ids >= 1).all()


def test_building_roomseg_grid_and_export(tmp_path):
    from texir_code_tpu.train.material import parse_roomseg, room_ids_at

    rooms = (2, 2)
    scene = make_building_scene(atlas_res=32, rooms=rooms, subdiv=2,
                                clutter_per_room=0)
    path_mesh = export_reference_layout(
        scene, str(tmp_path), n_views=1, pano_res=(16, 32)
    )
    rdir = os.path.join(str(tmp_path), "roomseg")
    assert os.path.exists(os.path.join(rdir, "originOccupancyGrid_f0.meta"))
    assert os.path.exists(os.path.join(rdir, "roomSegs_uchar_f0.png"))

    # the runner-side parser reads back what the exporter wrote
    rs = parse_roomseg(rdir)
    assert rs is not None
    # room centers map to 4 distinct ids >= 1
    centers = np.array(
        [[(i + 0.5) * 5.0, 1.5, (j + 0.5) * 5.0]
         for j in range(rooms[1]) for i in range(rooms[0])], np.float32
    )
    ids = room_ids_at(rs, centers)
    assert len(set(ids.tolist())) == rooms[0] * rooms[1]
    assert (ids >= 1).all()
    # and matches the in-memory roomseg
    np.testing.assert_array_equal(ids, room_ids_at(scene.roomseg, centers))


def test_mat_runner_picks_up_roomseg(tmp_path):
    """MatTrainRunner on an exported multi-room dataset reports n_rooms > 1
    (the mode-2 per-(room x class) prior is actually fed rooms)."""
    from texir_code_tpu.config import parse_string
    from texir_code_tpu.train.material import MatTrainRunner

    scene = make_building_scene(atlas_res=32, rooms=(2, 1), subdiv=2,
                                clutter_per_room=0)
    root = str(tmp_path)
    path_mesh = export_reference_layout(scene, root, n_views=2,
                                        pano_res=(16, 32))
    # a tiny irt so the model constructs
    from texir_code_tpu.data import hdrio

    hdrio.write_hdr(
        path_mesh.replace("out1.obj", "irt.hdr"),
        np.full((16, 16, 3), 0.5, np.float32), flip=True,
    )
    conf = parse_string(f"""
    train{{
        path_mesh_open3d = {path_mesh}
        pano_img_res = [16, 32]
        sample_light = [8, 4]
        mat_epoch = 1
        plot_freq = 0
        spmd = false
    }}
    render_loss{{ loss_type = L1 }}
    """)
    runner = MatTrainRunner(
        conf, expname="rs", exps_root=os.path.join(root, "exps"),
        albedo_res=16, roughness_res=16,
    )
    assert runner.roomseg is not None
    runner.build_masks()
    n_rooms = max(m["n_rooms"] for m in runner.masks.values())
    assert n_rooms > 2  # ids 1..2 -> n_rooms = max_id + 1 = 3
    # distinct room ids actually appear across pixels
    all_ids = np.concatenate(
        [m["room_id"].reshape(-1) for m in runner.masks.values()]
    )
    assert len(set(all_ids.tolist()) - {0}) >= 2
    # one sharded-free training step through mode 2 stays finite
    runner._substage(2, 1, 0)
    assert np.isfinite(np.asarray(runner.params.roughness)).all()


# ---------------------------------------------------------------------------
# seg_weight_scale (models/losses.py::render_loss diagnostic knob)
# ---------------------------------------------------------------------------


def test_render_loss_seg_weight_scale():
    from texir_code_tpu.models.losses import render_loss

    f, h, w = 1, 8, 8
    key = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(key, (f, h, w, 3))
    preds = {
        "rgb": rgb,
        "albedo": rgb,
        "roughness": jax.random.uniform(jax.random.PRNGKey(1), (f, h, w, 1)),
        "roughness_womipmap": jax.random.uniform(jax.random.PRNGKey(2), (f, h, w, 1)),
        "empty_mask": jnp.ones((f, h, w, 1)),
    }
    gt = rgb * 0.9
    seg = jnp.zeros((f, h, w), jnp.int32).at[:, :, 4:].set(1)
    ones = jnp.ones((f, h, w, 1))
    hl = jnp.zeros((f, h, w, 1)).at[:, :4].set(1.0)

    for stage in (1, 2):
        t1, s1 = render_loss(gt, preds, ones, seg, 3, stage,
                             highlight=hl, seg_region=ones)
        t0, s0 = render_loss(gt, preds, ones, seg, 3, stage,
                             highlight=hl, seg_region=ones,
                             seg_weight_scale=0.0)
        t3, s3 = render_loss(gt, preds, ones, seg, 3, stage,
                             highlight=hl, seg_region=ones,
                             seg_weight_scale=0.3)
        assert float(s0) == 0.0
        assert np.isclose(float(t1) - float(s1), float(t0), rtol=1e-6)
        assert np.isclose(float(s3), 0.3 * float(s1), rtol=1e-5)

    # stage 0 (albedo prior) is NOT scaled — the knob targets the
    # roughness prior only
    t_a, s_a = render_loss(gt, preds, ones, seg, 3, 0)
    t_b, s_b = render_loss(gt, preds, ones, seg, 3, 0, seg_weight_scale=0.0)
    assert np.isclose(float(s_a), float(s_b))


# ---------------------------------------------------------------------------
# point-field SPMD: sharded trace == unsharded (per-global-row keys)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_tbl():
    from texir_code_tpu.models.tbl import build_tbl

    scene = make_scene(atlas_res=24)
    return build_tbl(scene.mesh, scene.hdr_texture)


def test_irrf_trace_sharded_matches_single(small_tbl):
    from texir_code_tpu.models.tracer_irrf import TracerIRRF
    from texir_code_tpu.parallel.mesh import make_device_mesh

    mesh = make_device_mesh(8)
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.random((16, 3)).astype(np.float32) * 0.5 + 0.2)
    nrm = jnp.asarray(np.tile([[0, 1.0, 0]], (16, 1)).astype(np.float32))
    ref = TracerIRRF(small_tbl).trace_gt(pts, nrm, (4, 8), key)
    got = TracerIRRF(small_tbl, spmd_mesh=mesh).trace_gt(pts, nrm, (4, 8), key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
    # non-divisible batch falls back gracefully
    got13 = TracerIRRF(small_tbl, spmd_mesh=mesh).trace_gt(
        pts[:13], nrm[:13], (4, 8), key
    )
    np.testing.assert_allclose(
        np.asarray(got13), np.asarray(ref)[:13], rtol=1e-6
    )


def test_pil_trace_sharded_matches_single(small_tbl):
    from texir_code_tpu.models.tracer_pil import TracerPIL
    from texir_code_tpu.parallel.mesh import make_device_mesh

    mesh = make_device_mesh(8)
    key = jax.random.PRNGKey(4)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.random((8, 3)).astype(np.float32) * 0.5 + 0.2)
    nrm = jnp.asarray(np.tile([[0, 1.0, 0]], (8, 1)).astype(np.float32))
    r_ref = TracerPIL(small_tbl).trace_gt(pts, nrm, 16, key)
    r_got = TracerPIL(small_tbl, spmd_mesh=mesh).trace_gt(pts, nrm, 16, key)
    for a, b in zip(r_ref, r_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6)
    # fixed-roughness validation path shards too
    rough = jnp.full((8, 1), 0.4)
    v_ref = TracerPIL(small_tbl).trace_gt(pts, nrm, 16, key, rough)
    v_got = TracerPIL(small_tbl, spmd_mesh=mesh).trace_gt(pts, nrm, 16, key, rough)
    np.testing.assert_allclose(
        np.asarray(v_got[2]), np.asarray(v_ref[2]), rtol=1e-6
    )


def test_irf_trace_sharded_matches_single(small_tbl):
    from texir_code_tpu.models.tracer_irf import TracerIRF
    from texir_code_tpu.parallel.mesh import make_device_mesh

    mesh = make_device_mesh(8)
    key = jax.random.PRNGKey(5)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.random((8, 3)).astype(np.float32) * 0.5 + 0.2)
    nrm = jnp.asarray(np.tile([[0, 1.0, 0]], (8, 1)).astype(np.float32))
    d_ref, g_ref = TracerIRF(small_tbl).trace_gt(pts, nrm, (4, 8), key)
    d_got, g_got = TracerIRF(small_tbl, spmd_mesh=mesh).trace_gt(
        pts, nrm, (4, 8), key
    )
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-6)


# ---------------------------------------------------------------------------
# head LR schedules (StepLR scalar vs MultiStepLR list)
# ---------------------------------------------------------------------------


def test_head_lr_schedule_multistep():
    from texir_code_tpu.train.heads import make_lr_schedule

    spe = 4
    sched = make_lr_schedule(1.0, [2, 2, 5], 0.5, spe)
    # before first milestone
    assert float(sched(0)) == 1.0
    assert float(sched(2 * spe - 1)) == 1.0
    # duplicate milestone at epoch 2 compounds: 0.5^2
    assert np.isclose(float(sched(2 * spe)), 0.25)
    # after epoch 5: one more factor
    assert np.isclose(float(sched(5 * spe)), 0.125)

    step = make_lr_schedule(1.0, 2, 0.5, spe)  # scalar -> StepLR
    assert np.isclose(float(step(2 * spe)), 0.5)
    assert np.isclose(float(step(4 * spe)), 0.25)


# ---------------------------------------------------------------------------
# CLI --set conf override
# ---------------------------------------------------------------------------


def test_cli_set_override(tmp_path):
    from texir_code_tpu import cli

    conf_path = tmp_path / "t.conf"
    conf_path.write_text("train{\n  x = 1\n  sample_light = [32, 16]\n}\n")
    seen = {}

    def probe(conf, args):
        seen["x"] = conf.get_int("train.x")
        seen["sl"] = conf.get_list("train.sample_light")
        seen["new"] = conf.get_string("render_loss.loss_type")

    cli.TRAIN_STAGES["_Probe"] = probe
    try:
        cli.main([
            "train", "--conf", str(conf_path), "--trainstage", "_Probe",
            "--set", "train.x=7",
            "--set", "train.sample_light=[32, 64]",
            "--set", "render_loss.loss_type=L2",
        ])
    finally:
        del cli.TRAIN_STAGES["_Probe"]
    assert seen == {"x": 7, "sl": [32, 64], "new": "L2"}


# ---------------------------------------------------------------------------
# index-padding guard (ADVICE r4)
# ---------------------------------------------------------------------------


def test_pad_index_texture_empty_raises():
    from texir_code_tpu.tools.padding_texture import pad_index_texture

    with pytest.raises(ValueError, match="no non-zero"):
        pad_index_texture(np.zeros((8, 8, 3), np.uint16))
