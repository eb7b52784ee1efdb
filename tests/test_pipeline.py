"""End-to-end pipeline: export synthetic dataset → IRRF train → IrT bake →
Mat 3-substage train, all through the stage runners and config system."""

import os

import numpy as np
import pytest

from texir_code_tpu.config import parse_string
from texir_code_tpu.data.export import export_reference_layout
from texir_code_tpu.data.synthetic import make_scene


CONF_TEMPLATE = """
train{{
    expname = test
    dataset_class = datasets.dataset.ImageCubeDerived
    model_class = models.mat_nvdiffrast.MaterialModel
    irf_loss_class = models.loss.RenderLoss
    plot_freq = 100000
    ckpt_freq = 100000
    mat_epoch = 1
    mat_learning_rate = 3e-2
    mat_sched_step = 20
    mat_sched_factor = 0.8
    irf_learning_rate = 1e-3
    irf_sched_step = 800
    irf_sched_factor = 0.8
    irf_epoch = 2
    is_hdr_texture = True
    std_jit = 5e-2
    hdr_exposure = 0.0
    pano_img_res = [32, 64]
    sample_light = [64, 4]
    env_res = [8, 16]
    val_sample_res = [8, 16]
    samples_point_mesh = 64
    batch_size = 16
    path_mesh_open3d = {mesh}
    results = {results}
}}
val{{
    dataset_class = datasets.dataset.ImageMeshPoint
    env_res = [8, 16]
    batch_size = 64
}}
irf_loss{{ loss_type = L1 }}
render_loss{{ loss_type = L1
    w_gradient = 1 }}
models{{
    render{{ sample_type = [ uniform, importance] }}
    irrf_network{{
        points_multires = 4
        dims = [64, 64]
        p_input_dim = 3
        p_out_dim = 3
    }}
}}
"""


@pytest.fixture(scope="module")
def pipeline_env(tmp_path_factory):
    scene = make_scene(atlas_res=48)
    root = str(tmp_path_factory.mktemp("pipe"))
    path_mesh = export_reference_layout(scene, root, n_views=2, pano_res=(32, 64))
    conf = parse_string(
        CONF_TEMPLATE.format(mesh=path_mesh, results=os.path.join(root, "results"))
    )
    exps = os.path.join(root, "exps")
    return scene, root, path_mesh, conf, exps


def test_irrf_runner(pipeline_env):
    from texir_code_tpu.train.irrf import IRRFTrainRunner

    scene, root, path_mesh, conf, exps = pipeline_env
    runner = IRRFTrainRunner(conf, expname="t", exps_root=exps)
    params = runner.run()
    assert params is not None
    # validation renders a finite pano
    pred, gt = runner.validate(0)
    assert np.isfinite(pred).all() and np.isfinite(gt).all()
    assert gt.max() > 0
    # checkpoint resume path
    from texir_code_tpu.train.irrf import IRRFTrainRunner as R2

    r2 = R2(conf, expname="t", exps_root=exps, is_continue=True)
    assert r2.start_epoch > 0


def test_irt_runner_and_artifacts(pipeline_env):
    from texir_code_tpu.train.irt import IrrTextureRunner

    scene, root, path_mesh, conf, exps = pipeline_env
    runner = IrrTextureRunner(
        conf, expname="t", exps_root=exps, texture_res=24, use_fan=True
    )
    tex = runner.run()
    assert np.isfinite(tex).all()
    assert tex.max() > 0
    assert os.path.exists(path_mesh.replace("out1.obj", "0_irr_texture.hdr"))
    assert os.path.exists(path_mesh.replace("out1.obj", "irt.hdr"))
    # after padding, no black seams remain
    assert (tex.sum(-1) > 0).mean() > 0.99


def test_mat_runner(pipeline_env):
    from texir_code_tpu.train.material import MatTrainRunner

    scene, root, path_mesh, conf, exps = pipeline_env
    # requires irt.hdr from the previous test; regenerate if missing
    if not os.path.exists(path_mesh.replace("out1.obj", "irt.hdr")):
        from texir_code_tpu.train.irt import IrrTextureRunner

        IrrTextureRunner(conf, expname="t", exps_root=exps, texture_res=24).run()

    runner = MatTrainRunner(
        conf, expname="t", exps_root=exps, albedo_res=32, roughness_res=32
    )
    params = runner.run()
    a = np.asarray(params.albedo)
    r = np.asarray(params.roughness)
    assert np.isfinite(a).all() and np.isfinite(r).all()
    assert (r >= 1e-2 - 1e-6).all() and (r <= 0.8 + 1e-6).all()
    assert (a >= 0).all()
    # training moved the albedo away from its 0.5 init
    assert np.abs(a - 0.5).max() > 1e-3
    # artifacts for the testers
    plots = runner.exp.plots_dir
    assert os.path.exists(os.path.join(plots, "mat_albedo_final.hdr"))
    assert os.path.exists(os.path.join(plots, "mat_roughness_final.hdr"))
    # metrics finite
    m = runner.render_calculate(2)
    assert np.isfinite(m["psnr"])


def test_pad_materials_conf_gate(pipeline_env):
    """train.pad_materials = false skips the *_padding.hdr artifacts;
    default-on writes them next to the raw atlases (CLAUDE.md convention:
    testers read the raw files either way)."""
    import copy

    from texir_code_tpu.data import hdrio
    from texir_code_tpu.train.material import MatTrainRunner

    scene, root, path_mesh, conf, exps = pipeline_env
    irt_path = path_mesh.replace("out1.obj", "irt.hdr")
    if not os.path.exists(irt_path):  # flat IrT: no bake needed here
        hdrio.write_hdr(irt_path, np.full((16, 16, 3), 0.5, np.float32),
                        flip=True)
    conf_off = copy.deepcopy(conf)
    conf_off.put("train.pad_materials", False)
    runner = MatTrainRunner(
        conf_off, expname="padoff", exps_root=exps, albedo_res=16,
        roughness_res=16,
    )
    assert runner.pad_materials is False
    runner.save_materials("t")
    plots = runner.exp.plots_dir
    assert os.path.exists(os.path.join(plots, "mat_albedo_t.hdr"))
    assert not os.path.exists(os.path.join(plots, "mat_albedo_t_padding.hdr"))


def test_mat_plot_to_disk(pipeline_env):
    """Periodic training plots write stacked pred/gt pano grids."""
    import glob

    from texir_code_tpu.train.material import MatTrainRunner

    scene, root, path_mesh, conf, exps = pipeline_env
    runner = MatTrainRunner(
        conf, expname="plots", exps_root=exps, albedo_res=16, roughness_res=16
    )
    runner.build_masks()
    runner.plot_to_disk(0, "t0")
    files = glob.glob(os.path.join(runner.exp.plots_dir, "*_t0.hdr"))
    assert len(files) == 2  # one per view
    from texir_code_tpu.data import hdrio

    img = hdrio.read_hdr(files[0])
    assert img.shape[0] == 2 * 32  # stacked pred over gt at pano height 32


def test_mat_train_indices_exclude_novel_views():
    """The Mat trainer must not train on views held out in info/novel.txt
    (they feed evaluate_novel_views — training on them taints the metric)."""
    from texir_code_tpu.train.material import MatTrainRunner

    class SynDS:
        ids = ["view000", "view001", "view002"]
        train_ids = ["view000", "view002"]

        def __len__(self):
            return 3

    class Stub:
        dataset = SynDS()

    assert MatTrainRunner._train_indices(Stub()) == [0, 2]

    class PlainDS:
        def __len__(self):
            return 2

    class Stub2:
        dataset = PlainDS()

    assert MatTrainRunner._train_indices(Stub2()) == [0, 1]


def test_mat_fused_epoch_matches_per_step(pipeline_env):
    """The scanned whole-epoch dispatch must reproduce the per-view step
    loop exactly: same fold_in key sequence, same view order, same
    optimizer state evolution."""
    import jax
    import jax.numpy as jnp
    import optax

    from texir_code_tpu.train.material import MatTrainRunner

    scene, root, path_mesh, conf, exps = pipeline_env
    runner = MatTrainRunner(
        conf, expname="fused", exps_root=exps, albedo_res=16, roughness_res=16
    )
    runner.build_masks()
    # copy before the fused run: the epoch dispatch donates the params
    init = jax.tree.map(jnp.array, runner.params)

    runner._substage(0, 1, 0)
    fused = runner.params

    # per-step oracle with the identical key/optimizer sequence
    indices = runner._train_indices()
    schedule = optax.exponential_decay(
        runner.lr, transition_steps=runner.sched_step * len(indices),
        decay_rate=runner.sched_factor, staircase=True,
    )
    opt = optax.adam(schedule)
    opt_state = opt.init(init)
    step = jax.jit(runner._make_step(0, opt), static_argnames=("n_rooms",))
    p = init
    for t, i in enumerate(indices):
        item = runner.dataset[i]
        m = runner.masks[item["id"]]
        p, opt_state, loss, seg_term = step(
            p, opt_state,
            jnp.asarray(item["cam_to_world"]),
            jnp.asarray(item["cam_position"]),
            jnp.asarray(item["color"]),
            jnp.asarray(item["mask"]),
            jnp.asarray(m["seg_id"]),
            jnp.asarray(m["highlight"]),
            jnp.asarray(m["seg_region"]),
            jnp.asarray(m["room_id"]),
            m["n_rooms"],
            jax.random.fold_in(runner.key, t),
        )

    assert np.abs(np.asarray(fused.albedo) - np.asarray(init.albedo)).max() > 0
    np.testing.assert_allclose(
        np.asarray(fused.albedo), np.asarray(p.albedo), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused.roughness), np.asarray(p.roughness), atol=1e-5, rtol=1e-5
    )


def test_mat_view_cache_budget_fallback(pipeline_env):
    """Above the view-cache HBM budget the runner recomputes G-buffers
    in-step (ADVICE r2: the stacked per-view cache is unbounded otherwise);
    training still works."""
    from texir_code_tpu.train.material import MatTrainRunner

    scene, root, path_mesh, conf, exps = pipeline_env
    runner = MatTrainRunner(
        conf, expname="nocache", exps_root=exps, albedo_res=16,
        roughness_res=16,
    )
    runner.view_cache_budget = 0
    runner.build_masks()
    xs, n_rooms, ids = runner._stack_epoch_data(runner._train_indices())
    assert xs[-1] is None  # cache disabled
    runner._substage(0, 1, 0)
    a = np.asarray(runner.params.albedo)
    assert np.isfinite(a).all() and np.abs(a - 0.5).max() > 1e-3
