"""IRF / PIL tracers, split-sum LUT, MLP material model, and their runners."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texir_code_tpu.data.synthetic import make_scene
from texir_code_tpu.models.tbl import build_tbl
from texir_code_tpu.models.tracer_irf import TracerIRF
from texir_code_tpu.models.tracer_pil import TracerPIL, split_sum_lut
from texir_code_tpu.models.fields import IRNetwork, PILNetwork

from tests.test_gbuffer import make_box_mesh


@pytest.fixture(scope="module")
def furnace_tbl():
    mesh = make_box_mesh()
    return build_tbl(mesh, np.full((8, 8, 3), 2.0, np.float32))


def test_tracer_irf(furnace_tbl):
    tracer = TracerIRF(furnace_tbl, IRNetwork(dims=(32, 32)))
    key = jax.random.PRNGKey(0)
    params = tracer.init_params(key)
    pts = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    nrm = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    out = tracer.forward(params, pts, nrm, (4, 8), key)
    assert out["gt"].shape == (1, 32, 3)
    assert out["pred"].shape == (1, 32, 3)
    # inside a furnace every direction carries the constant radiance
    np.testing.assert_allclose(np.asarray(out["gt"]), 2.0, atol=1e-4)


def test_tracer_pil(furnace_tbl):
    tracer = TracerPIL(furnace_tbl, PILNetwork(dims=(32, 32)))
    key = jax.random.PRNGKey(1)
    params = tracer.init_params(key)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [0.4, 0.6, 0.3]], jnp.float32)
    nrm = jnp.asarray([[0, 0, 1.0], [0, 1.0, 0]], jnp.float32)
    out = tracer.forward(params, pts, nrm, (8, 16), key)
    assert out["gt"].shape == (2, 3)
    assert out["pred"].shape == (2, 3)
    assert np.isfinite(np.asarray(out["gt"])).all()
    assert (np.asarray(out["roughness"]) >= 0).all()


def test_split_sum_lut():
    lut = split_sum_lut(res=16, num_samples=128)
    assert lut.shape == (16, 16, 2)
    assert np.isfinite(lut).all()
    # scale + bias bounded by 1 (energy conservation of the env BRDF)
    assert (lut.sum(-1) <= 1.3).all()
    assert (lut >= -1e-3).all()
    # smooth surfaces at normal incidence: scale near 1, bias near 0
    assert lut[0, -1, 0] > 0.8


def test_irf_pil_runners(tmp_path):
    from texir_code_tpu.config import parse_string
    from texir_code_tpu.data.export import export_reference_layout
    from texir_code_tpu.train.irf_pil import IRFTrainRunner, PILTrainRunner
    from tests.test_pipeline import CONF_TEMPLATE
    import os

    scene = make_scene(atlas_res=32)
    root = str(tmp_path)
    path_mesh = export_reference_layout(scene, root, n_views=1, pano_res=(16, 32))
    conf = parse_string(
        CONF_TEMPLATE.format(mesh=path_mesh, results=os.path.join(root, "r"))
    )
    exps = os.path.join(root, "exps")
    p1 = IRFTrainRunner(conf, expname="i", exps_root=exps, max_epochs=1).run()
    assert p1 is not None
    p2 = PILTrainRunner(conf, expname="p", exps_root=exps, max_epochs=1).run()
    assert p2 is not None


def test_material_mlp(furnace_tbl):
    from texir_code_tpu.models.fields import MatNetwork
    from texir_code_tpu.models.material_mlp import MaterialMLP

    mesh = make_box_mesh()
    model = MaterialMLP(
        mesh, np.full((8, 8, 3), 2.0, np.float32), pano_res=(8, 16),
        sample_light=(8, 4), network=MatNetwork(dims=(32, 32), p_out_dim=4),
    )
    key = jax.random.PRNGKey(2)
    params = model.init_params(key)
    out = model.forward(params, jnp.asarray([0.5, 0.5, 0.5]), key)
    assert out["rgb"].shape == (8, 16, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # gradient flows to the network
    g = jax.grad(
        lambda p: jnp.mean(model._forward(p, jnp.asarray([0.5, 0.5, 0.5]), key)["rgb"])
    )(params)
    total = jax.tree_util.tree_reduce(lambda a, b: a + jnp.abs(b).sum(), g, 0.0)
    assert float(total) > 0
