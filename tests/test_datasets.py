"""Dataset layer tests over an exported synthetic scene in the reference's
on-disk layout."""

import os

import numpy as np
import pytest

from texir_code_tpu.data import hdrio
from texir_code_tpu.data.datasets import (
    ImageCubeDerived,
    ImageCubeNovel,
    ImageCubeSyn,
    ImageDerived,
    ImageMeshPoint,
    MeshPoint,
    read_extrinsics,
    read_ids,
)
from texir_code_tpu.data.export import export_reference_layout, render_pano
from texir_code_tpu.data.synthetic import make_scene


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    scene = make_scene(atlas_res=48)
    out = str(tmp_path_factory.mktemp("fake_scan"))
    path_mesh = export_reference_layout(scene, out, n_views=3, pano_res=(64, 128))
    return scene, out, path_mesh


def test_layout_files_exist(dataset_dir):
    _, root, path_mesh = dataset_dir
    assert os.path.exists(path_mesh)
    assert os.path.exists(path_mesh.replace("out1.obj", "hdr_texture.hdr"))
    ids = read_ids(root)
    assert len(ids) == 3
    ext = read_extrinsics(root)
    assert ext.shape == (3, 4, 4)
    for vid in ids:
        assert os.path.exists(os.path.join(root, "hdr", vid, "ccm.hdr"))
        assert os.path.exists(os.path.join(root, "derived", vid, "panoImage_orig.jpg"))
        assert os.path.exists(os.path.join(root, "derived", vid, "panoImage_gray.png"))


def test_hdrio_roundtrip(tmp_path, rng):
    img = rng.random((16, 24, 3)).astype(np.float32) * 4
    p = str(tmp_path / "t.hdr")
    hdrio.write_hdr(p, img)
    back = hdrio.read_hdr(p)
    # Radiance HDR shares one exponent across RGB: error is bounded relative
    # to the PIXEL max, not per channel
    pixmax = img.max(axis=-1, keepdims=True)
    assert (np.abs(back - img) <= 0.02 * pixmax + 1e-3).all()
    hdrio.write_hdr(p, img, flip=True)
    back2 = hdrio.read_hdr(p, flip=True)
    assert (np.abs(back2 - img) <= 0.02 * pixmax + 1e-3).all()


def test_mesh_point_dataset(dataset_dir):
    _, _, path_mesh = dataset_dir
    ds = MeshPoint(path_mesh, num_sample=128)
    assert len(ds) == 128
    p0 = ds.points.copy()
    ds.change_points()
    assert np.abs(ds.points - p0).max() > 0  # resampled
    batches = list(ds.batches(50))
    assert len(batches) == 3
    assert batches[0]["points"].shape == (50, 3)


def test_image_derived(dataset_dir):
    scene, _, path_mesh = dataset_dir
    ds = ImageDerived(path_mesh, hdr_exposure=0.0)
    assert len(ds) == 3
    item = ds[0]
    assert item["color"].shape == (64, 128, 3)
    assert item["mask"].shape == (64, 128, 1)
    assert item["cam_position"].shape == (3,)
    assert np.isfinite(item["color"]).all()


def test_image_cube_derived(dataset_dir):
    scene, _, path_mesh = dataset_dir
    ds = ImageCubeDerived(path_mesh, resolution=(64, 128), hdr_exposure=0.0)
    item = ds[0]
    r = 32  # 128 // 4
    assert item["color"].shape == (6, r, r, 3)
    assert item["mask"].shape == (6, r, r, 1)
    assert item["segs"].shape == (6, r, r, 1)
    assert item["rgb_grad"].shape == (6, r, r, 1)
    assert item["cam_to_world"].shape == (6, 4, 4)
    # seg ids must be within the wall-class range
    assert 0 <= item["segs"].min() and item["segs"].max() <= 5


def test_cube_faces_match_renderer(dataset_dir):
    """The dataset's warped cube faces must match a direct cube-face render
    from the same camera — the consistency the Mat stage depends on."""
    import jax.numpy as jnp

    from texir_code_tpu.models.material import MaterialModel, init_material_params
    from texir_code_tpu.ops.gbuffer import cube_mvp

    scene, _, path_mesh = dataset_dir
    ds = ImageCubeDerived(path_mesh, resolution=(64, 128), hdr_exposure=0.0)
    item = ds[0]
    irt = np.full((16, 16, 3), 1.0, np.float32)
    model = MaterialModel(
        scene.mesh, scene.hdr_texture, irt, pano_res=(64, 128), sample_light=(8, 4)
    )
    # VHL-free comparison: gt color is the TBL radiance photograph; rendering
    # the TBL directly along primary rays gives the same image
    from texir_code_tpu.models.tbl import query_tbl
    from texir_code_tpu.ops.gbuffer import ray_dirs_from_mvp

    cam = jnp.asarray(item["cam_position"])
    dirs = ray_dirs_from_mvp(jnp.asarray(item["cam_to_world"]), cam, 32)
    o = jnp.broadcast_to(cam, (6 * 32 * 32, 3))
    rad = np.asarray(
        query_tbl(model.tbl, o, jnp.asarray(np.asarray(dirs).reshape(-1, 3)),
                  t_valid=1e-5)
    ).reshape(6, 32, 32, 3)
    gt = item["color"]
    # compare where both defined; pano warp + jpeg-free HDR path should agree
    # to a few percent away from seams
    err = np.abs(rad - gt) / (gt + 0.05)
    assert np.median(err) < 0.08


def test_image_cube_novel(dataset_dir):
    _, _, path_mesh = dataset_dir
    ds = ImageCubeNovel(path_mesh, resolution=(64, 128), start_index=1, num=10)
    assert len(ds) == 10
    item = ds[3]
    assert item["cam_to_world"].shape == (6, 4, 4)
    # dolly moves +x by default
    p0 = ds[0]["cam_position"]
    p9 = ds[9]["cam_position"]
    assert p9[0] > p0[0]


def test_image_cube_syn(dataset_dir):
    _, _, path_mesh = dataset_dir
    ds = ImageCubeSyn(path_mesh, resolution=(64, 128), hdr_exposure=0.0)
    assert ds.gt_albedo is not None and ds.gt_roughness is not None
    assert ds.gt_albedo.shape[-1] == 3
    assert ds.gt_roughness.shape[-1] == 1
    # sRGB roundtrip: linear GT ≈ scene GT
    scene = dataset_dir[0]
    np.testing.assert_allclose(ds.gt_albedo, scene.gt_albedo, atol=0.05)


def test_image_mesh_point(dataset_dir):
    _, _, path_mesh = dataset_dir
    ds = ImageMeshPoint(path_mesh, env_res=(16, 32), view_index=0)
    assert ds.points.shape == (16 * 32, 3)
    assert ds.mask.all()  # closed room: every pano pixel hits
    b = next(ds.batches(64))
    assert b["points"].shape == (64, 3)


def test_material_gt_export(tmp_path):
    """gt_render='material' photos carry view-dependent specular signal
    (the roughness-recovery prerequisite — PERF.md round 3): diffuse
    matches IrT*albedo/pi analytically where roughness is high, and the
    specular term differs between cameras."""
    from texir_code_tpu.data.export import render_pano_material
    from texir_code_tpu.data.synthetic import make_apartment_scene
    from texir_code_tpu.models.tbl import build_tbl

    scene = make_apartment_scene(atlas_res=48, subdiv=2, clutter=0)
    tbl = build_tbl(scene.mesh, scene.hdr_texture)
    irt = np.full_like(scene.hdr_texture, 0.4)
    cams = scene.camera_positions(2)
    img0 = render_pano_material(
        scene.mesh, tbl, irt, scene.gt_albedo, scene.gt_roughness,
        cams[0], (32, 64), spp=16, chunk=1024,
    )
    assert np.isfinite(img0).all() and img0.min() >= 0
    # specular-only render is view-dependent
    s0 = render_pano_material(
        scene.mesh, tbl, irt, scene.gt_albedo * 0, scene.gt_roughness,
        cams[0], (32, 64), spp=16, chunk=1024,
    )
    s1 = render_pano_material(
        scene.mesh, tbl, irt, scene.gt_albedo * 0, scene.gt_roughness,
        cams[1], (32, 64), spp=16, chunk=1024,
    )
    assert float(np.abs(s0 - s1).mean()) > 1e-5
    assert float(s0.max()) > 0
    # Diffuse identity (VERDICT r3 #7): img0 and s0 trace IDENTICAL specular
    # rays (same seed/geometry; albedo enters only the diffuse term), so
    # img0 - s0 == irr·albedo/π at every hit pixel — computed independently
    # here from the primary-hit uv and the GT atlases.
    import jax.numpy as jnp

    from texir_code_tpu.data.export import pano_dirs
    from texir_code_tpu.ops.gbuffer import DeviceMesh, interpolate_attributes
    from texir_code_tpu.ops.raycast import cast_rays
    from texir_code_tpu.ops.texture import bilinear_sample

    d = pano_dirs(32, 64).reshape(-1, 3)
    o = np.broadcast_to(np.asarray(cams[0], np.float32), d.shape).copy()
    hit = cast_rays(tbl.bvh, jnp.asarray(o), jnp.asarray(d), t_min=1e-5)
    _, _, uv = interpolate_attributes(DeviceMesh.from_mesh(scene.mesh), hit)
    expected = np.asarray(
        bilinear_sample(jnp.asarray(irt), uv)
        * bilinear_sample(jnp.asarray(scene.gt_albedo), uv)
        / np.pi
    )
    valid = np.asarray(hit.prim) >= 0
    got = (img0 - s0).reshape(-1, 3)
    assert valid.any()
    np.testing.assert_allclose(got[valid], expected[valid], atol=2e-4)


def test_export_layout_material_mode(tmp_path):
    from texir_code_tpu.data.export import export_reference_layout
    from texir_code_tpu.data.synthetic import make_apartment_scene

    scene = make_apartment_scene(atlas_res=32, subdiv=1, clutter=0)
    out = str(tmp_path / "mat_scan")
    path_mesh = export_reference_layout(
        scene, out, n_views=1, pano_res=(16, 32),
        gt_render="material", gt_spp=8, irt_spp=32,
    )
    assert os.path.exists(path_mesh)
    assert os.path.exists(path_mesh.replace("out1.obj", "gt_irt.hdr"))
    col = hdrio.read_hdr(os.path.join(out, "hdr", "view000", "ccm.hdr"))
    assert col.shape == (16, 32, 3) and np.isfinite(col).all()
    # material photos differ from plain radiance panos
    from texir_code_tpu.data.export import render_pano
    from texir_code_tpu.models.tbl import build_tbl

    tbl = build_tbl(scene.mesh, scene.hdr_texture)
    rad = render_pano(tbl, scene.camera_positions(1)[0], (16, 32))
    assert float(np.abs(col - rad).mean()) > 1e-3
