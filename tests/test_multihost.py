"""Multi-host wiring: 2-process CPU smoke test.

Launches two real OS processes that jax.distributed-initialize against a
local coordinator, build the per-process device mesh, run a sharded bake
over a tiny synthetic scene with the batch split from
`process_local_slice`, and verify the allgather-merged texture matches a
single-process bake bit-for-bit (per-texel RNG is keyed by global texel
id, so the split must be invariant).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

WORKER = textwrap.dedent(
    """
    import sys
    # repo root injected via argv (NOT PYTHONPATH: setting PYTHONPATH at all
    # breaks axon plugin registration — see CLAUDE.md environment notes)
    sys.path.insert(0, sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    coord, pid = sys.argv[1], int(sys.argv[2])
    out_path = sys.argv[3]

    from texir_code_tpu.parallel.multihost import (
        initialize_multihost, process_local_slice,
    )

    pidx, pcnt = initialize_multihost(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert (pidx, pcnt) == (pid, 2), (pidx, pcnt)
    assert process_local_slice(10, 0, 2) == slice(0, 5)

    from texir_code_tpu.data.synthetic import make_scene
    from texir_code_tpu.models.tbl import build_tbl
    from texir_code_tpu.models.tracer_irt import bake_geometry_textures
    from texir_code_tpu.parallel.bake import ShardedIrradianceBaker

    scene = make_scene(atlas_res=32)
    tbl = build_tbl(scene.mesh, scene.hdr_texture)
    geom = bake_geometry_textures(scene.mesh, 12)
    baker = ShardedIrradianceBaker(tbl, spp=8, texel_batch=16)
    tex = baker.bake(geom, jax.random.PRNGKey(3))
    if pid == 0:
        np.save(out_path, tex)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_bake(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo_root = os.path.dirname(os.path.dirname(__file__))
    coord = f"127.0.0.1:{_free_port()}"
    out_path = str(tmp_path / "tex.npy")
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as f:
        f.write(WORKER)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid), out_path, repo_root],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    # single-process oracle (this process: 8 virtual devices, 1 host)
    import jax

    from texir_code_tpu.data.synthetic import make_scene
    from texir_code_tpu.models.tbl import build_tbl
    from texir_code_tpu.models.tracer_irt import bake_geometry_textures
    from texir_code_tpu.parallel.bake import ShardedIrradianceBaker
    from texir_code_tpu.parallel.mesh import make_device_mesh

    scene = make_scene(atlas_res=32)
    tbl = build_tbl(scene.mesh, scene.hdr_texture)
    geom = bake_geometry_textures(scene.mesh, 12)
    baker = ShardedIrradianceBaker(
        tbl, spp=8, texel_batch=16, mesh=make_device_mesh(2)
    )
    expect = baker.bake(geom, jax.random.PRNGKey(3))
    got = np.load(out_path)
    np.testing.assert_array_equal(got, expect)
