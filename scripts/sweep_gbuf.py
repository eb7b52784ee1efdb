"""G-buffer primary-trace engine sweep at Mat bench shapes (TPU).

Phase profile (scripts/profile_mat_phases.py after epoch fusing): the
primary G-buffer is ~79 ms of the 298 ms stage-2 step — 98k coherent rays
at 1.2 Mrays/s while the 1.57M specular rays run at ~19 Mrays/s.  Primary
rays see the whole frustum, so the culled kernel's candidate lists ≈ all
clusters and its per-visit overhead dominates at tiny ray counts; the
exhaustive fan stream has no per-visit control flow.  This times both
engines plus culled-kernel shape variants.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, mk_args, n=4):
    import jax

    out = fn(*mk_args(0))
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        outs = [fn(*mk_args(1 + r * n + i)) for i in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import make_apartment_scene
    from texir_code_tpu.geometry.bvh import build_bvh
    from texir_code_tpu.models.material import MaterialModel
    from texir_code_tpu.ops.gbuffer import cube_mvp, render_gbuffer

    syn = make_apartment_scene(atlas_res=256, subdiv=24)
    irt = np.maximum(syn.hdr_texture, 0.1)
    model = MaterialModel(
        syn.mesh, syn.hdr_texture, irt, pano_res=(256, 512),
        sample_light=(32, 16),
    )
    pos0 = np.asarray(syn.camera_positions(1)[0])

    def mvp_of(i):
        ext = np.eye(4, dtype=np.float32)
        ext[0:3, 3] = pos0 + 1e-3 * np.asarray([i, 0, 0])
        return jnp.asarray(np.asarray(cube_mvp(jnp.asarray(ext))))

    def mk(i):
        return mvp_of(i), jnp.asarray(pos0)

    def bench(name, **kw):
        @jax.jit
        def f(mvp, pos):
            g = render_gbuffer(
                model.device_mesh, model.tbl.bvh, mvp, pos, model.cube_res,
                **kw,
            )
            return g.t.sum() + g.uv.sum()

        print(f"{name:36s} {timed(f, mk) * 1e3:7.1f} ms", flush=True)

    bench("culled fb=8 er=0 rw=2048 (current)",
          cluster_scene=model.cluster_scene, fan_block=8, exit_rows=0,
          row_width=2048)
    bench("culled fb=48 er=0 rw=2048",
          cluster_scene=model.cluster_scene, fan_block=48, exit_rows=0,
          row_width=2048)
    bench("culled fb=16 er=0 rw=2048",
          cluster_scene=model.cluster_scene, fan_block=16, exit_rows=0,
          row_width=2048)
    bench("fan (exhaustive stream)", fan_scene=model.fan_scene)


if __name__ == "__main__":
    main()
