"""Mat-step phase profile at full reference shapes (TPU, idle host).

The sampler-ablation measurement (scripts/lod_histogram.py, after the
ray-dir fix) shows the FORWARD is ~77% of the 0.35 s stage-2 step.  This
breaks the forward into cumulative jitted phases:

  gbuf   — primary visibility G-buffer only (culled kernel)
  fwd0   — stage-0 forward (gbuffer + lods + texture fetches + diffuse)
  fwd2   — stage-2 forward (adds the 16-spp GGX specular MC: 1.57M
           per-ray culled rays + TBL radiance fetch + Cook-Torrance)
  step2  — full stage-2 train step (fwd2 + RenderLoss + grad + Adam)

Each timed call varies the PRNG key / an input (relay replay).
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
    import optax

    from texir_code_tpu.data.synthetic import make_apartment_scene
    from texir_code_tpu.models.losses import render_loss
    from texir_code_tpu.models.material import (
        MaterialModel,
        clamp_material_params,
        init_material_params,
    )
    from texir_code_tpu.ops.gbuffer import cube_mvp

    syn = make_apartment_scene(atlas_res=256, subdiv=24)
    irt = np.maximum(syn.hdr_texture, 0.1)
    model = MaterialModel(
        syn.mesh, syn.hdr_texture, irt, pano_res=(256, 512),
        sample_light=(32, 16),
    )
    params = init_material_params(2048, 4096)
    pos0 = np.asarray(syn.camera_positions(1)[0])

    def mvp_of(i):
        ext = np.eye(4, dtype=np.float32)
        ext[0:3, 3] = pos0 + 1e-3 * np.asarray([i, 0, 0])
        return jnp.asarray(np.asarray(cube_mvp(jnp.asarray(ext))))

    @jax.jit
    def f_gbuf(mvp, pos):
        g = model._gbuffer(mvp, pos)
        return g.t.sum() + g.uv.sum()

    def mk_g(i):
        return mvp_of(i), jnp.asarray(pos0)

    print(f"gbuf:  {timed(f_gbuf, mk_g) * 1e3:7.1f} ms", flush=True)

    for stage in (0, 2):
        @jax.jit
        def f_fwd(mvp, pos, key, stage=stage):
            out = model._forward(params, mvp, pos, key, stage=stage)
            return out["rgb"].sum()

        def mk_f(i):
            return mvp_of(0), jnp.asarray(pos0), jax.random.PRNGKey(i)

        print(f"fwd{stage}:  {timed(f_fwd, mk_f) * 1e3:7.1f} ms", flush=True)

    res = model.cube_res
    gt = jnp.full((6, res, res, 3), 0.2)
    seg_id = jnp.zeros((6, res, res), jnp.int32)
    ones = jnp.ones((6, res, res, 1))
    opt = optax.adam(3e-2)

    def step(p, opt_state, mvp, pos, key):
        def loss_fn(pp):
            out = model._forward(pp, mvp, pos, key, stage=2)
            total, _ = render_loss(gt, out, ones, seg_id, 49, 2,
                                   seg_region=ones)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(grads, opt_state)
        p = optax.apply_updates(p, updates)
        return clamp_material_params(p), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    opt_state = opt.init(params)
    state = [params, opt_state]

    def run_step(key):
        p, o, loss = jstep(state[0], state[1], mvp_of(0), jnp.asarray(pos0),
                           key)
        state[0], state[1] = p, o
        return loss

    print(
        f"step2: {timed(run_step, lambda i: (jax.random.PRNGKey(i),)) * 1e3:7.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
