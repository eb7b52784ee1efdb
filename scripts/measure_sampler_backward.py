"""Measure the texture-sampler backward's share of the Mat stage-2 step.

VERDICT #8: the sampler backward is XLA scatter-add into the flattened mip
pyramid; this script times the full-reference-shape Mat step (bench.py
_mat_step workload) against ablations that stop gradients at specific
boundaries, attributing wall-clock to:

  * full:        value_and_grad of the complete stage-2 loss
  * no_texgrad:  stop_gradient around the four texture fetches -> removes
                 the gather backward (scatter-add) AND the pyramid-build
                 transpose, keeps the forward identical
  * no_pyr:      gradients flow to the *flat pyramid* but not through the
                 pyramid build (stop_gradient on mip levels > 0) -> isolates
                 the pyramid-build transpose from the scatter-add
  * fwd_only:    forward pass alone (no grad), for reference

Run on TPU (default backend); prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# repo-root import without PYTHONPATH: setting PYTHONPATH at all (even to an
# empty directory) breaks the axon TPU plugin's backend registration
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_steps(jstep, params, opt_state, n=4):
    import jax

    params, opt_state, loss = jstep(params, opt_state, jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(1, n + 1):
        params, opt_state, loss = jstep(params, opt_state, jax.random.PRNGKey(i))
    jax.block_until_ready(loss)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from texir_code_tpu.data.synthetic import make_apartment_scene
    from texir_code_tpu.models.losses import render_loss
    from texir_code_tpu.models import material as M
    from texir_code_tpu.models.material import (
        MaterialModel,
        clamp_material_params,
        init_material_params,
    )
    from texir_code_tpu.ops import texture as T
    from texir_code_tpu.ops.gbuffer import cube_mvp

    syn = make_apartment_scene(atlas_res=256, subdiv=24)
    irt = np.maximum(syn.hdr_texture, 0.1)
    model = MaterialModel(
        syn.mesh, syn.hdr_texture, irt, pano_res=(256, 512),
        sample_light=(32, 16),
    )
    pos = jnp.asarray(syn.camera_positions(1)[0])
    ext = np.eye(4, dtype=np.float32)
    ext[0:3, 3] = np.asarray(pos)
    mvp = cube_mvp(jnp.asarray(ext))
    res = model.cube_res
    gt = jnp.full((6, res, res, 3), 0.2)
    seg_id = jnp.zeros((6, res, res), jnp.int32)
    ones = jnp.ones((6, res, res, 1))
    opt = optax.adam(3e-2)

    def make_step(mode):
        orig_ts = T.texture_sample
        orig_pyr = T.build_mip_pyramid

        def step(p, opt_state, key):
            def loss_fn(pp):
                if mode == "no_texgrad":
                    def ts(pyr, uv, lod=None, boundary="wrap"):
                        return jax.lax.stop_gradient(
                            orig_ts(pyr, uv, lod, boundary)
                        )
                    M.texture_sample = ts
                elif mode == "no_pyr":
                    def pyr_sg(tex, max_levels=None):
                        levels = orig_pyr(tex, max_levels)
                        return [levels[0]] + [
                            jax.lax.stop_gradient(l) for l in levels[1:]
                        ]
                    M.build_mip_pyramid = pyr_sg
                try:
                    out = model._forward(pp, mvp, pos, key, stage=2)
                finally:
                    M.texture_sample = orig_ts
                    M.build_mip_pyramid = orig_pyr
                total, _ = render_loss(
                    gt, out, ones, seg_id, 49, 2, seg_region=ones
                )
                return total

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt_state2 = opt.update(grads, opt_state)
            p = optax.apply_updates(p, updates)
            return clamp_material_params(p), opt_state2, loss

        return jax.jit(step, donate_argnums=(0, 1))

    def fwd_step(p, opt_state, key):
        out = model._forward(p, mvp, pos, key, stage=2)
        return p, opt_state, out["rgb"].sum()

    results = {}
    for mode in ["full", "no_texgrad", "no_pyr"]:
        params = init_material_params(2048, 4096)
        opt_state = opt.init(params)
        results[mode] = timed_steps(make_step(mode), params, opt_state)
    params = init_material_params(2048, 4096)
    results["fwd_only"] = timed_steps(
        jax.jit(fwd_step, donate_argnums=(0,)), params, opt.init(params)
    )

    full = results["full"]
    out = {
        "seconds_per_iter": {k: round(v, 4) for k, v in results.items()},
        "sampler_backward_share": round(
            (full - results["no_texgrad"]) / full, 4
        ),
        "pyramid_transpose_share": round(
            (results["no_pyr"] - results["no_texgrad"]) / full, 4
        ),
        "backward_total_share": round((full - results["fwd_only"]) / full, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
