"""Mat stage-2 phase profile with the cached per-view constants (TPU).

After the view cache (models/material.py::precompute_view) the step is
pure shading + backward; this breaks it down with monkeypatched
stop_gradient ablations (same methodology as measure_sampler_backward.py)
under the production scanned dispatch (4 steps / jit call, key varies per
step so the relay cannot replay).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import texir_code_tpu.models.material as M
    import texir_code_tpu.ops.texture as T
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
    pos = jnp.asarray(syn.camera_positions(1)[0])
    ext = np.eye(4, dtype=np.float32)
    ext[0:3, 3] = np.asarray(pos)
    mvp = cube_mvp(jnp.asarray(ext))
    res = model.cube_res
    gt = jnp.full((6, res, res, 3), 0.2)
    seg_id = jnp.zeros((6, res, res), jnp.int32)
    ones = jnp.ones((6, res, res, 1))
    opt = optax.adam(3e-2)
    params0 = init_material_params(2048, 4096)
    view = jax.jit(model.precompute_view)(params0, mvp, pos)

    orig_ts = T.texture_sample
    orig_pyr = T.build_mip_pyramid

    def make_scan(mode, stage=2, grad=True, n=4):
        def one(p, opt_state, key):
            def loss_fn(pp):
                if mode == "no_texgrad":
                    def ts(pyr, uv, lod=None, boundary="wrap", rng=None):
                        return jax.lax.stop_gradient(
                            orig_ts(pyr, uv, lod, boundary, rng=rng))
                    M.texture_sample = ts
                elif mode == "no_pyr":
                    def pyr_sg(tex, max_levels=None):
                        levels = orig_pyr(tex, max_levels)
                        return [levels[0]] + [
                            jax.lax.stop_gradient(l) for l in levels[1:]
                        ]
                    M.build_mip_pyramid = pyr_sg
                try:
                    out = model._forward(pp, mvp, pos, key, stage=stage, view=view)
                finally:
                    M.texture_sample = orig_ts
                    M.build_mip_pyramid = orig_pyr
                total, _ = render_loss(gt, out, ones, seg_id, 49, stage,
                                       seg_region=ones)
                return total

            if not grad:
                return p, opt_state, loss_fn(p)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt_state = opt.update(grads, opt_state)
            p = optax.apply_updates(p, updates)
            return clamp_material_params(p), opt_state, loss

        def steps(p, o, seed):
            def body(carry, i):
                pp, oo = carry
                pp, oo, loss = one(
                    pp, oo, jax.random.fold_in(jax.random.PRNGKey(0), seed * n + i)
                )
                return (pp, oo), loss
            (p, o), losses = jax.lax.scan(body, (p, o), jnp.arange(n, dtype=jnp.int32))
            return p, o, losses

        return jax.jit(steps, donate_argnums=(0, 1)), n

    for name, kw in [
        ("step2 full", dict(mode="full")),
        ("step2 no_texgrad", dict(mode="no_texgrad")),
        ("step2 no_pyr", dict(mode="no_pyr")),
        ("fwd2 only", dict(mode="full", grad=False)),
        ("fwd0 only", dict(mode="full", stage=0, grad=False)),
        ("step0 full", dict(mode="full", stage=0)),
    ]:
        fn, n = make_scan(**kw)
        p = init_material_params(2048, 4096)
        o = opt.init(p)
        p, o, losses = fn(p, o, jnp.int32(0))
        jax.block_until_ready(losses)
        best = float("inf")
        for r in range(3):
            t0 = time.time()
            p, o, losses = fn(p, o, jnp.int32(r + 1))
            jax.block_until_ready(losses)
            best = min(best, (time.time() - t0) / n)
        print(f"{name:20s} {best * 1e3:7.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
