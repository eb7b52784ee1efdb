"""Mat-step LOD histogram + current sampler-backward share (TPU).

The texture-sampler backward is an XLA scatter-add; its cost is per
scattered element and duplication-bound.  If (nearly) all taps land on
coarse mip levels — which 128^2 cube faces against 2048^2/4096^2 atlases
should guarantee (footprint ~16 texels/px -> lod ~4) — the scatter can be
replaced by a one-hot MXU matmul per level: out_l = onehot(idx) @ g costs
S_l x N FLOPs, trivial for S_l <= ~100k, and needs no scatter at all.

Prints: per-level tap mass for albedo/roughness/irt lods, and re-runs the
stop-gradient ablations from measure_sampler_backward at the CURRENT step
speed (5.7 iters/s) to get the sampler backward's present share.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.data.synthetic import make_apartment_scene
    from texir_code_tpu.models.material import MaterialModel
    from texir_code_tpu.ops.gbuffer import cube_mvp
    from texir_code_tpu.ops.texture import compute_lod

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

    gb = model._gbuffer(mvp, pos)
    uv_img = gb.uv

    for name, (h, w) in [
        ("albedo 2048^2", (2048, 2048)),
        ("roughness 4096^2", (4096, 4096)),
        ("irt", (irt.shape[0], irt.shape[1])),
    ]:
        lod = np.asarray(compute_lod(uv_img, h, w))
        mask = np.asarray(gb.mask[..., 0]) > 0
        lod = lod[mask]
        lo = np.floor(lod).astype(int)
        hist = np.bincount(lo, minlength=14)
        hist_hi = np.bincount(np.minimum(lo + 1, 13), minlength=14)
        both = hist + hist_hi  # tap mass per level (lo and hi taps)
        tot = both.sum()
        print(f"{name}: lod mean={lod.mean():.2f} min={lod.min():.2f} "
              f"max={lod.max():.2f}")
        print("  level tap mass: " + " ".join(
            f"L{i}:{100.0 * c / tot:.1f}%" for i, c in enumerate(both) if c
        ), flush=True)

    # current sampler-backward share, via the measure script's machinery
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "msb",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "measure_sampler_backward.py"),
    )
    msb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(msb)
    msb.main()


if __name__ == "__main__":
    main()
