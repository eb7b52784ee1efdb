"""PIL — pre-integrated lighting field (stage PIL).

Rebuild of reference models/tracer_o3d_pil.py:29-254: learn
`PILNetwork(point, wo, roughness) → prefiltered specular radiance`.  Per
training point: a random roughness, one random outgoing direction wo, GGX
importance half-vectors reflected about wo, TBL radiance along those rays,
integrated with the reference's estimator (:133-134).

Also provides `split_sum_lut` — the 256×256×2 (scale, bias) environment-BRDF
table the reference ships as `models/bsdf_256_256.bin` (consumed by
split-sum shading), generated here instead of shipped as an opaque binary.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.models.fields import PILNetwork
from texir_code_tpu.models.tbl import TBL, query_tbl_multi
from texir_code_tpu.ops.sampling import generate_dir, reflect
from texir_code_tpu.ops.shading import fresnel_schlick_ue4, smith_g


class TracerPIL:
    def __init__(self, tbl: TBL, network: Optional[PILNetwork] = None):
        self.tbl = tbl
        self.network = network or PILNetwork(dims=(128,) * 4)

    def init_params(self, key: jax.Array):
        return self.network.init(
            key, jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.zeros((1, 1))
        )

    @partial(jax.jit, static_argnames=("self", "num_samples"))
    def trace_gt(
        self,
        points: jnp.ndarray,
        normals: jnp.ndarray,
        num_samples: int,
        key: jax.Array,
    ):
        """(roughness [B,1], wo [B,3], gt prefiltered radiance [B,3])."""
        b = points.shape[0]
        k_r, k_h, k_wo = jax.random.split(key, 3)
        roughness = jax.random.uniform(k_r, (b, 1))
        half = generate_dir(
            normals, num_samples, k_h, mode="importance", roughness=roughness
        )
        wo = generate_dir(
            normals, 1, k_wo, mode="uniform", pre_mode="independent"
        )[:, 0, :]
        light_dirs, _ = reflect(wo, half)
        lighting = query_tbl_multi(self.tbl, points, light_dirs)
        ndl = jnp.clip(
            jnp.sum(normals[:, None, :] * light_dirs, axis=-1, keepdims=True),
            0.0, 1.0,
        )
        gt = jnp.sum(lighting * ndl, axis=1) * 2 * jnp.pi / num_samples
        return roughness, wo, gt

    def forward(
        self,
        params,
        points: jnp.ndarray,
        normals: jnp.ndarray,
        resolution: Tuple[int, int],
        key: jax.Array,
        trace: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        s = resolution[0] * resolution[1]
        roughness, wo, gt = self.trace_gt(points, normals, s, key)
        pred = self.network.apply(params, points, wo, roughness)
        out = {"pred": pred, "roughness": roughness, "wo": wo}
        if trace:
            out["gt"] = jax.lax.stop_gradient(gt)
        return out


def split_sum_lut(res: int = 256, num_samples: int = 1024) -> np.ndarray:
    """[res, res, 2] environment-BRDF (scale, bias) table over (ndv, rough).

    The standard split-sum pre-integration (Karis 2013): for each (n·v,
    roughness), GGX-importance integrate F-weight decomposed into the
    Fresnel scale/bias pair.  Equivalent content to the reference's
    models/bsdf_256_256.bin asset."""
    ndv = jnp.linspace(1e-3, 1.0, res)
    rough = jnp.linspace(1e-3, 1.0, res)

    def one(ndv_s, rough_s):
        v = jnp.asarray([jnp.sqrt(1 - ndv_s**2), 0.0, ndv_s])
        n = jnp.asarray([0.0, 0.0, 1.0])
        key = jax.random.PRNGKey(0)
        half = generate_dir(
            n[None, :], num_samples, key, mode="importance",
            roughness=jnp.asarray([[rough_s]]),
        )[0]
        vdh = jnp.clip(jnp.sum(half * v[None, :], axis=-1, keepdims=True), 0.0, 1.0)
        l = 2 * vdh * half - v[None, :]
        ndl = jnp.clip(l[:, 2:3], 0.0, 1.0)
        ndh = jnp.clip(half[:, 2:3], 0.0, 1.0)
        g = smith_g(jnp.asarray([[ndv_s]]), ndl, jnp.asarray([[rough_s]]))
        g_vis = g * vdh / jnp.clip(ndh * ndv_s, 1e-7, None)
        fc = jnp.power(1.0 - vdh, 5.0)
        a = jnp.sum((1 - fc) * g_vis * (ndl > 0)) / num_samples
        b = jnp.sum(fc * g_vis * (ndl > 0)) / num_samples
        return jnp.stack([a, b])

    grid = jax.vmap(lambda r: jax.vmap(lambda nv: one(nv, r))(ndv))(rough)
    return np.asarray(grid)
