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
from texir_code_tpu.models.tbl import TBL
from texir_code_tpu.ops.sampling import generate_dir, reflect
from texir_code_tpu.ops.shading import fresnel_schlick_ue4, smith_g


class TracerPIL:
    def __init__(self, tbl: TBL, network: Optional[PILNetwork] = None,
                 spmd_mesh=None, fan_scene=None, cluster_scene=None):
        self.tbl = tbl
        self.network = network or PILNetwork(dims=(128,) * 4)
        # optional RAY_AXIS mesh: trace sharded over points, per-row global
        # RNG keys keep it device-count-invariant (see tracer_irrf.TracerIRRF)
        self.spmd_mesh = spmd_mesh
        # optional Pallas ray-engine scenes (culled wedge kernel on TPU;
        # the skip-link traversal is the CPU/fallback path — see TracerIRRF)
        self.fan_scene = fan_scene
        self.cluster_scene = cluster_scene

    def init_params(self, key: jax.Array):
        return self.network.init(
            key, jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.zeros((1, 1))
        )

    def _trace_rows(self, points, normals, row_keys, num_samples, roughness):
        b = points.shape[0]
        rk_r = jax.vmap(lambda k: jax.random.fold_in(k, 1))(row_keys)
        rk_h = jax.vmap(lambda k: jax.random.fold_in(k, 2))(row_keys)
        rk_wo = jax.vmap(lambda k: jax.random.fold_in(k, 3))(row_keys)
        if roughness is None:
            roughness = jax.vmap(lambda k: jax.random.uniform(k, (1,)))(rk_r)
        half = generate_dir(
            normals, num_samples, rk_h[0], mode="importance",
            roughness=roughness, row_keys=rk_h,
        )
        wo = generate_dir(
            normals, 1, rk_wo[0], mode="uniform", pre_mode="independent",
            row_keys=rk_wo,
        )[:, 0, :]
        light_dirs, _ = reflect(wo, half)
        from texir_code_tpu.models.tbl import query_tbl_auto

        pts = tuple(
            jnp.broadcast_to(points[:, None, k], (b, num_samples))
            for k in range(3)
        )
        lighting = jnp.stack(
            query_tbl_auto(
                self.tbl, self.fan_scene,
                pts, tuple(light_dirs[..., k] for k in range(3)),
                cluster_scene=self.cluster_scene,
            ),
            axis=-1,
        )
        ndl = jnp.clip(
            jnp.sum(normals[:, None, :] * light_dirs, axis=-1, keepdims=True),
            0.0, 1.0,
        )
        gt = jnp.sum(lighting * ndl, axis=1) * 2 * jnp.pi / num_samples
        return roughness, wo, gt

    @partial(jax.jit, static_argnames=("self", "num_samples"))
    def trace_gt(
        self,
        points: jnp.ndarray,
        normals: jnp.ndarray,
        num_samples: int,
        key: jax.Array,
        roughness: jnp.ndarray = None,
    ):
        """(roughness [B,1], wo [B,3], gt prefiltered radiance [B,3]).

        roughness: optional fixed [B, 1] values (validation sweeps over a
        fixed roughness grid); None (training) draws uniform per point
        (reference models/tracer_o3d_pil.py:87)."""
        b = points.shape[0]
        row_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(b))
        mesh = self.spmd_mesh
        if mesh is None or b % mesh.devices.size != 0:
            return self._trace_rows(points, normals, row_keys, num_samples,
                                    roughness)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from texir_code_tpu.parallel.mesh import RAY_AXIS

        sharded = P(RAY_AXIS)
        in_specs = [sharded, sharded, sharded]
        args = [points, normals, row_keys]
        if roughness is not None:
            in_specs.append(sharded)
            args.append(roughness)

        def body(p, n, rk, *rest):
            r = rest[0] if rest else None
            return self._trace_rows(p, n, rk, num_samples, r)

        return shard_map(
            body, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=(sharded, sharded, sharded),
        )(*args)

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
