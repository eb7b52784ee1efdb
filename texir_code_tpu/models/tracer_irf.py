"""IRF — view-dependent incident-radiance field (stage IRF).

Rebuild of reference models/tracer_o3d.py:29-219: per surface point, a
Hammersley hemisphere grid of directions; ground truth is the per-direction
TBL radiance (not integrated — unlike the IRRF variant); prediction is an
`IRNetwork`/`NeILFMLP` evaluated per (point, direction).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from texir_code_tpu.models.fields import IRNetwork
from texir_code_tpu.models.tbl import TBL
from texir_code_tpu.ops.sampling import generate_dir


class TracerIRF:
    """View-dependent radiance tracer: {gt [B,S,3], pred [B,S,3]}."""

    def __init__(self, tbl: TBL, network: Optional[IRNetwork] = None,
                 spmd_mesh=None, fan_scene=None, cluster_scene=None):
        self.tbl = tbl
        self.network = network or IRNetwork(dims=(512,) * 8)
        # optional RAY_AXIS mesh: trace sharded over points, per-row global
        # RNG keys keep it device-count-invariant (see tracer_irrf.TracerIRRF)
        self.spmd_mesh = spmd_mesh
        # optional Pallas ray-engine scenes (culled wedge kernel on TPU;
        # the skip-link traversal is the CPU/fallback path — see TracerIRRF)
        self.fan_scene = fan_scene
        self.cluster_scene = cluster_scene

    def init_params(self, key: jax.Array):
        return self.network.init(key, jnp.zeros((1, 3)), jnp.zeros((1, 3)))

    def _trace_rows(self, points, normals, row_keys, resolution):
        from texir_code_tpu.models.tbl import query_tbl_auto

        s = resolution[0] * resolution[1]
        b = points.shape[0]
        dirs = generate_dir(
            normals, s, row_keys[0], mode="uniform", row_keys=row_keys
        )
        pts = tuple(
            jnp.broadcast_to(points[:, None, k], (b, s)) for k in range(3)
        )
        lighting = query_tbl_auto(
            self.tbl, self.fan_scene,
            pts, tuple(dirs[..., k] for k in range(3)),
            cluster_scene=self.cluster_scene,
        )
        return dirs, jnp.stack(lighting, axis=-1)

    @partial(jax.jit, static_argnames=("self", "resolution"))
    def trace_gt(
        self,
        points: jnp.ndarray,
        normals: jnp.ndarray,
        resolution: Tuple[int, int],
        key: jax.Array,
    ):
        """(dirs [B,S,3], per-direction radiance [B,S,3])."""
        b = points.shape[0]
        row_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(b))
        mesh = self.spmd_mesh
        if mesh is None or b % mesh.devices.size != 0:
            return self._trace_rows(points, normals, row_keys, resolution)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from texir_code_tpu.parallel.mesh import RAY_AXIS

        return shard_map(
            lambda p, n, rk: self._trace_rows(p, n, rk, resolution),
            mesh=mesh,
            in_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
            out_specs=(P(RAY_AXIS), P(RAY_AXIS)),
        )(points, normals, row_keys)

    def forward(
        self,
        params,
        points: jnp.ndarray,
        normals: jnp.ndarray,
        resolution: Tuple[int, int],
        key: jax.Array,
        trace: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        b = points.shape[0]
        s = resolution[0] * resolution[1]
        dirs, gt = self.trace_gt(points, normals, resolution, key)
        pts_rep = jnp.broadcast_to(points[:, None, :], (b, s, 3)).reshape(-1, 3)
        pred = self.network.apply(params, pts_rep, dirs.reshape(-1, 3)).reshape(b, s, 3)
        out = {"pred": pred}
        if trace:
            out["gt"] = jax.lax.stop_gradient(gt)
        return out
