"""NIrF — neural irradiance field training model (stage IRRF).

TPU-native rebuild of reference models/tracer_o3d_irrf.py:29-255: per step,
surface points get Hammersley-stratified hemisphere directions, ground-truth
irradiance is Monte-Carlo traced against the TBL on device (the reference
round-trips every ray through CPU Embree, :90-92), and a `MatNetwork` MLP
predicts log-domain irradiance at the point plus a jittered point (the
smoothness pair, :125-128).

The returned dict matches the reference ({gt, pred, pred_jit}) and feeds
losses.IRFLoss.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from texir_code_tpu.models.fields import MatNetwork
from texir_code_tpu.models.tbl import TBL
from texir_code_tpu.ops.sampling import generate_dir
from texir_code_tpu.ops.shading import irradiance_estimator


class TracerIRRF:
    """NIrF trainer model: MC irradiance ground truth + MLP prediction."""

    def __init__(
        self,
        tbl: TBL,
        network: Optional[MatNetwork] = None,
        std_jit: float = 5e-2,
        fan_scene=None,
        cluster_scene=None,
        spmd_mesh=None,
    ):
        """Args:
            tbl: texture-based-lighting scene (emitter mesh + HDR atlas).
            network: irradiance MLP (defaults to the reference's
                irrf_network config: PE(10) → 4×512 → 3).
            std_jit: jitter std for the smoothness pair
                (train.std_jit, reference configs/irrf_hdrhouse.conf).
            fan_scene / cluster_scene: optional Pallas ray-engine scenes;
                with them the GT trace runs the culled per-ray kernel on
                TPU (the skip-link traversal is the CPU/fallback path and
                is ~50x slower per train step at env_res 32x64).
            spmd_mesh: optional jax.sharding.Mesh with a RAY_AXIS axis —
                the GT trace (>99% of step FLOPs: B×S rays vs a 4×512 MLP
                on B points) is shard_map-ped over the point axis.
                Bit-identical to the unsharded trace: per-row RNG keys are
                folded from the GLOBAL point index before sharding, the
                same scheme that makes the bake device-count-invariant
                (ops/sampling.stratified_samples row_keys).  The MLP +
                optimizer stay replicated — psum'ing gradients of a model
                this small would cost more than it saves.
        """
        self.tbl = tbl
        self.network = network or MatNetwork(
            points_multires=10, dims=(512, 512, 512, 512), p_out_dim=3
        )
        self.std_jit = std_jit
        self.fan_scene = fan_scene
        self.cluster_scene = cluster_scene
        self.spmd_mesh = spmd_mesh

    def init_params(self, key: jax.Array):
        return self.network.init(key, jnp.zeros((1, 3)))

    def _trace_rows(
        self,
        points: jnp.ndarray,
        normals: jnp.ndarray,
        row_keys: jax.Array,
        resolution: Tuple[int, int],
    ) -> jnp.ndarray:
        """Per-row-keyed trace body (shard-invariant; shard_map-able)."""
        from texir_code_tpu.models.tbl import query_tbl_auto

        s = resolution[0] * resolution[1]
        b = points.shape[0]
        dirs = generate_dir(
            normals, s, row_keys[0], mode="uniform", row_keys=row_keys
        )
        pts = tuple(
            jnp.broadcast_to(points[:, None, k], (b, s)) for k in range(3)
        )
        dd = tuple(dirs[..., k] for k in range(3))
        lighting = query_tbl_auto(
            self.tbl, self.fan_scene, pts, dd,
            cluster_scene=self.cluster_scene,
        )
        return irradiance_estimator(
            jnp.stack(lighting, axis=-1), dirs, normals, s
        )

    @partial(jax.jit, static_argnames=("self", "resolution"))
    def trace_gt(
        self,
        points: jnp.ndarray,
        normals: jnp.ndarray,
        resolution: Tuple[int, int],
        key: jax.Array,
    ) -> jnp.ndarray:
        """MC ground-truth irradiance: Σ L·(n·l)·2π/S over S = h·w uniform
        hemisphere directions (reference :121-122).  Non-differentiable.

        Args:
            points: [B, 3]; normals: [B, 3].
            resolution: (h, w) direction grid; S = h·w (env_res config).
        """
        b = points.shape[0]
        # global-index row keys → identical rows for ANY sharding
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
            out_specs=P(RAY_AXIS),
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
        """One training-step forward (reference :72-145).

        Returns {gt, pred, pred_jit}; `pred` is in hdr_scale (log) domain —
        the loss compares it against hdr_scale(gt) (models/loss.py:52).
        """
        k_trace, k_jit = jax.random.split(key)
        out: Dict[str, jnp.ndarray] = {}
        if trace:
            out["gt"] = jax.lax.stop_gradient(
                self.trace_gt(points, normals, resolution, k_trace)
            )
        out["pred"] = self.network.apply(params, points)
        jitter = jax.random.normal(k_jit, points.shape) * self.std_jit
        out["pred_jit"] = self.network.apply(params, points + jitter)
        return out

    def predict_irradiance(self, params, points: jnp.ndarray) -> jnp.ndarray:
        """Inference: linear-domain irradiance at points (hdr_recover of the
        log-domain MLP output, reference models/mat_nvdiffrast.py:157)."""
        from texir_code_tpu.ops.shading import hdr_recover

        return hdr_recover(self.network.apply(params, points))
