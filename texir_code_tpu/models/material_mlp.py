"""MLP material model over panorama G-buffers (stage Mat with MLP head).

Rebuild of reference models/mat_mlp.py:30-228 (`MaterialMLP`): the
pre-nvdiffrast pipeline kept as an alternative — materials predicted by an
MLP at G-buffer positions of an equirectangular camera (the reference
renders the G-buffer with redner, here pano rays are cast against the BVH),
shaded with TBL diffuse + specular Monte Carlo.  The explicit per-object
texture variant (reference models/mat_redner.py) lives in
models/material_redner.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.models.fields import MatNetwork
from texir_code_tpu.models.tbl import TBL, build_tbl, query_tbl_soa
from texir_code_tpu.ops import shading
from texir_code_tpu.ops.gbuffer import DeviceMesh, interpolate_attributes
from texir_code_tpu.ops.raycast import cast_rays_soa
from texir_code_tpu.ops.sampling import generate_dir_soa, reflect_soa


class MaterialMLP:
    """MLP SVBRDF over pano G-buffers."""

    def __init__(
        self,
        mesh,
        hdr_texture: np.ndarray,
        pano_res: Tuple[int, int] = (128, 256),
        sample_light: Tuple[int, int] = (32, 16),
        hdr_exposure: float = 0.0,
        network: Optional[MatNetwork] = None,
    ):
        self.mesh = mesh
        self.pano_res = tuple(pano_res)
        self.sample_light = tuple(sample_light)
        self.tbl = build_tbl(mesh, hdr_texture, hdr_exposure)
        self.device_mesh = DeviceMesh.from_mesh(mesh)
        self.network = network or MatNetwork(dims=(512,) * 4, p_out_dim=4)
        self._pano_dirs = self._make_pano_dirs()
        self._jit = None

    def _make_pano_dirs(self):
        h, w = self.pano_res
        theta, phi = np.meshgrid(
            np.linspace(-np.pi, np.pi, w, dtype=np.float32),
            np.linspace(0.5 * np.pi, -0.5 * np.pi, h, dtype=np.float32),
        )
        d = np.stack(
            [np.cos(phi) * np.sin(theta), np.sin(phi), np.cos(phi) * np.cos(theta)],
            axis=-1,
        ).reshape(-1, 3)
        return tuple(jnp.asarray(np.ascontiguousarray(d[:, k])) for k in range(3))

    def init_params(self, key: jax.Array):
        return self.network.init(key, jnp.zeros((1, 3)))

    def forward(self, params, cam_position, key) -> Dict[str, jnp.ndarray]:
        if self._jit is None:
            self._jit = jax.jit(self._forward)
        return self._jit(params, cam_position, key)

    def _forward(self, params, cam_position, key):
        h, w = self.pano_res
        b = h * w
        d = self._pano_dirs
        o = tuple(jnp.full((b,), 0.0) + cam_position[k] for k in range(3))
        hit = cast_rays_soa(self.tbl.bvh, o, d, t_min=1e-5)
        pos, nrm, _ = interpolate_attributes(self.device_mesh, hit)
        valid = (hit.prim >= 0)[:, None]
        pos = jnp.where(valid, pos, 0.0)
        nrm = jnp.where(valid, nrm, jnp.asarray([0.0, 0.0, 1.0]))

        mats = self.network.apply(params, jax.lax.stop_gradient(pos))
        albedo = jax.nn.sigmoid(mats[..., 0:3])
        roughness = jax.nn.sigmoid(mats[..., 3:4]) * 0.9 + 0.09

        n = tuple(nrm[:, k] for k in range(3))
        pts = tuple((pos + 1e-2 * nrm)[:, k] for k in range(3))
        view = tuple(cam_position[k] - pts[k] for k in range(3))
        vn = jnp.maximum(jnp.sqrt(sum(v * v for v in view)), 1e-4)
        view = tuple(v / vn for v in view)

        k_d, k_s = jax.random.split(key)
        s_diff = self.sample_light[0]
        ld = generate_dir_soa(n, s_diff, k_d, mode="uniform")
        lighting = query_tbl_soa(
            self.tbl,
            tuple(jnp.broadcast_to(p[:, None], (b, s_diff)) for p in pts),
            ld,
        )
        ndl = jnp.clip(sum(n[k][:, None] * ld[k] for k in range(3)), 0.0, 1.0)
        diffuse = (
            jnp.stack(
                [jnp.sum(lighting[k] * ndl, axis=1) for k in range(3)], axis=-1
            )
            * 2 * jnp.pi / s_diff
        ) * albedo / jnp.pi

        s_spec = self.sample_light[1]
        half = generate_dir_soa(
            n, s_spec, k_s, mode="importance", roughness=roughness[:, 0]
        )
        light_dirs, _ = reflect_soa(view, half)
        spec_light = query_tbl_soa(
            self.tbl,
            tuple(jnp.broadcast_to(p[:, None], (b, s_spec)) for p in pts),
            jax.lax.stop_gradient(light_dirs),
        )
        spec = shading.specular_estimator_soa(
            spec_light, half, n, view, light_dirs, roughness[:, 0]
        )
        specular = jnp.stack(spec, axis=-1) / s_spec

        return {
            "rgb": (diffuse + specular).reshape(h, w, 3),
            "albedo": albedo.reshape(h, w, 3),
            "roughness": roughness.reshape(h, w, 1),
            "empty_mask": valid.astype(jnp.float32).reshape(h, w, 1),
        }
