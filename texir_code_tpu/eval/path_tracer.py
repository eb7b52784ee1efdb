"""Monte-Carlo path tracer over the recovered materials — the redner
replacement for relighting evaluation.

Rebuild of reference models/test_redner.py:35-285: the recovered SVBRDF
textures are re-lit by explicit quad area lights (one under each camera,
:117-124) and rendered by path tracing (`pyredner.render_pathtracing(
max_bounces=3, num_samples=[64, 1])`, :161-162), entirely inside redner's
C++/CUDA core in the reference.  Here the tracer is ~200 lines of SoA JAX on
the same BVH the rest of the framework uses:

  * next-event estimation at every bounce (uniform quad-light sampling +
    shadow ray) — far lower variance than redner's brute-force emitter
    hits at equal spp;
  * cosine-sampled diffuse indirect bounces with Cook-Torrance BRDF
    weighting (the reference converts the recovered roughness for redner,
    :73-76; here the BRDF stays in this framework's own parameterization);
  * fixed bounce count, fixed spp, deterministic per-pixel keys.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.models.tbl import TBL
from texir_code_tpu.ops import shading
from texir_code_tpu.ops.raycast import cast_rays_soa
from texir_code_tpu.ops.sampling import build_onb_soa, generate_dir_soa
from texir_code_tpu.ops.texture import bilinear_sample


@dataclasses.dataclass
class QuadLight:
    """Rectangular area light: corner + two edges, constant radiance."""

    corner: np.ndarray    # [3]
    edge_u: np.ndarray    # [3]
    edge_v: np.ndarray    # [3]
    radiance: np.ndarray  # [3]

    @property
    def area(self) -> float:
        return float(np.linalg.norm(np.cross(self.edge_u, self.edge_v)))

    @property
    def normal(self) -> np.ndarray:
        n = np.cross(self.edge_u, self.edge_v)
        return n / max(np.linalg.norm(n), 1e-12)


def light_under_camera(
    cam_position: np.ndarray,
    size: float = 0.3,
    drop: float = 0.2,
    radiance: Sequence[float] = (30.0, 30.0, 30.0),
) -> QuadLight:
    """The reference's add_light_source: a small quad just below the camera
    (models/test_redner.py:117-124), facing down."""
    c = np.asarray(cam_position, np.float32)
    corner = c + np.asarray([-size / 2, -drop, -size / 2], np.float32)
    return QuadLight(
        corner=corner,
        edge_u=np.asarray([size, 0, 0], np.float32),
        edge_v=np.asarray([0, 0, size], np.float32),
        radiance=np.asarray(radiance, np.float32),
    )


class PathTracedMaterialModel:
    """Path-traced renderer of the recovered materials under novel lights."""

    def __init__(
        self,
        mesh,
        albedo_tex: np.ndarray,
        roughness_tex: np.ndarray,
        lights: List[QuadLight],
        max_bounces: int = 3,
        spp: int = 64,
        leaf_width: int = 4,
    ):
        from texir_code_tpu.geometry.bvh import build_bvh
        from texir_code_tpu.ops.raycast import DeviceBVH

        self.mesh = mesh
        flat = build_bvh(mesh.vertices, mesh.faces, leaf_width=leaf_width)
        self.bvh = DeviceBVH.from_flat(flat)
        tuv = mesh.triangle_uvs()
        self.uv_u = jnp.asarray(np.ascontiguousarray(tuv[:, 0]))
        self.uv_v = jnp.asarray(np.ascontiguousarray(tuv[:, 1]))
        if mesh.vertex_normals is None:
            mesh.compute_vertex_normals()
        vn = mesh.vertex_normals[mesh.faces]  # [F, 3, 3]
        self.nrm_corners = tuple(
            tuple(jnp.asarray(np.ascontiguousarray(vn[:, c, k])) for c in range(3))
            for k in range(3)
        )
        self.albedo = jnp.asarray(albedo_tex)
        self.roughness = jnp.asarray(roughness_tex)
        self.lights = lights
        self.max_bounces = max_bounces
        self.spp = spp
        self._l_corner = jnp.asarray(np.stack([l.corner for l in lights]))
        self._l_eu = jnp.asarray(np.stack([l.edge_u for l in lights]))
        self._l_ev = jnp.asarray(np.stack([l.edge_v for l in lights]))
        self._l_rad = jnp.asarray(np.stack([l.radiance for l in lights]))
        self._l_area = jnp.asarray(np.stack([l.area for l in lights]))
        self._l_nrm = jnp.asarray(np.stack([l.normal for l in lights]))

    # ------------------------------------------------------------------
    def _surface(self, hit):
        """Hit → (uv-sampled albedo [B,3], roughness [B], shading normal
        3×[B], valid)."""
        valid = jnp.isfinite(hit.t) & (hit.prim >= 0)
        prim = jnp.where(valid, hit.prim, 0)
        u = jnp.clip(hit.u, 0.0, 1.0)
        v = jnp.clip(hit.v, 0.0, 1.0)
        w0 = 1.0 - u - v
        base = prim * 3
        uu = (
            jnp.take(self.uv_u, base) * w0
            + jnp.take(self.uv_u, base + 1) * u
            + jnp.take(self.uv_u, base + 2) * v
        )
        vv = (
            jnp.take(self.uv_v, base) * w0
            + jnp.take(self.uv_v, base + 1) * u
            + jnp.take(self.uv_v, base + 2) * v
        )
        uv = jnp.stack([uu, vv], axis=-1)
        albedo = bilinear_sample(self.albedo, uv, boundary="clamp")
        rough = bilinear_sample(self.roughness, uv, boundary="clamp")[..., 0]
        n = tuple(
            jnp.take(self.nrm_corners[k][0], prim) * w0
            + jnp.take(self.nrm_corners[k][1], prim) * u
            + jnp.take(self.nrm_corners[k][2], prim) * v
            for k in range(3)
        )
        inv = jax.lax.rsqrt(sum(c * c for c in n) + 1e-20)
        n = tuple(c * inv for c in n)
        return albedo, rough, n, valid

    def _direct_light(self, pts, n, view, albedo, rough, key):
        """NEE: one uniform sample on every light, shadow-tested."""
        b = pts[0].shape[0]
        total = jnp.zeros((b, 3))
        for li in range(len(self.lights)):
            k1, k2, key = jax.random.split(key, 3)
            su = jax.random.uniform(k1, (b,))
            sv = jax.random.uniform(k2, (b,))
            lp = tuple(
                self._l_corner[li, k]
                + su * self._l_eu[li, k]
                + sv * self._l_ev[li, k]
                for k in range(3)
            )
            wi = tuple(lp[k] - pts[k] for k in range(3))
            dist2 = sum(w * w for w in wi) + 1e-12
            dist = jnp.sqrt(dist2)
            wi = tuple(w / dist for w in wi)
            ndl = jnp.clip(sum(n[k] * wi[k] for k in range(3)), 0.0, 1.0)
            # light faces its -normal side too (double-sided emitter)
            cos_l = jnp.abs(sum(self._l_nrm[li, k] * wi[k] for k in range(3)))
            # shadow ray
            shadow = cast_rays_soa(self.bvh, pts, wi, t_min=1e-4)
            unoccluded = ~jnp.isfinite(shadow.t) | (shadow.t > dist - 1e-3)
            # BRDF: diffuse + Cook-Torrance specular toward the light
            h = tuple(wi[k] + view[k] for k in range(3))
            hn = jax.lax.rsqrt(sum(c * c for c in h) + 1e-20)
            h = tuple(c * hn for c in h)
            ndh = jnp.clip(sum(n[k] * h[k] for k in range(3)), 0.0, 1.0)
            ndv = jnp.clip(sum(n[k] * view[k] for k in range(3)), 0.0, 1.0)
            vdh = jnp.clip(sum(view[k] * h[k] for k in range(3)), 0.0, 1.0)
            f = shading.fresnel_schlick_ue4(vdh[:, None])[:, 0]
            d_term = shading.ggx_d(ndh[:, None], rough[:, None])[:, 0]
            g_term = shading.smith_g(ndv[:, None], ndl[:, None], rough[:, None])[:, 0]
            spec = f * d_term * g_term / jnp.clip(4 * ndl * ndv, 1e-7, None)
            brdf = albedo / jnp.pi + spec[:, None]
            geom = ndl * cos_l / dist2 * self._l_area[li]
            contrib = self._l_rad[li][None, :] * brdf * (geom * unoccluded)[:, None]
            total = total + contrib
        return total

    @partial(jax.jit, static_argnames=("self",))
    def trace(self, origins, dirs, key):
        """Path-trace a flat SoA ray batch → radiance [B, 3]."""
        b = origins[0].shape[0]
        radiance = jnp.zeros((b, 3))
        throughput = jnp.ones((b, 3))
        alive = jnp.ones((b,), bool)
        o, d = origins, dirs

        for bounce in range(self.max_bounces):
            hit = cast_rays_soa(self.bvh, o, d, t_min=1e-4)
            albedo, rough, n, valid = self._surface(hit)
            alive = alive & valid
            t_safe = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
            pts = tuple(o[k] + t_safe * d[k] for k in range(3))
            # face-forward the shading normal against the incoming ray
            ndi = sum(n[k] * d[k] for k in range(3))
            n = tuple(jnp.where(ndi > 0, -c, c) for c in n)
            view = tuple(-c for c in d)

            key, k_nee, k_b = jax.random.split(key, 3)
            direct = self._direct_light(pts, n, view, albedo, rough, k_nee)
            radiance = radiance + throughput * direct * alive[:, None]

            if bounce + 1 == self.max_bounces:
                break
            # cosine-sampled diffuse bounce: throughput *= albedo
            nd = generate_dir_soa(n, 1, k_b, mode="cosine", pre_mode="independent")
            d = tuple(c[:, 0] for c in nd)
            o = tuple(pts[k] + 1e-4 * n[k] for k in range(3))
            throughput = throughput * albedo * alive[:, None]

        return radiance

    def render_pano(self, cam_position, res: Tuple[int, int], key) -> np.ndarray:
        """Pano render at `spp` paths/pixel, averaged."""
        from texir_code_tpu.data.export import pano_dirs

        h, w = res
        d_np = pano_dirs(h, w).reshape(-1, 3)
        b = d_np.shape[0]
        d = tuple(jnp.asarray(np.ascontiguousarray(d_np[:, k])) for k in range(3))
        o = tuple(jnp.full((b,), float(cam_position[k])) for k in range(3))
        acc = np.zeros((b, 3), np.float64)
        for s in range(self.spp):
            out = self.trace(o, d, jax.random.fold_in(key, s))
            acc += np.asarray(out, np.float64)
        return (acc / self.spp).astype(np.float32).reshape(h, w, 3)
