"""TBL — Texture-Based Lighting: the scene's own HDR atlas as the emitter.

TexIR's core lighting representation: incident radiance along any ray is the
HDR texture of the scan mesh at the ray's hit point.  The reference
implements this as `query_irf` — a GPU→CPU→Embree→GPU round trip per batch
(reference models/mat_nvdiffrast.py:292-320, models/tracer_o3d_irrf.py:88-115,
models/tracer_o3d_irt.py:240-269).  Here the whole query is one fused
on-device chain: BVH cast → per-corner uv gather → barycentric lerp →
bilinear atlas fetch → miss masking.

Conventions copied from the reference:
  * hits with t ≤ 1e-4 (or misses) contribute zero radiance
    (models/mat_nvdiffrast.py:299,317-318) — rays are cast with t_min=0 so a
    sub-epsilon hit still occludes, then masked;
  * barycentric uv clipped to [0,1] (:303);
  * atlas fetched bilinearly with border padding at grid (2u-1, 2v-1)
    (:313-316) — equivalent here to `bilinear_sample(texture, (u, v))` with
    clamp boundary, with the atlas stored v-up (loaders flip; the reference
    flips with cv2.flip(texture, 0) at :90).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from texir_code_tpu.ops.raycast import DeviceBVH, cast_rays
from texir_code_tpu.ops.shading import rgb_to_intensity
from texir_code_tpu.ops.texture import bilinear_sample


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TBL:
    """Device-side texture-based-lighting scene.

    Attributes:
        bvh: DeviceBVH over the emitter mesh.
        triangle_uvs: [F*3, 2] per-corner uvs (Open3D layout; see
            geometry.mesh.Mesh.triangle_uvs).
        texture: [H, W, 3] HDR atlas, already exposure-scaled
            (reference multiplies by 2**hdr_exposure at load,
            models/mat_nvdiffrast.py:93) and stored v-up.
    """

    bvh: DeviceBVH
    triangle_uvs: jnp.ndarray
    texture: jnp.ndarray

    def tree_flatten(self):
        return (self.bvh, self.triangle_uvs, self.texture), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    def with_texture(self, texture: jnp.ndarray) -> "TBL":
        return TBL(self.bvh, self.triangle_uvs, texture)


def build_tbl(mesh, texture, hdr_exposure: float = 0.0, leaf_width: int = 4) -> TBL:
    """Host-side constructor: mesh + HDR atlas → device TBL.

    Args:
        mesh: geometry.Mesh with uvs.
        texture: [H, W, 3] float32 HDR atlas, v-up row order.
        hdr_exposure: multiplies the atlas by 2**hdr_exposure.
    """
    from texir_code_tpu.geometry.bvh import build_bvh

    bvh = DeviceBVH.from_flat(build_bvh(mesh.vertices, mesh.faces, leaf_width=leaf_width))
    tex = jnp.asarray(texture) * (2.0 ** hdr_exposure)
    return TBL(bvh=bvh, triangle_uvs=jnp.asarray(mesh.triangle_uvs()), texture=tex)


def vhl_texture(texture: jnp.ndarray, hdr_exposure: float) -> jnp.ndarray:
    """Virtual-highlight emitter: keep only light-source texels.

    The reference's stage -1 trick (models/mat_nvdiffrast.py:142-145): texels
    whose *unexposed* intensity ≥ 0.5 keep their radiance, everything else
    goes black — rendering with this emitter localizes specular highlights.
    """
    intensity = rgb_to_intensity(texture * (2.0 ** -hdr_exposure))
    return jnp.where(intensity >= 0.5, texture, 0.0)


def query_tbl(
    tbl: TBL,
    points: jnp.ndarray,
    dirs: jnp.ndarray,
    t_valid: float = 1e-4,
) -> jnp.ndarray:
    """Incident radiance arriving at `points` from directions `dirs`.

    The fused `query_irf` equivalent.

    Args:
        tbl: lighting scene.
        points: [B, 3] ray origins (pre-offset by ε·normal at call sites,
            exactly as the reference does).
        dirs: [B, 3] ray directions.
        t_valid: hits at t ≤ this report zero radiance (reference :299).
    Returns:
        [B, 3] radiance (zero for misses/invalid hits).  Not differentiable
        w.r.t. anything — lighting is detached in the reference too.
    """
    hit = cast_rays(tbl.bvh, points, dirs, t_min=0.0)
    valid = jnp.isfinite(hit.t) & (hit.t > t_valid)

    prim = jnp.where(valid, hit.prim, 0)
    u = jnp.clip(hit.u, 0.0, 1.0)
    v = jnp.clip(hit.v, 0.0, 1.0)

    base = prim * 3
    t0 = jnp.take(tbl.triangle_uvs, base, axis=0)
    t1 = jnp.take(tbl.triangle_uvs, base + 1, axis=0)
    t2 = jnp.take(tbl.triangle_uvs, base + 2, axis=0)
    w0 = (1.0 - u - v)[..., None]
    uv = t0 * w0 + t1 * u[..., None] + t2 * v[..., None]

    radiance = bilinear_sample(tbl.texture, uv, boundary="clamp")
    return jnp.where(valid[..., None], radiance, 0.0)


def query_tbl_multi(
    tbl: TBL,
    points: jnp.ndarray,
    dirs: jnp.ndarray,
    t_valid: float = 1e-4,
) -> jnp.ndarray:
    """Batched-sample variant: points [B, 3], dirs [B, S, 3] → [B, S, 3]."""
    b, s, _ = dirs.shape
    flat_pts = jnp.broadcast_to(points[:, None, :], (b, s, 3)).reshape(-1, 3)
    flat_dirs = dirs.reshape(-1, 3)
    out = query_tbl(tbl, flat_pts, flat_dirs, t_valid)
    return out.reshape(b, s, 3)
