"""TBL — Texture-Based Lighting: the scene's own HDR atlas as the emitter.

TexIR's core lighting representation: incident radiance along any ray is the
HDR texture of the scan mesh at the ray's hit point.  The reference
implements this as `query_irf` — a GPU→CPU→Embree→GPU round trip per batch
(reference models/mat_nvdiffrast.py:292-320, models/tracer_o3d_irrf.py:88-115,
models/tracer_o3d_irt.py:240-269).  Here the whole query is one fused
on-device chain: BVH cast → per-corner uv gather → barycentric lerp →
bilinear atlas fetch → miss masking.

Layout: SoA throughout (see ops.raycast) — per-corner uvs as separate [F*3]
u/v arrays, the atlas as three [H, W] channel planes, radiance returned as
three [B]/[B, S] planes.  [N, 2]/[N, 3] arrays would pad their minor dim to
128 lanes on TPU and blow HBM at bake scale.

Conventions copied from the reference:
  * hits with t ≤ 1e-4 (or misses) contribute zero radiance
    (models/mat_nvdiffrast.py:299,317-318) — rays are cast with t_min=0 so a
    sub-epsilon hit still occludes, then masked;
  * barycentric uv clipped to [0,1] (:303);
  * atlas fetched bilinearly with border padding (:313-316), the atlas
    stored v-up (loaders flip, as the reference's cv2.flip at :90).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.ops.raycast import DeviceBVH, Vec3s, cast_rays_soa
from texir_code_tpu.ops.shading import rgb_to_intensity


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TBL:
    """Device-side texture-based-lighting scene.

    Attributes:
        bvh: DeviceBVH over the emitter mesh (SoA).
        uv_u, uv_v: [F*3] per-corner uv components (Open3D triangle_uvs
            layout, indexed prim*3+k as in models/mat_nvdiffrast.py:307-310).
        planes: three [H, W] HDR atlas channel planes, exposure-scaled
            (reference multiplies by 2**hdr_exposure at load, :93), v-up.
    """

    bvh: DeviceBVH
    uv_u: jnp.ndarray
    uv_v: jnp.ndarray
    planes: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]

    def tree_flatten(self):
        return (self.bvh, self.uv_u, self.uv_v, self.planes), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def texture(self) -> jnp.ndarray:
        """[H, W, 3] AoS view of the atlas (host/debug use)."""
        return jnp.stack(self.planes, axis=-1)

    def with_texture(self, texture: jnp.ndarray) -> "TBL":
        """Replace the atlas ([H, W, 3])."""
        planes = tuple(texture[..., k] for k in range(3))
        return TBL(self.bvh, self.uv_u, self.uv_v, planes)


def build_tbl_from_flat(flat_bvh, mesh, texture, hdr_exposure: float = 0.0) -> TBL:
    """TBL from a pre-built FlatBVH (lets callers share one build between
    the TBL, FanScene, and TiledScene)."""
    tuv = mesh.triangle_uvs()
    tex = np.asarray(texture, np.float32) * (2.0 ** hdr_exposure)
    return TBL(
        bvh=DeviceBVH.from_flat(flat_bvh),
        uv_u=jnp.asarray(np.ascontiguousarray(tuv[:, 0])),
        uv_v=jnp.asarray(np.ascontiguousarray(tuv[:, 1])),
        planes=tuple(jnp.asarray(np.ascontiguousarray(tex[..., k])) for k in range(3)),
    )


def build_tbl(mesh, texture, hdr_exposure: float = 0.0, leaf_width: int = 4) -> TBL:
    """Host-side constructor: mesh + HDR atlas → device TBL.

    Args:
        mesh: geometry.Mesh with uvs.
        texture: [H, W, 3] float32 HDR atlas, v-up row order.
        hdr_exposure: multiplies the atlas by 2**hdr_exposure.
    """
    from texir_code_tpu.geometry.bvh import build_bvh

    flat = build_bvh(mesh.vertices, mesh.faces, leaf_width=leaf_width)
    return build_tbl_from_flat(flat, mesh, texture, hdr_exposure)


def vhl_texture(texture: jnp.ndarray, hdr_exposure: float) -> jnp.ndarray:
    """Virtual-highlight emitter: keep only light-source texels.

    The reference's stage -1 trick (models/mat_nvdiffrast.py:142-145): texels
    whose *unexposed* intensity ≥ 0.5 keep their radiance, everything else
    goes black — rendering with this emitter localizes specular highlights.
    """
    intensity = rgb_to_intensity(texture * (2.0 ** -hdr_exposure))
    return jnp.where(intensity >= 0.5, texture, 0.0)


def rgbe_pack(texture: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] float radiance → [H, W] uint32 RGBE (shared exponent).

    The Radiance .hdr encoding the reference's atlases are stored in on
    disk — so querying through RGBE loses nothing relative to the
    reference's own inputs, while cutting TBL gather traffic 3×."""
    maxc = jnp.maximum(jnp.max(texture, axis=-1), 1e-32)
    exp = jnp.ceil(jnp.log2(maxc)).astype(jnp.int32)
    scale = jnp.exp2(-exp.astype(jnp.float32)) * 255.0
    q = jnp.clip(
        (texture * scale[..., None]).astype(jnp.int32), 0, 255
    ).astype(jnp.uint32)
    e = jnp.clip(exp + 128, 0, 255).astype(jnp.uint32)
    nonzero = jnp.max(texture, axis=-1) > 1e-30
    packed = (
        q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (e << 24)
    )
    return jnp.where(nonzero, packed, 0)


def rgbe_decode(packed: jnp.ndarray):
    """uint32 RGBE → (r, g, b) float planes."""
    e = (packed >> 24) & jnp.uint32(0xFF)
    scale = jnp.where(
        packed == 0, 0.0,
        jnp.exp2(e.astype(jnp.float32) - 128.0) / 255.0,
    )
    r = ((packed) & jnp.uint32(0xFF)).astype(jnp.float32) * scale
    g = ((packed >> 8) & jnp.uint32(0xFF)).astype(jnp.float32) * scale
    b = ((packed >> 16) & jnp.uint32(0xFF)).astype(jnp.float32) * scale
    return r, g, b


def bilinear_rgbe(packed: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear HDR fetch from an RGBE-packed [H, W] atlas (4 u32 gathers
    instead of 12 f32 gathers), clamp boundary."""
    h, w = packed.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    flat = packed.reshape(-1)
    outs = []
    c00 = rgbe_decode(jnp.take(flat, y0i * w + x0i))
    c01 = rgbe_decode(jnp.take(flat, y0i * w + x1i))
    c10 = rgbe_decode(jnp.take(flat, y1i * w + x0i))
    c11 = rgbe_decode(jnp.take(flat, y1i * w + x1i))
    for k in range(3):
        top = c00[k] * (1 - fx) + c01[k] * fx
        bot = c10[k] * (1 - fx) + c11[k] * fx
        outs.append(top * (1 - fy) + bot * fy)
    return tuple(outs)


def rgbe_prefilter(planes, factor: int = 2) -> jnp.ndarray:
    """Prefiltered RGBE atlas: [f·H, f·W] u32 whose entry (i, j) is the
    EXACT bilinear value of `planes` at the supersample center
    ((j+0.5)/fW, (i+0.5)/fH) — so a nearest fetch from it equals a bilinear
    fetch snapped to the nearest half-texel (error ≤ the bilinear variation
    over 1/(2f) texel, beneath the RGBE mantissa at f=2; measured numbers in
    PERF.md round 2).  Cuts the radiance lookup from 4 gathers to 1 — the
    dominant cost at the measured ~0.13 G elem/s XLA gather rate.

    Args:
        planes: 3-tuple of [H, W] float planes (TBL.planes layout).
    """
    h, w = planes[0].shape
    fh, fw = factor * h, factor * w
    u = (jnp.arange(fw, dtype=jnp.float32) + 0.5) / fw
    v = (jnp.arange(fh, dtype=jnp.float32) + 0.5) / fh
    uu, vv = jnp.meshgrid(u, v)
    vals = _bilinear_planes(tuple(planes), uu.reshape(-1), vv.reshape(-1))
    tex = jnp.stack([x.reshape(fh, fw) for x in vals], axis=-1)
    return rgbe_pack(tex)


def nearest_rgbe(packed: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Nearest HDR fetch from an RGBE atlas (1 u32 gather).  On a
    rgbe_prefilter-ed atlas this is a half-texel-snapped bilinear fetch."""
    h, w = packed.shape
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return rgbe_decode(jnp.take(packed.reshape(-1), y * w + x))


def _bilinear_planes(
    planes: Tuple[jnp.ndarray, ...], u: jnp.ndarray, v: jnp.ndarray
) -> Tuple[jnp.ndarray, ...]:
    """Bilinear fetch of channel planes at uv (clamp boundary), SoA."""
    h, w = planes[0].shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    i00 = y0i * w + x0i
    i01 = y0i * w + x1i
    i10 = y1i * w + x0i
    i11 = y1i * w + x1i

    outs = []
    for p in planes:
        flat = p.reshape(-1)
        top = jnp.take(flat, i00) * (1 - fx) + jnp.take(flat, i01) * fx
        bot = jnp.take(flat, i10) * (1 - fx) + jnp.take(flat, i11) * fx
        outs.append(top * (1 - fy) + bot * fy)
    return tuple(outs)


def radiance_from_hit(tbl: TBL, hit, t_valid: float = 1e-4):
    """Hit record → emitted radiance: per-corner uv lerp + bilinear atlas
    fetch, masked for misses and sub-epsilon hits (reference :299-318)."""
    valid = jnp.isfinite(hit.t) & (hit.t > t_valid)

    prim = jnp.where(valid, hit.prim, 0)
    u = jnp.clip(hit.u, 0.0, 1.0)
    v = jnp.clip(hit.v, 0.0, 1.0)
    w0 = 1.0 - u - v

    base = prim * 3
    uu = (
        jnp.take(tbl.uv_u, base) * w0
        + jnp.take(tbl.uv_u, base + 1) * u
        + jnp.take(tbl.uv_u, base + 2) * v
    )
    vv = (
        jnp.take(tbl.uv_v, base) * w0
        + jnp.take(tbl.uv_v, base + 1) * u
        + jnp.take(tbl.uv_v, base + 2) * v
    )

    r, g, b = _bilinear_planes(tbl.planes, uu, vv)
    z = jnp.zeros_like(r)
    return (
        jnp.where(valid, r, z),
        jnp.where(valid, g, z),
        jnp.where(valid, b, z),
    )


def query_tbl_soa(
    tbl: TBL,
    points: Vec3s,
    dirs: Vec3s,
    t_valid: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Incident radiance along rays, fully SoA (the fused `query_irf`).

    Args:
        points: 3×[...] ray origins (pre-offset by ε·normal at call sites).
        dirs: 3×[...] ray directions (same shape as points).
        t_valid: hits at t ≤ this report zero radiance (reference :299).
    Returns:
        (r, g, b) planes shaped like points[0]; zero for misses.  Not
        differentiable — lighting is detached in the reference too.
    """
    hit = cast_rays_soa(tbl.bvh, points, dirs, t_min=0.0)
    return radiance_from_hit(tbl, hit, t_valid)


def query_tbl_fans(
    tbl: TBL,
    fan_scene,
    origins: Vec3s,
    dirs: Vec3s,
    fan_normals: Vec3s = None,
    t_valid: float = 1e-4,
    max_leaves: int = 512,
    exact: bool = True,
):
    """Fan-structured TBL query: T shared origins × R directions.

    The bake / primary-visibility fast path (see ops.fan_raycast).

    Args:
        origins: 3×[T]; dirs: 3×[T, R]; fan_normals: optional hemisphere axes
            for tangent-plane culling.
        exact: re-trace overflowing fans with the skip-link traversal
            (host sync per call); False = flag-and-ignore (benchmarks only).
    Returns:
        (r, g, b) each [T, R].
    """
    from texir_code_tpu.ops.fan_raycast import cast_ray_fans, cast_ray_fans_exact

    if exact:
        hit = cast_ray_fans_exact(
            fan_scene, tbl.bvh, origins, dirs, t_min=0.0,
            max_leaves=max_leaves, fan_normals=fan_normals,
        )
    else:
        hit = cast_ray_fans(
            fan_scene, origins, dirs, t_min=0.0, max_leaves=max_leaves,
            fan_normals=fan_normals,
        )
    return radiance_from_hit(tbl, hit, t_valid)


def _row_split(n: int, max_r: int = 2048) -> int:
    """Largest multiple-of-128 row width dividing n (kernel [T, R] layout)."""
    r = min(max_r, n)
    r -= r % 128
    while r > 128 and n % r:
        r -= 128
    return r


def query_tbl_stream(
    tbl: TBL,
    fan_scene,
    origins,
    dirs,
    t_valid: float = 1e-4,
    rgbe_pre: Optional[jnp.ndarray] = None,
    cluster_scene=None,
    fan_block: int = 8,
    exit_rows: int = 0,
    row_width: int = 2048,
    two_pass_cut: Optional[float] = None,
    two_pass_cap: float = 0.125,
    proxy=None,
    occluders=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """TBL query on the Pallas per-ray kernels.

    The fast path for bulk secondary rays (specular MC, live-MC diffuse)
    when a FanScene is available and the backend is TPU; callers fall back
    to query_tbl_soa on CPU.  Same semantics as query_tbl_soa.

    Args:
        origins / dirs: 3-tuples of same-shape arrays (any shape whose total
            size is a multiple of 128).
        rgbe_pre: optional rgbe_prefilter-ed atlas.  When given and the fan
            scene carries uv rows, the kernel interpolates the hit's atlas
            uv and radiance is ONE u32 gather per ray instead of the
            18-gather dependent chain of radiance_from_hit (XLA's TPU
            gather issues ~0.13 G elem/s — see PERF.md round 2).
        cluster_scene: optional ops.pallas_culled.ClusterScene.  When given,
            rays run on the culled per-ray kernel (candidate lists from
            per-row origin boxes + occlusion early exit) instead of the
            exhaustive leaf stream — exact, and sub-linear in scene size;
            rows of raster-consecutive pixels give it tight origin boxes.
    """
    from texir_code_tpu.ops.fan_raycast import FAN_ROW_WIDTH_UV
    from texir_code_tpu.ops.pallas_fan import (
        cast_rays_pallas_stream,
        resolve_interpret,
    )

    shape = origins[0].shape
    total = int(np.prod(shape))
    r = _row_split(total, row_width)
    rows = total // r
    if cluster_scene is not None:
        from texir_code_tpu.ops.pallas_culled import cast_fans_culled

        emit_uv = rgbe_pre is not None and cluster_scene.has_uv
        if two_pass_cut is not None:
            from texir_code_tpu.ops.pallas_culled import (
                cast_fans_culled_twopass,
            )

            hit = cast_fans_culled_twopass(
                cluster_scene,
                tuple(o.reshape(rows, r) for o in origins),
                tuple(d.reshape(rows, r) for d in dirs),
                per_ray=True,
                fan_block=fan_block,
                exit_rows=exit_rows,
                emit_uv=emit_uv,
                interpret=resolve_interpret(),
                cut_frac=two_pass_cut,
                cap_frac=two_pass_cap,
                proxy=proxy,
                occluders=occluders,
            )
        else:
            hit = cast_fans_culled(
                cluster_scene,
                tuple(o.reshape(rows, r) for o in origins),
                tuple(d.reshape(rows, r) for d in dirs),
                per_ray=True,
                fan_block=fan_block,
                exit_rows=exit_rows,
                emit_uv=emit_uv,
                interpret=resolve_interpret(),
                proxy=proxy,
                occluders=occluders,
            )
    else:
        emit_uv = (
            rgbe_pre is not None
            and fan_scene.rows.shape[1] >= FAN_ROW_WIDTH_UV
        )
        hit = cast_rays_pallas_stream(
            fan_scene,
            tuple(o.reshape(rows, r) for o in origins),
            tuple(d.reshape(rows, r) for d in dirs),
            t_min=0.0,
            emit_uv=emit_uv,
            interpret=resolve_interpret(),
        )
    if emit_uv:
        valid = jnp.isfinite(hit.t) & (hit.t > t_valid)
        rr, gg, bb = nearest_rgbe(
            rgbe_pre, jnp.clip(hit.u, 0.0, 1.0), jnp.clip(hit.v, 0.0, 1.0)
        )
        z = jnp.zeros_like(rr)
        out = (
            jnp.where(valid, rr, z),
            jnp.where(valid, gg, z),
            jnp.where(valid, bb, z),
        )
    else:
        out = radiance_from_hit(tbl, hit, t_valid)
    return tuple(x.reshape(shape) for x in out)


def query_tbl_auto(
    tbl: TBL,
    fan_scene,
    origins,
    dirs,
    t_valid: float = 1e-4,
    rgbe_pre: Optional[jnp.ndarray] = None,
    cluster_scene=None,
    fan_block: int = 8,
    exit_rows: int = 0,
    row_width: int = 2048,
    two_pass_cut: Optional[float] = None,
    two_pass_cap: float = 0.125,
    proxy=None,
    occluders=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dispatch: Pallas culled/stream kernels on TPU (when a scene is given
    and shapes divide by 128), XLA skip-link traversal otherwise."""
    import jax as _jax

    from texir_code_tpu.ops.pallas_fan import force_pallas_dispatch

    total = int(np.prod(origins[0].shape))
    if (
        fan_scene is not None
        and (_jax.default_backend() != "cpu" or force_pallas_dispatch())
        and total % 128 == 0
    ):
        return query_tbl_stream(
            tbl, fan_scene, origins, dirs, t_valid, rgbe_pre=rgbe_pre,
            cluster_scene=cluster_scene, fan_block=fan_block,
            exit_rows=exit_rows, row_width=row_width,
            two_pass_cut=two_pass_cut, two_pass_cap=two_pass_cap,
            proxy=proxy, occluders=occluders,
        )
    return query_tbl_soa(tbl, origins, dirs, t_valid)


def query_tbl(
    tbl: TBL,
    points: jnp.ndarray,
    dirs: jnp.ndarray,
    t_valid: float = 1e-4,
) -> jnp.ndarray:
    """AoS wrapper: points/dirs [B, 3] → radiance [B, 3]."""
    out = query_tbl_soa(
        tbl,
        (points[..., 0], points[..., 1], points[..., 2]),
        (dirs[..., 0], dirs[..., 1], dirs[..., 2]),
        t_valid,
    )
    return jnp.stack(out, axis=-1)


def query_tbl_multi(
    tbl: TBL,
    points: jnp.ndarray,
    dirs: jnp.ndarray,
    t_valid: float = 1e-4,
) -> jnp.ndarray:
    """AoS batched-sample wrapper: points [B, 3], dirs [B, S, 3] → [B, S, 3]."""
    b, s, _ = dirs.shape
    pts = tuple(jnp.broadcast_to(points[:, None, k], (b, s)) for k in range(3))
    dd = tuple(dirs[..., k] for k in range(3))
    out = query_tbl_soa(tbl, pts, dd, t_valid)
    return jnp.stack(out, axis=-1)
