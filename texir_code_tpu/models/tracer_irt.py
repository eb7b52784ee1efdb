"""IrT — Monte-Carlo irradiance-texture baking (stage IrrT).

TPU-native rebuild of reference models/tracer_o3d_irt.py:35-269 with a
cleaner geometry path: the reference reconstructs per-texel positions by
rasterizing position cubemaps per camera, warping them to panos, and decoding
a packed "index texture" asset (:99-142, the 0.png ÷50000 scheme tied to its
scan pipeline).  Here per-texel world positions/normals come from a direct
texture-space rasterization of the uv-unwrapped mesh — exact, asset-free,
and identical in effect (unmapped texels stay invalid and bake to zero,
matching the reference's seam zeroing at :177-178).

The bake itself is the reference's estimator — S uniform hemisphere samples
per texel, irradiance = Σ L·ndl·2π/S (:156-174) — streamed through the chip
in fixed-size texel batches (the 512-texel batching at :156-161 becomes a
device-side lax.map over padded batches; multi-chip sharding splits the
texel axis).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.models.tbl import TBL, query_tbl_soa
from texir_code_tpu.ops.sampling import generate_dir_soa
from texir_code_tpu.ops.shading import irradiance_estimator_soa


def bake_irradiance_soa(
    tbl: TBL,
    points,
    normals,
    texel_ids: jnp.ndarray,
    seed: jnp.ndarray,
    spp: int,
    surface_eps: float,
    fan_scene=None,
    max_leaves: int = 768,
    exact: bool = True,
):
    """Core SoA bake: points/normals 3×[B] → irradiance 3×[B].

    Shared by the single-chip baker and the shard_map'ped multi-chip baker —
    per-texel RNG keys are derived from the *global* texel id, so any batch
    split or device sharding yields bit-identical results.

    With `fan_scene` the rays go through the shared-origin fan tracer with
    tangent-plane culling (each texel is one fan); otherwise the skip-link
    per-ray traversal."""
    from texir_code_tpu.models.tbl import query_tbl_fans

    row_keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
    )(texel_ids)
    dirs = generate_dir_soa(
        normals, spp, jax.random.PRNGKey(seed), mode="uniform", row_keys=row_keys
    )
    b = points[0].shape[0]
    if fan_scene is not None:
        origins = tuple(points[k] + surface_eps * normals[k] for k in range(3))
        lighting = query_tbl_fans(
            tbl, fan_scene, origins, dirs, fan_normals=normals,
            max_leaves=max_leaves, exact=exact,
        )
    else:
        origins = tuple(
            jnp.broadcast_to(
                (points[k] + surface_eps * normals[k])[:, None], (b, spp)
            )
            for k in range(3)
        )
        lighting = query_tbl_soa(tbl, origins, dirs)
    return irradiance_estimator_soa(lighting, dirs, normals, spp)


def morton_order(points: np.ndarray) -> np.ndarray:
    """argsort of [N, 3] points by 30-bit Morton code of quantized position.

    Bake batches are built from atlas texels in raster order — consecutive
    texels of a scan-scale chart can lie METERS apart in world space, which
    ruins the culled tracer's per-block origin boxes (a block spanning the
    whole building culls nothing).  Sorting texels in Morton order makes
    every kernel block a tight spatial neighborhood; the estimator result is
    unchanged (per-texel scatter-back) and stays deterministic."""
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    q = ((points - lo) / np.maximum(hi - lo, 1e-9) * 1023.0).astype(np.uint64)

    def spread(x):
        x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
        return x

    code = (
        spread(q[:, 0])
        | (spread(q[:, 1]) << np.uint64(1))
        | (spread(q[:, 2]) << np.uint64(2))
    )
    return np.argsort(code, kind="stable")


@dataclasses.dataclass
class GeometryTextures:
    """Per-texel geometry of the uv atlas."""

    position: np.ndarray  # [R, R, 3] world position at the texel center
    normal: np.ndarray    # [R, R, 3] shading normal
    valid: np.ndarray     # [R, R] bool — texel is covered by a triangle


def bake_geometry_textures(
    mesh, res: int, offset: float = 0.0, use_native: bool = True
) -> GeometryTextures:
    """Texture-space rasterization: world position/normal per atlas texel.

    For every triangle, texels whose centers fall inside its uv footprint get
    barycentric-interpolated world position and vertex normal.  Dispatches to
    the C++ rasterizer (texir_code_tpu.native) when available; this numpy
    loop is the fallback and oracle.

    Args:
        mesh: geometry.Mesh with uvs and vertex normals.
        res: atlas resolution (reference bakes 1024,
            models/tracer_o3d_irt.py:95).
        offset: displace positions by offset·normal (bake-time surface
            epsilon; the reference offsets at trace time instead).
    """
    if use_native and offset == 0.0:
        from texir_code_tpu import native

        g = native.bake_geometry_native(mesh, res)
        if g is not None:
            return g
    if mesh.vertex_normals is None:
        mesh.compute_vertex_normals()
    position = np.zeros((res, res, 3), np.float32)
    normal = np.zeros((res, res, 3), np.float32)
    valid = np.zeros((res, res), bool)

    tri_uv = mesh.triangle_uvs().reshape(-1, 3, 2) * res - 0.5  # texel coords
    tri_pos = mesh.triangle_corners()
    tri_nrm = mesh.vertex_normals[mesh.faces]

    for f in range(mesh.num_faces):
        uv = tri_uv[f]
        lo = np.maximum(np.floor(uv.min(axis=0)).astype(int), 0)
        hi = np.minimum(np.ceil(uv.max(axis=0)).astype(int) + 1, res)
        if (hi <= lo).any():
            continue
        xs = np.arange(lo[0], hi[0])
        ys = np.arange(lo[1], hi[1])
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        p = np.stack([gx, gy], axis=-1).astype(np.float32)  # texel centers
        # barycentrics of p in the uv triangle
        a, b, c = uv[0], uv[1], uv[2]
        v0, v1 = b - a, c - a
        v2 = p - a
        d00 = v0 @ v0
        d01 = v0 @ v1
        d11 = v1 @ v1
        denom = d00 * d11 - d01 * d01
        if abs(denom) < 1e-12:
            continue
        d20 = v2 @ v0
        d21 = v2 @ v1
        u = (d11 * d20 - d01 * d21) / denom
        v = (d00 * d21 - d01 * d20) / denom
        w = 1.0 - u - v
        inside = (u >= -1e-6) & (v >= -1e-6) & (w >= -1e-6)
        if not inside.any():
            continue
        pos = (
            w[..., None] * tri_pos[f, 0]
            + u[..., None] * tri_pos[f, 1]
            + v[..., None] * tri_pos[f, 2]
        )
        nrm = (
            w[..., None] * tri_nrm[f, 0]
            + u[..., None] * tri_nrm[f, 1]
            + v[..., None] * tri_nrm[f, 2]
        )
        nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        rows, cols = gy[inside], gx[inside]
        position[rows, cols] = pos[inside] + offset * nrm[inside]
        normal[rows, cols] = nrm[inside]
        valid[rows, cols] = True
    return GeometryTextures(position=position, normal=normal, valid=valid)


class IrradianceTextureBaker:
    """One-shot MC bake of the irradiance texture (reference :145-180)."""

    def __init__(
        self,
        tbl: TBL,
        spp: int = 2048,
        texel_batch: int = 4096,
        surface_eps: float = 1e-2,
        fan_scene=None,
        max_leaves: int = 768,
        cluster_scene=None,
        wedges: int = 4,
        pallas_interpret: bool = False,
    ):
        """Args:
            tbl: lighting scene.
            spp: uniform hemisphere samples per texel (train.sample_light[0],
                2048 in configs/hdrhouse_ir_texture.conf).
            texel_batch: texels processed per device step (the reference's
                512-texel batches, sized up for TPU occupancy).
            surface_eps: ray-origin offset along the normal.
            fan_scene: optional ops.fan_raycast.FanScene enabling the
                shared-origin fan fast path (one fan per texel).
            max_leaves: fan-path per-texel leaf budget.
            cluster_scene: optional ops.pallas_culled.ClusterScene enabling
                the culled, early-exiting kernel (preferred on scan-scale
                meshes; exact).  Takes precedence over fan_scene on TPU.
            wedges: direction wedges per texel for the culled path
                (spp/wedges must be a multiple of 128).
            pallas_interpret: run Pallas kernels in interpreter mode (CPU
                tests of the TPU code path).
        """
        self.tbl = tbl
        self.spp = spp
        self.texel_batch = texel_batch
        self.surface_eps = surface_eps
        self.fan_scene = fan_scene
        self.max_leaves = max_leaves
        self.cluster_scene = cluster_scene
        self.wedges = wedges
        self.pallas_interpret = pallas_interpret
        # 'octant': runtime octant sort (world-sign-pure chunks — the
        # culling boxes are world-axis-aligned, so this beats the zero-cost
        # azimuth-sorted-table variant, measured); 'azimuth': u2-sorted table.
        self.chunk_mode = "octant"
        self.fan_block = 32
        # rows per independent early-exit group in the culled kernel
        # (0 = one block-wide exit).  Measured (scripts/sweep_exit_rows.py):
        # 2 groups/block (+10%) on short candidate lists (apartment fb32 →
        # exit_rows=16); any split LOSES on long lists (building) because
        # each group re-streams the shared candidate DMA.  Conservative
        # default: block-wide.
        self.exit_rows = 0
        # texel batches folded into one dispatch (lax.map superbatch);
        # amortizes the per-dispatch host round trip in full bakes
        self.batches_per_dispatch = 4
        # two-pass trace (ops.pallas_culled.cast_fans_culled_twopass):
        # truncate the candidate walk at two_pass_cut x scene diameter,
        # lane-compact the ~2% of rays that provably need far clusters,
        # re-trace them densely.  Exact; pays ~2x on multi-room scenes
        # where worst-ray exit gating dominates (scripts/twopass_estimate:
        # building visit ratio 0.48 at cut=0.3); None = single pass.
        self.two_pass_cut: Optional[float] = None
        self.two_pass_cap = 0.125
        # optional second level (3-pass ladder): the straggler re-trace
        # itself truncates at two_pass_cut2 and re-compacts its own tail
        self.two_pass_cut2: Optional[float] = None
        # candidate-window streaming (ops.pallas_culled cast_fans_culled
        # stream_cands): None = auto (streams when the per-block SMEM
        # tables would blow SMEM — the fine-exit-group regime)
        self.stream_cands: Optional[int] = None
        self.two_pass_cap2 = 0.25
        # occlusion proxy (ops.pallas_culled.ClusterScene.proxy_from_fan):
        # the scene's k largest triangles, traced first to seed per-ray t
        # upper bounds — each exit group's occlusion exit then fires at the
        # walls of its own room instead of streaming the scene's far tail.
        # Exact; pays on multi-room scans (like two_pass_cut, which it can
        # replace or compose with).  None = off.
        self.proxy_scene = None
        # proven rectangular occluders (geometry.occluders.extract_occluders):
        # host-precomputed PVS — clusters provably behind a fully-covered
        # wall rectangle are dropped from the candidate lists at cull time.
        # Exact (bit-equal hits); the structural fix for the behind-wall
        # candidate mass on multi-room scans (PERF.md round 4).  None = off.
        self.occluders = None
        # Interpolate the hit's atlas uv inside the culled kernel (rows carry
        # per-triangle uv coefficients) instead of a post-pass barycentric
        # uv lerp.  Measured on v5e: the 6-gather uv lerp is a *dependent*
        # gather chain behind the prim id and costs ~2x the kernel's extra
        # per-test FMAs — emit_uv wins ~35% end-to-end (PERF.md round 2).
        self.emit_uv = True
        # RGBE-packed atlas for the uv-emitting kernel path (same precision
        # class as the .hdr files the atlas is loaded from)
        from texir_code_tpu.models.tbl import rgbe_pack, rgbe_prefilter
        from texir_code_tpu.ops.fan_raycast import FAN_ROW_WIDTH_UV

        self._rgbe = rgbe_pack(jnp.stack(tbl.planes, axis=-1))
        # 2x-supersampled prefiltered atlas: radiance fetch in ONE u32
        # gather (bilinear snapped to the nearest half-texel) instead of 4.
        # XLA's TPU gather issues ~0.13 G elem/s regardless of layout or
        # coherence (scripts/gather_micro*.py), so gather COUNT is the cost;
        # set rgbe_supersample=0 for the exact-bilinear fetch.
        self.rgbe_supersample = 2
        self._rgbe_pre = rgbe_prefilter(tbl.planes, 2)
        self._fan_has_uv = (
            fan_scene is not None
            and fan_scene.rows.shape[1] >= FAN_ROW_WIDTH_UV
        )

    def _use_device_kernels(self) -> bool:
        import jax as _jax

        return self.pallas_interpret or _jax.default_backend() != "cpu"

    @partial(jax.jit, static_argnames=("self",))
    def _bake_batch_culled(self, points, normals, texel_ids, seed):
        return self._bake_culled_impl(points, normals, texel_ids, seed)

    def _bake_culled_impl(self, points, normals, texel_ids, seed):
        """Culled wedge path — fully traceable (shard_map-safe), exact.

        One texel = one fan; its spp directions are octant-sorted and split
        into `wedges` rows; hits come from the early-exiting cluster kernel
        (ops.pallas_culled); radiance is one RGBE bilinear fetch per ray
        when the cluster rows carry uv coefficients."""
        from texir_code_tpu.ops.pallas_culled import (
            cast_fans_culled,
            sort_dirs_octant,
            tile_rows,
            wedge_rows,
        )

        nrm = tuple(normals[:, k] for k in range(3))
        g = self.wedges
        if self.chunk_mode == "azimuth":
            from texir_code_tpu.ops.sampling import hammersley_azimuth_sorted

            ds = self._fan_dirs(
                nrm, texel_ids, seed, base=hammersley_azimuth_sorted(self.spp)
            )
        else:
            dirs = self._fan_dirs(nrm, texel_ids, seed)
            ds = sort_dirs_octant(dirs)
        rows_d = tuple(wedge_rows(a, g) for a in ds)
        origins = tuple(
            points[:, k] + self.surface_eps * normals[:, k] for k in range(3)
        )
        rows_o = tuple(tile_rows(a, g) for a in origins)
        emit_uv = bool(self.emit_uv and self.cluster_scene.has_uv)
        if self.two_pass_cut is not None:
            from texir_code_tpu.ops.pallas_culled import (
                cast_fans_culled_twopass,
            )

            hit = cast_fans_culled_twopass(
                self.cluster_scene, rows_o, rows_d,
                emit_uv=emit_uv,
                interpret=self.pallas_interpret,
                fan_block=self.fan_block,
                exit_rows=self.exit_rows,
                cut_frac=self.two_pass_cut,
                cap_frac=self.two_pass_cap,
                proxy=self.proxy_scene,
                cut_frac2=self.two_pass_cut2,
                cap_frac2=self.two_pass_cap2,
                occluders=self.occluders,
                stream_cands=self.stream_cands,
            )
        else:
            hit = cast_fans_culled(
                self.cluster_scene, rows_o, rows_d,
                emit_uv=emit_uv,
                interpret=self.pallas_interpret,
                fan_block=self.fan_block,
                exit_rows=self.exit_rows,
                proxy=self.proxy_scene,
                occluders=self.occluders,
                stream_cands=self.stream_cands,
            )
        rows_n = tuple(tile_rows(a, g) for a in nrm)
        if emit_uv:
            part = self._fan_estimate_uv(hit.t, hit.u, hit.v, rows_d, rows_n)
        else:
            part = self._fan_estimate_prim_rgbe(
                hit.t, hit.prim, hit.u, hit.v, rows_d, rows_n
            )
        t = points.shape[0]
        return part.reshape(g, t, 3).sum(axis=0)

    @partial(jax.jit, static_argnames=("self",))
    def _bake_superbatch_culled(self, points, normals, texel_ids, seed):
        """K batches in ONE dispatch: lax.map over the leading axis.

        Shapes [K, B, 3]/[K, B].  Sequential per-batch compute (lax.map is
        a scan), but a single dispatch: the axon-relay/host round trip and
        per-call argument upload are paid once per K batches instead of per
        batch — measured a large win on big scenes (PERF.md round 2).
        """
        return jax.lax.map(
            lambda a: self._bake_culled_impl(a[0], a[1], a[2], seed),
            (points, normals, texel_ids),
        )

    @partial(jax.jit, static_argnames=("self",))
    def _bake_batch_traversal(self, points, normals, texel_ids, seed):
        return jnp.stack(
            bake_irradiance_soa(
                self.tbl,
                tuple(points[:, k] for k in range(3)),
                tuple(normals[:, k] for k in range(3)),
                texel_ids, seed, self.spp, self.surface_eps,
            ),
            axis=-1,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _fan_dirs(self, normals_soa, texel_ids, seed, base=None):
        row_keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
        )(texel_ids)
        return generate_dir_soa(
            normals_soa, self.spp, jax.random.PRNGKey(seed), mode="uniform",
            row_keys=row_keys, base=base,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _fan_estimate_uv(self, hit_t, uu, vv, dirs, normals_soa):
        """Estimator for the uv-emitting kernel: the hit's atlas uv is
        already interpolated, radiance is one RGBE fetch (prefiltered
        supersampled atlas: 1 gather; rgbe_supersample=0 → exact bilinear:
        4 gathers)."""
        from texir_code_tpu.models.tbl import bilinear_rgbe, nearest_rgbe

        valid = jnp.isfinite(hit_t) & (hit_t > 1e-4)
        if self.rgbe_supersample:
            r, g, b = nearest_rgbe(
                self._rgbe_pre, jnp.clip(uu, 0.0, 1.0), jnp.clip(vv, 0.0, 1.0)
            )
        else:
            r, g, b = bilinear_rgbe(
                self._rgbe, jnp.clip(uu, 0.0, 1.0), jnp.clip(vv, 0.0, 1.0)
            )
        z = jnp.zeros_like(r)
        lighting = (
            jnp.where(valid, r, z), jnp.where(valid, g, z), jnp.where(valid, b, z),
        )
        return jnp.stack(
            irradiance_estimator_soa(lighting, dirs, normals_soa, self.spp),
            axis=-1,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _fan_estimate_prim_rgbe(self, hit_t, hit_prim, hit_u, hit_v, dirs,
                                normals_soa):
        """Estimator from barycentric hits: per-corner uv lerp (6 gathers) +
        one RGBE bilinear fetch (4 gathers) per ray.  ~10 gathers/ray is far
        cheaper than interpolating atlas uv inside the kernel, where the 8
        extra VPU ops are paid per triangle TEST (tens of tests per ray)."""
        from texir_code_tpu.models.tbl import bilinear_rgbe

        valid = jnp.isfinite(hit_t) & (hit_t > 1e-4)
        prim = jnp.where(valid, hit_prim, 0)
        u = jnp.clip(hit_u, 0.0, 1.0)
        v = jnp.clip(hit_v, 0.0, 1.0)
        w0 = 1.0 - u - v
        base = prim * 3
        uu = (
            jnp.take(self.tbl.uv_u, base) * w0
            + jnp.take(self.tbl.uv_u, base + 1) * u
            + jnp.take(self.tbl.uv_u, base + 2) * v
        )
        vv = (
            jnp.take(self.tbl.uv_v, base) * w0
            + jnp.take(self.tbl.uv_v, base + 1) * u
            + jnp.take(self.tbl.uv_v, base + 2) * v
        )
        r, g, b = bilinear_rgbe(
            self._rgbe, jnp.clip(uu, 0.0, 1.0), jnp.clip(vv, 0.0, 1.0)
        )
        z = jnp.zeros_like(r)
        lighting = (
            jnp.where(valid, r, z), jnp.where(valid, g, z), jnp.where(valid, b, z),
        )
        return jnp.stack(
            irradiance_estimator_soa(lighting, dirs, normals_soa, self.spp),
            axis=-1,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _fan_estimate(self, hit_t, hit_prim, hit_u, hit_v, dirs, normals_soa):
        from texir_code_tpu.models.tbl import radiance_from_hit
        from texir_code_tpu.ops.raycast import RayHit

        lighting = radiance_from_hit(
            self.tbl, RayHit(t=hit_t, prim=hit_prim, u=hit_u, v=hit_v)
        )
        return jnp.stack(
            irradiance_estimator_soa(lighting, dirs, normals_soa, self.spp),
            axis=-1,
        )

    def bake_batch(
        self,
        points: jnp.ndarray,
        normals: jnp.ndarray,
        texel_ids: jnp.ndarray,
        seed: jnp.ndarray,
    ) -> jnp.ndarray:
        """Irradiance for one flat batch of texels: [B, 3] → [B, 3].

        RNG is a pure function of (seed, global texel id), so results are
        bit-identical however the texel axis is batched or sharded.  The
        whole chain runs SoA (component arrays) — the [B·S, 3] layouts the
        AoS form would materialize pad 3 → 128 lanes on TPU.

        When a fan scene is configured, each texel becomes one shared-origin
        ray fan (tangent-plane culled, exact via overflow fallback); with a
        cluster scene the culled early-exit kernel runs instead."""
        if self.cluster_scene is not None and self._use_device_kernels():
            return self._bake_batch_culled(points, normals, texel_ids, seed)
        if self.fan_scene is None:
            return self._bake_batch_traversal(points, normals, texel_ids, seed)

        import jax as _jax

        from texir_code_tpu.ops.fan_raycast import cast_ray_fans_exact

        nrm = tuple(normals[:, k] for k in range(3))
        dirs = self._fan_dirs(nrm, texel_ids, seed)
        origins = tuple(
            points[:, k] + self.surface_eps * normals[:, k] for k in range(3)
        )
        exhaustive = self.max_leaves >= self.fan_scene.num_leaves
        if exhaustive and self._use_device_kernels():
            # exhaustive leaf stream on the Pallas kernel (zero gathers,
            # VMEM-resident state) — ~4× the XLA stream on v5e; with uv rows
            # the kernel also interpolates the atlas uv, leaving a single
            # RGBE bilinear fetch per ray
            from texir_code_tpu.ops.pallas_fan import cast_ray_fans_pallas

            hit = cast_ray_fans_pallas(
                self.fan_scene, origins, dirs, t_min=0.0,
                fan_block=8, leaf_block=32, emit_uv=self._fan_has_uv,
                interpret=self.pallas_interpret,
            )
            if self._fan_has_uv:
                return self._fan_estimate_uv(hit.t, hit.u, hit.v, dirs, nrm)
        else:
            hit = cast_ray_fans_exact(
                self.fan_scene, self.tbl.bvh, origins, dirs, t_min=0.0,
                max_leaves=self.max_leaves, fan_normals=nrm,
            )
        return self._fan_estimate(hit.t, hit.prim, hit.u, hit.v, dirs, nrm)

    def bake(
        self,
        geom: GeometryTextures,
        key: jax.Array,
        progress: bool = False,
    ) -> np.ndarray:
        """Full-texture bake: [R, R, 3] irradiance; invalid texels zero.

        Streams texel batches through `bake_batch`; total rays =
        valid_texels × spp (the reference's 1024² × 2048 ≈ 2.1 G rays)."""
        res = geom.position.shape[0]
        vr, vc = np.nonzero(geom.valid)
        # spatially coherent batches (see morton_order)
        order = morton_order(geom.position[vr, vc])
        vr, vc = vr[order], vc[order]
        pts = jnp.asarray(geom.position[vr, vc])
        nrm = jnp.asarray(geom.normal[vr, vc])
        n = pts.shape[0]
        bs = self.texel_batch
        nb = (n + bs - 1) // bs
        pad = nb * bs - n
        if pad:
            pts = jnp.concatenate([pts, jnp.zeros((pad, 3))])
            nrm = jnp.concatenate(
                [nrm, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))]
            )
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        ids = jnp.arange(nb * bs, dtype=jnp.int32)
        out = np.zeros((n + pad, 3), np.float32)
        kd = self.batches_per_dispatch
        use_super = (
            kd > 1
            and self.cluster_scene is not None
            and self._use_device_kernels()
        )
        i = 0
        while i < nb:
            k = min(kd, nb - i) if use_super else 1
            sl = slice(i * bs, (i + k) * bs)
            if k > 1:
                out[sl] = np.asarray(
                    self._bake_superbatch_culled(
                        pts[sl].reshape(k, bs, 3), nrm[sl].reshape(k, bs, 3),
                        ids[sl].reshape(k, bs), seed,
                    )
                ).reshape(k * bs, 3)
            else:
                out[sl] = np.asarray(
                    self.bake_batch(pts[sl], nrm[sl], ids[sl], seed)
                )
            i += k
            if progress and (i // k) % 16 == 0:
                print(f"bake: {i}/{nb} batches")
        tex = np.zeros((res, res, 3), np.float32)
        tex[vr, vc] = out[:n]
        return tex
