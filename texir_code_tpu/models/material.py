"""MaterialModel — the TexIR SVBRDF texture optimizer (the flagship model).

TPU-native rebuild of reference models/mat_nvdiffrast.py:35-320.  One jitted
function per stage computes, entirely on device:

    G-buffer (ray-cast cube faces)                 [was dr.rasterize+interp]
    mip-sampled albedo / roughness / IrT fetches   [was dr.texture ×4]
    diffuse  = IrT · albedo / π
    specular = GGX importance MC against the TBL   [was query_irf CPU round
               (16 rays/px by default)              trip + BRDF math]

Stage schedule (reference forward, models/mat_nvdiffrast.py:141-190):
    -1: VHL pass — emitter restricted to light-source texels, albedo=0,
        roughness=0.01 → virtual-highlight image used to build masks.
     0: Lambertian-only albedo init: rgb = irr·albedo/π.
     1: roughness-only: albedo detached, *non-mipmapped* roughness drives
        shading, highlight-masked loss.
     2: joint: both live, mipmapped.

Only the texture fetches and the BRDF chain are differentiable; G-buffers
and light directions are stop_gradient-ed exactly where the reference
detaches (:149,179,182,239).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from texir_code_tpu.models.tbl import TBL, build_tbl, query_tbl_soa, vhl_texture
from texir_code_tpu.ops import shading
from texir_code_tpu.ops.gbuffer import DeviceMesh, GBuffer, render_gbuffer
from texir_code_tpu.ops.sampling import generate_dir_soa, reflect_soa
from texir_code_tpu.ops.texture import (
    build_mip_pyramid,
    bilinear_sample,
    compute_lod,
    texture_sample,
)


@dataclasses.dataclass
class MaterialParams:
    """Learnable SVBRDF atlases (an optax-compatible pytree)."""

    albedo: jnp.ndarray     # [Ra, Ra, 3], init 0.5 (reference :68)
    roughness: jnp.ndarray  # [Rr, Rr, 1], init 0.1 (reference :69)


jax.tree_util.register_pytree_node(
    MaterialParams,
    lambda p: ((p.albedo, p.roughness), None),
    lambda _, l: MaterialParams(*l),
)


# Conf-tunable kernel-shape knobs (models.render.* in .conf files) and their
# measured per-scene defaults.  The defaults are APARTMENT-tuned (9k tris,
# convex rooms); multi-room scan meshes prefer different values — see the
# sweep tables in PERF.md.  `None` entries mean "keep the model default".
RENDER_KNOBS = (
    # specular TBL trace (query_tbl_stream): apartment optimum er=1 rw=1024;
    # two_pass_cut ~0.25-0.3 pays only on multi-room scenes (PERF.md round 3)
    "spec_fan_block", "spec_exit_rows", "spec_row_width",
    "spec_two_pass_cut", "spec_two_pass_cap",
    # occlusion proxy (k largest tris seed per-ray t bounds; 0 = off)
    "proxy_k",
    # proven rectangular occluders (geometry.occluders): host-precomputed
    # PVS that drops provably-behind-wall clusters from candidate lists —
    # exact; pays on multi-room scenes
    "use_occluders",
    # stochastic (one-level) mip sampling during training steps: unbiased
    # estimator of trilinear that halves texture gathers + scatter-adds
    "mip_stochastic",
    # stochastic bilinear on top (one CORNER per tap): 8x cut vs trilinear
    "bilinear_stochastic",
    # primary-visibility G-buffer kernel shape (er=1 LOSES here; PERF.md)
    "gbuf_fan_block", "gbuf_exit_rows", "gbuf_row_width",
    # 'prefiltered' (1 u32 gather/ray) or 'exact' bilinear radiance fetch
    "specular_fetch",
    # pixel-chunked shading for high-spp eval (reference split_input)
    "shade_chunk",
)


def render_knobs_from_conf(conf) -> Dict:
    """Collect models.render.* kernel knobs from a conf (VERDICT r2 #7: the
    per-scene kernel shapes must be expressible in .conf files, not only as
    mutable attributes)."""
    knobs = {}
    for name in RENDER_KNOBS:
        val = conf.get(f"models.render.{name}", None)
        if val is not None:
            knobs[name] = val
    lb = conf.get("models.render.cluster_lb", None)
    if lb is not None:
        knobs["cluster_lb"] = int(lb)
    return knobs


def init_material_params(
    albedo_res: int = 2048, roughness_res: int = 4096
) -> MaterialParams:
    return MaterialParams(
        albedo=jnp.full((albedo_res, albedo_res, 3), 0.5, jnp.float32),
        roughness=jnp.full((roughness_res, roughness_res, 1), 0.1, jnp.float32),
    )


def clamp_material_params(
    params: MaterialParams,
    rough_min: float = 1e-2,
    rough_max: float = 0.8,
) -> MaterialParams:
    """Post-step projection (reference trainer/train_material.py:458,592):
    roughness ∈ [1e-2, 0.8], albedo ≥ 0."""
    return MaterialParams(
        albedo=jnp.maximum(params.albedo, 0.0),
        roughness=jnp.clip(params.roughness, rough_min, rough_max),
    )


class MaterialModel:
    """Differentiable cube-map SVBRDF renderer over a fixed scene.

    Host-side object holding device scene constants; `forward` is pure in
    (params, mvp, cam_position, key) and jitted per stage.
    """

    def __init__(
        self,
        mesh,
        hdr_texture: np.ndarray,
        irt_texture: np.ndarray,
        pano_res: Tuple[int, int] = (256, 512),
        sample_light: Tuple[int, int] = (32, 16),
        sample_type: Tuple[str, str] = ("uniform", "importance"),
        hdr_exposure: float = 0.0,
        max_mip_level: Optional[int] = None,
        leaf_width: int = 4,
        spmd_mesh=None,
        atlas_mesh=None,
        cluster_lb: int = 8,
        render_knobs: Optional[Dict] = None,
    ):
        """Args mirror the reference config knobs:

        pano_res: train.pano_img_res; cube_res = pano_res[1]//4 (reference :45)
        sample_light: (diffuse spp, specular spp) — diffuse unused with IrT
        hdr_exposure: train.hdr_exposure (scales the TBL atlas)
        max_mip_level: defaults to get_mip_level(8192)=13 (reference :65)
        spmd_mesh: optional jax.sharding.Mesh with a RAY_AXIS axis — the
            forward pass then runs SPMD over the pixel axis: primary rays,
            texture sampling, and specular shading are shard_map-ped with
            replicated parameters, so the backward pass produces per-device
            partial atlas gradients that XLA psums over ICI (the data-parallel
            contract of SURVEY §2.2).  Results are bit-identical to the
            unsharded forward (per-pixel RNG is keyed by global pixel id).
        atlas_mesh: optional jax.sharding.Mesh with an ATLAS_AXIS axis —
            tensor parallelism over the material atlases instead: parameters,
            optimizer state, gradients, and the in-step mip pyramids are
            row-sharded 1/D per chip (textures beyond one chip's HBM,
            SURVEY §2.2 third axis), lookups assembled by a psum over ICI
            (parallel/atlas_tp.py).  Mutually exclusive with spmd_mesh.
        """
        self.cube_res = int(pano_res[1] // 4)
        self.sample_light = tuple(sample_light)
        self.sample_type = tuple(sample_type)
        self.hdr_exposure = float(hdr_exposure)
        self.max_mip_level = (
            max_mip_level if max_mip_level is not None else shading.get_mip_level(8192)
        )

        self.mesh = mesh
        self.device_mesh = DeviceMesh.from_mesh(mesh)
        from texir_code_tpu.geometry.bvh import build_bvh
        from texir_code_tpu.models.tbl import build_tbl_from_flat
        from texir_code_tpu.ops.fan_raycast import FanScene

        flat = build_bvh(mesh.vertices, mesh.faces, leaf_width=leaf_width)
        self.tbl = build_tbl_from_flat(flat, mesh, hdr_texture, hdr_exposure)
        self.tbl_vhl = self.tbl.with_texture(
            vhl_texture(self.tbl.texture, hdr_exposure)
        )
        # uv-carrying rows: the stream kernel interpolates the hit's atlas
        # uv so specular radiance is one prefiltered-RGBE gather per ray
        # (specular_fetch below) instead of an 18-gather dependent chain
        self.fan_scene = FanScene.from_flat(
            flat, triangle_uvs=mesh.triangle_uvs()
        )
        # culled per-ray kernel for bulk secondary rays: candidate cluster
        # lists from per-row origin boxes + occlusion early exit (exact,
        # sub-linear in scene size; ops/pallas_culled.py)
        from texir_code_tpu.ops.pallas_culled import ClusterScene

        cluster_lb = (render_knobs or {}).get("cluster_lb", cluster_lb)
        self.cluster_scene = ClusterScene.from_fan(
            self.fan_scene, lb=cluster_lb, dense=True
        )
        # 'prefiltered': half-texel-snapped RGBE-quantized bilinear, 1 u32
        # gather/ray (the fetch is outside the gradient path — radiance is
        # parameter-independent — so this only adds noise far below the
        # 16-spp MC variance); 'exact': f32 bilinear via radiance_from_hit.
        self.specular_fetch = "prefiltered"
        # specular trace kernel shape (query_tbl_stream): rows of
        # row_width/sample_light[1] raster-consecutive pixels; exit_rows=1
        # gives every row its OWN candidate list and occlusion exit —
        # specular reflections off a flat surface patch are coherent per
        # 64-pixel row but wildly incoherent across rows, so per-row
        # adaptivity beats the block-wide exit 2.87 -> 4.10 iters/s while
        # er=2/4 LOSE (cross-row gating + re-walk).  Swept on TPU:
        # rw 256/512/1024/2048 -> 3.43/3.86/4.10/3.70 (PERF.md round 3).
        self.spec_fan_block = 8
        self.spec_exit_rows = 1
        self.spec_row_width = 1024
        # two-pass specular trace (cast_fans_culled_twopass): truncated
        # walk + compacted straggler re-trace; None = single pass
        self.spec_two_pass_cut = None
        self.spec_two_pass_cap = 0.125
        # primary-visibility (G-buffer) kernel shape
        self.gbuf_fan_block = 8
        self.gbuf_exit_rows = 0
        self.gbuf_row_width = 2048
        # occlusion proxy: pre-trace rays against the scene's k largest
        # triangles to seed per-ray t upper bounds in the culled kernels
        # (exact; pays on multi-room scans — ClusterScene.proxy_from_fan)
        self.proxy_k = 0
        # proven rectangular occluders (geometry.occluders) for the culled
        # kernels' candidate lists — exact host-precomputed PVS
        self.use_occluders = False
        # stochastic-LOD mip sampling (ops.texture.texture_sample rng=):
        # ONE level per tap, hi with probability frac(lod) — an unbiased
        # estimator of linear-mipmap-linear that halves the texture
        # gather/scatter volume (the sampler backward is ~1/3 of a Mat
        # step, PERF.md round 3).  Training-step noise class: well under
        # the 16-spp specular MC variance.  Off = exact nvdiffrast parity.
        self.mip_stochastic = False
        # stochastic BILINEAR on top of stochastic LOD: ONE gather per
        # texture tap (corner x1/y1 picked with probability fx/fy) — an 8x
        # cut vs exact trilinear on both the forward gathers and the
        # backward scatter-adds.  Unbiased; requires mip_stochastic.
        self.bilinear_stochastic = False
        from texir_code_tpu.models.tbl import rgbe_prefilter

        self._rgbe_pre = rgbe_prefilter(self.tbl.planes, 2)
        self._rgbe_pre_vhl = rgbe_prefilter(self.tbl_vhl.planes, 2)
        self.irt = jnp.asarray(irt_texture)
        # the IrT atlas is constant during Mat training: build its mip
        # pyramid once here instead of inside every jitted step (the albedo
        # and roughness pyramids must stay in-step — they are differentiable
        # functions of the parameters)
        self.irt_pyramid = build_mip_pyramid(self.irt, None)

        # On TPU, primary visibility and specular rays run on the Pallas
        # leaf-stream kernels (see ops/pallas_fan.py and PERF.md); the XLA
        # skip-link traversal remains the CPU/test path.
        import jax as _jax

        from texir_code_tpu.ops.pallas_fan import force_pallas_dispatch

        self.use_pallas = (
            _jax.default_backend() != "cpu" or force_pallas_dispatch()
        )
        if spmd_mesh is not None and atlas_mesh is not None:
            raise ValueError("spmd_mesh and atlas_mesh are mutually exclusive")
        self.spmd_mesh = spmd_mesh
        self.atlas_mesh = atlas_mesh
        # pixel-chunked shading for high-spp evaluation (the reference's
        # split_input at 2000 px, utils/general.py:28-58); None = one shot.
        self.shade_chunk: Optional[int] = None
        # conf-surface overrides (models.render.* knobs — see
        # render_knobs_from_conf); applied last so confs can retune the
        # per-scene kernel shapes documented above.
        for k, v in (render_knobs or {}).items():
            if k == "cluster_lb":
                continue  # consumed above (ClusterScene construction)
            if not hasattr(self, k):
                raise ValueError(f"unknown render knob: {k}")
            setattr(self, k, v)
        if self.bilinear_stochastic and not self.mip_stochastic:
            raise ValueError(
                "bilinear_stochastic requires mip_stochastic=True (the "
                "corner uniforms ride the stochastic-LOD rng columns; there "
                "is no exact-LOD + stochastic-bilinear path)"
            )
        if self.atlas_mesh is not None and (
            self.mip_stochastic or self.bilinear_stochastic
        ):
            import warnings

            warnings.warn(
                "stochastic sampling knobs are ignored under atlas tensor-"
                "parallelism: tp_sample_materials is exact-trilinear (no "
                "rng); the forward skips drawing the unused uniforms"
            )
        self.proxy_scene = (
            ClusterScene.proxy_from_fan(self.fan_scene, k=int(self.proxy_k))
            if self.proxy_k else None
        )
        self.occluders = None
        if self.use_occluders:
            from texir_code_tpu.geometry.occluders import extract_occluders

            self.occluders = extract_occluders(mesh)

        self._jitted = {}

    # -- public API --------------------------------------------------------

    def forward(
        self,
        params: MaterialParams,
        mvp: jnp.ndarray,
        cam_position: jnp.ndarray,
        stage: int,
        key: jax.Array,
    ) -> Dict[str, jnp.ndarray]:
        """Render one camera's 6 cube faces at `cube_res`.

        Args:
            params: MaterialParams.
            mvp: [6, 4, 4] transposed MVPs.
            cam_position: [3].
            stage: -1 (VHL) / 0 / 1 / 2.
            key: PRNG key for the specular sample shift.
        Returns:
            dict with rgb, albedo, roughness, roughness_womipmap, normal,
            position, empty_mask — shapes [6, res, res, C].
        """
        fn = self._jitted.get(stage)
        if fn is None:
            fn = jax.jit(partial(self._forward, stage=stage))
            self._jitted[stage] = fn
        return fn(params, mvp, cam_position, key)

    # -- implementation ----------------------------------------------------

    def _sample_materials(self, params: MaterialParams, uv_img: jnp.ndarray):
        """The reference's four dr.texture calls (:128-139)."""
        alb_pyr = build_mip_pyramid(params.albedo, self.max_mip_level)
        rgh_pyr = build_mip_pyramid(params.roughness, self.max_mip_level)
        irt_pyr = self.irt_pyramid

        lod_a = compute_lod(uv_img, params.albedo.shape[0], params.albedo.shape[1])
        lod_r = compute_lod(uv_img, params.roughness.shape[0], params.roughness.shape[1])
        lod_i = compute_lod(uv_img, self.irt.shape[0], self.irt.shape[1])

        albedo = texture_sample(alb_pyr, uv_img, lod_a)
        roughness = texture_sample(rgh_pyr, uv_img, lod_r)
        roughness_womip = bilinear_sample(params.roughness, uv_img)
        irr = texture_sample(irt_pyr, uv_img, lod_i)
        return albedo, roughness, roughness_womip, irr

    def _gbuffer(self, mvp: jnp.ndarray, cam_position: jnp.ndarray) -> GBuffer:
        """Primary visibility; the raycast is shard_map-ped over pixels when
        an SPMD mesh is configured."""
        if self.spmd_mesh is None:
            return render_gbuffer(
                self.device_mesh, self.tbl.bvh, mvp, cam_position,
                self.cube_res,
                fan_scene=self.fan_scene if self.use_pallas else None,
                cluster_scene=self.cluster_scene if self.use_pallas else None,
                fan_block=self.gbuf_fan_block,
                exit_rows=self.gbuf_exit_rows,
                row_width=self.gbuf_row_width,
                proxy=self.proxy_scene if self.use_pallas else None,
                occluders=self.occluders if self.use_pallas else None,
            )
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from texir_code_tpu.ops.gbuffer import (
            interpolate_attributes,
            ray_dirs_from_mvp,
        )
        from texir_code_tpu.ops.raycast import RayHit, cast_rays_soa
        from texir_code_tpu.parallel.mesh import RAY_AXIS

        res = self.cube_res
        nfaces = mvp.shape[0]
        dirs = ray_dirs_from_mvp(mvp, cam_position, res)
        flat = tuple(dirs[..., k].reshape(-1) for k in range(3))

        def device_fn(dx, dy, dz, cam):
            d = (dx, dy, dz)
            n = dx.shape[0]
            if self.use_pallas and n % 128 == 0:
                from texir_code_tpu.ops.pallas_culled import cast_fans_culled
                from texir_code_tpu.ops.pallas_fan import resolve_interpret

                r_split = min(2048, n)
                while n % r_split:
                    r_split -= 128
                rows = n // r_split
                h = cast_fans_culled(
                    self.cluster_scene,
                    tuple(jnp.broadcast_to(cam[k], (rows,)) for k in range(3)),
                    tuple(a.reshape(rows, r_split) for a in d),
                    t_min=1e-6,
                    fan_block=8,
                    interpret=resolve_interpret(),
                    proxy=self.proxy_scene,
                )
                return (
                    h.t.reshape(-1), h.prim.reshape(-1),
                    h.u.reshape(-1), h.v.reshape(-1),
                )
            origins = tuple(jnp.broadcast_to(cam[k], (n,)) for k in range(3))
            h = cast_rays_soa(self.tbl.bvh, origins, d, t_min=1e-6)
            return h.t, h.prim, h.u, h.v

        t, prim, u, v = shard_map(
            device_fn,
            mesh=self.spmd_mesh,
            in_specs=(P(RAY_AXIS),) * 3 + (P(),),
            out_specs=(P(RAY_AXIS),) * 4,
            check_vma=False,
        )(flat[0], flat[1], flat[2], cam_position)
        hit = RayHit(t=t, prim=prim, u=u, v=v)

        valid = hit.prim >= 0
        position, normal, uv = interpolate_attributes(self.device_mesh, hit)
        bg = jnp.array([1.0, 0.0, 0.0], position.dtype)
        position = jnp.where(valid[:, None], position, bg)
        normal = jnp.where(valid[:, None], normal, bg)
        uv = jnp.where(valid[:, None], uv, 0.0)
        shp = (nfaces, res, res)
        return GBuffer(
            position=position.reshape(shp + (3,)),
            normal=normal.reshape(shp + (3,)),
            uv=uv.reshape(shp + (2,)),
            prim=jnp.where(valid, hit.prim, -1).reshape(shp),
            mask=valid.astype(jnp.float32).reshape(shp + (1,)),
            t=hit.t.reshape(shp),
        )

    def _shade_flat(
        self,
        params: MaterialParams,
        uv: jnp.ndarray,          # [B, 2]
        lod_a: jnp.ndarray,       # [B]
        lod_r: jnp.ndarray,
        lod_i: jnp.ndarray,
        normal: jnp.ndarray,      # [B, 3]
        position: jnp.ndarray,    # [B, 3]
        spec_shift: jnp.ndarray,  # [B, 2] per-pixel toroidal sample shifts
        cam_position: jnp.ndarray,
        stage: int,
    ):
        """All differentiable per-pixel work on flat arrays: the four
        texture fetches (reference :128-139) + the stage's shading.  This is
        the shard_map body of the SPMD step — everything that produces
        parameter gradients lives here, so sharding the pixel axis shards
        the backward pass and the per-device partial atlas gradients get
        psum'd by the shard_map transpose."""
        alb_pyr = tuple(build_mip_pyramid(params.albedo, self.max_mip_level))
        rgh_pyr = tuple(build_mip_pyramid(params.roughness, self.max_mip_level))
        return self._shade_core(
            alb_pyr, rgh_pyr, params.roughness, uv, lod_a, lod_r, lod_i,
            normal, position, spec_shift, cam_position, stage,
        )

    def _shade_core(
        self, alb_pyr, rgh_pyr, rough_base, uv, lod_a, lod_r, lod_i,
        normal, position, spec_shift, cam_position, stage: int,
    ):
        """_shade_flat with prebuilt pyramids — the chunked-eval inner body
        (pyramids are hoisted out of the lax.map loop)."""
        # stochastic-LOD rng rides as spec_shift column 2 (per-global-pixel
        # keying — sharding/chunking invariant); drawn only when the knob
        # is on, so the default path's RNG stream is untouched.  Columns
        # 3-4 (present with bilinear_stochastic) are the corner uniforms.
        if spec_shift.shape[-1] > 4:
            rng = spec_shift[:, 2:5]
        elif spec_shift.shape[-1] > 2:
            rng = spec_shift[:, 2]
        else:
            rng = None
        albedo = texture_sample(alb_pyr, uv, lod_a, rng=rng)
        roughness = texture_sample(rgh_pyr, uv, lod_r, rng=rng)
        roughness_womip = bilinear_sample(rough_base, uv)
        irr = texture_sample(self.irt_pyramid, uv, lod_i, rng=rng)
        return self._stage_shade(
            albedo, roughness, roughness_womip, irr,
            normal, position, spec_shift, cam_position, stage,
        )

    def _stage_shade(
        self, albedo, roughness, roughness_womip, irr,
        normal, position, spec_shift, cam_position, stage: int,
    ):
        """Stage-dependent shading on already-sampled materials (the part of
        the reference forward after its dr.texture calls,
        models/mat_nvdiffrast.py:141-190)."""
        if stage == -1:
            rgb = self._render_flat(
                normal, jnp.zeros_like(albedo), jnp.full_like(roughness, 0.01),
                position + 1e-2 * normal, cam_position, irr, spec_shift,
                tbl=self.tbl_vhl,
            )
            albedo_out = jnp.zeros_like(albedo)
        elif stage == 0:
            rgb = shading.lambertian_diffuse(irr, albedo)
            albedo_out = albedo
        elif stage == 1:
            albedo_out = jax.lax.stop_gradient(albedo)
            rgb = self._render_flat(
                normal, albedo_out, roughness_womip,
                position + 1e-2 * normal, cam_position, irr, spec_shift,
            )
        elif stage == 2:
            rgb = self._render_flat(
                normal, albedo, roughness, position + 1e-2 * normal,
                cam_position, irr, spec_shift,
            )
            albedo_out = albedo
        else:
            raise ValueError(f"unknown stage: {stage}")
        return rgb, albedo_out, roughness, roughness_womip

    def precompute_view(
        self,
        params: MaterialParams,
        mvp: jnp.ndarray,
        cam_position: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Per-view constants of the training step: the primary G-buffer and
        the mip LODs depend only on (mvp, cam_position) — fixed across all
        training epochs — so the trainers hoist them out of the step (the
        primary trace is ~30% of a stage-2 step; PERF.md round 3).  `params`
        contributes only its static atlas shapes (LOD levels).  Feeding the
        result to `_forward(view=...)` is numerically equivalent to the
        uncached path — the same ops run on the same inputs, but in a
        separate jit, so XLA fusion choices may differ by ulps
        (tests/test_material.py pins the parity for Mat stage 2 and a head
        model at 1e-5)."""
        g = self._gbuffer(mvp, cam_position)
        normal = jax.lax.stop_gradient(g.normal)
        position = jax.lax.stop_gradient(g.position)
        uv_img = jax.lax.stop_gradient(g.uv)
        f, h, w, _ = normal.shape
        b = f * h * w
        lod_a = compute_lod(uv_img, params.albedo.shape[0], params.albedo.shape[1])
        lod_r = compute_lod(
            uv_img, params.roughness.shape[0], params.roughness.shape[1]
        )
        lod_i = compute_lod(uv_img, self.irt.shape[0], self.irt.shape[1])
        return {
            "uv": uv_img.reshape(b, 2),
            "lod_a": lod_a.reshape(b),
            "lod_r": lod_r.reshape(b),
            "lod_i": lod_i.reshape(b),
            "normal": normal,
            "position": position,
            "mask": g.mask,
        }

    def _forward(
        self,
        params: MaterialParams,
        mvp: jnp.ndarray,
        cam_position: jnp.ndarray,
        key: jax.Array,
        stage: int,
        view: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, jnp.ndarray]:
        if view is None:
            view = self.precompute_view(params, mvp, cam_position)
        # G-buffers are non-differentiable by construction here (ray cast,
        # see precompute_view), matching the reference's detach discipline.
        normal = view["normal"]
        position = view["position"]
        mask = view["mask"]

        f, h, w, _ = normal.shape
        b = f * h * w

        # per-pixel toroidal sample shift keyed by GLOBAL pixel id — the
        # specular MC draw is identical however the pixel axis is sharded
        row_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(b, dtype=jnp.int32)
        )
        # column 2 (drawn only with mip_stochastic, keeping the default RNG
        # stream bit-identical) is the stochastic-LOD uniform; columns 3-4
        # (bilinear_stochastic) are the corner uniforms (_shade_core).
        # Atlas-TP samples via tp_sample_materials (exact trilinear, no
        # rng), so the stochastic knobs draw nothing there (ADVICE r3).
        if self.atlas_mesh is not None:
            n_u = 2
        else:
            n_u = 5 if self.bilinear_stochastic else (3 if self.mip_stochastic else 2)
        spec_shift = jax.vmap(lambda k: jax.random.uniform(k, (n_u,)))(row_keys)

        args = (
            params,
            view["uv"],
            view["lod_a"], view["lod_r"], view["lod_i"],
            normal.reshape(b, 3), position.reshape(b, 3),
            spec_shift, cam_position,
        )
        if self.atlas_mesh is not None:
            from texir_code_tpu.parallel.atlas_tp import tp_sample_materials

            uv_flat = view["uv"]
            alb, rgh, womip = tp_sample_materials(
                self.atlas_mesh, params.albedo, params.roughness,
                uv_flat, view["lod_a"], view["lod_r"],
                self.max_mip_level,
            )
            irr = texture_sample(self.irt_pyramid, uv_flat, view["lod_i"])
            rgb, albedo, roughness, roughness_womip = self._stage_shade(
                alb, rgh, womip, irr,
                normal.reshape(b, 3), position.reshape(b, 3),
                spec_shift, cam_position, stage,
            )
        elif self.spmd_mesh is None and self.shade_chunk:
            from texir_code_tpu.ops.chunking import map_chunked

            alb_pyr = tuple(build_mip_pyramid(params.albedo, self.max_mip_level))
            rgh_pyr = tuple(
                build_mip_pyramid(params.roughness, self.max_mip_level)
            )

            def chunk_fn(a):
                return self._shade_core(
                    alb_pyr, rgh_pyr, params.roughness, *a,
                    cam_position=cam_position, stage=stage,
                )

            rgb, albedo, roughness, roughness_womip = map_chunked(
                chunk_fn, args[1:-1], self.shade_chunk
            )
        elif self.spmd_mesh is None:
            rgb, albedo, roughness, roughness_womip = self._shade_flat(
                *args, stage=stage
            )
        else:
            from functools import partial as _partial

            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from texir_code_tpu.parallel.mesh import RAY_AXIS

            sharded = P(RAY_AXIS)
            rgb, albedo, roughness, roughness_womip = shard_map(
                _partial(self._shade_flat, stage=stage),
                mesh=self.spmd_mesh,
                in_specs=(P(),) + (sharded,) * 7 + (P(),),
                out_specs=(sharded,) * 4,
                check_vma=False,
            )(*args)

        if stage == 0:
            position_out = position + 1e-1 * normal
        else:
            # reference offsets: +1e-2·n at render input, +2e-2·n on output
            position_out = jax.lax.stop_gradient(position + 3e-2 * normal)

        return {
            "rgb": rgb.reshape(f, h, w, 3),
            "albedo": albedo.reshape(f, h, w, 3),
            "normal": normal,
            "position": position_out,
            "empty_mask": mask,
            "roughness_womipmap": roughness_womip.reshape(f, h, w, 1),
            "roughness": roughness.reshape(f, h, w, 1),
        }

    def _render_flat(
        self,
        normal: jnp.ndarray,      # [B, 3]
        albedo: jnp.ndarray,      # [B, 3]
        roughness: jnp.ndarray,   # [B, 1]
        points: jnp.ndarray,      # [B, 3]
        cam_position: jnp.ndarray,
        irr: jnp.ndarray,         # [B, 3]
        spec_shift: jnp.ndarray,  # [B, 2]
        tbl: Optional[TBL] = None,
    ) -> jnp.ndarray:
        """Physically based shading on flat per-pixel arrays
        (reference models/mat_nvdiffrast.py:201-249): diffuse from IrT,
        specular by GGX-importance MC against the TBL.  Returns rgb [B, 3]."""
        tbl = tbl if tbl is not None else self.tbl
        b = normal.shape[0]
        # SoA hot path: component [B] / [B, S] arrays (see ops.raycast for
        # the TPU layout rationale)
        n = tuple(normal[:, k] for k in range(3))
        pts = tuple(points[:, k] for k in range(3))
        rgh = roughness.reshape(b)

        view = tuple(cam_position[k] - pts[k] for k in range(3))
        vnorm = jnp.maximum(
            jnp.sqrt(view[0] ** 2 + view[1] ** 2 + view[2] ** 2), 1e-4
        )
        view = tuple(view[k] / vnorm for k in range(3))

        diffuse = shading.lambertian_diffuse(irr, albedo)

        s_spec = self.sample_light[1]
        from texir_code_tpu.ops.sampling import (
            TINY_NUMBER,
            hammersley,
        )

        samples = jnp.clip(
            jnp.mod(hammersley(s_spec)[None] + spec_shift[:, None, :2], 1.0),
            TINY_NUMBER, 1.0 - TINY_NUMBER,
        )
        half = generate_dir_soa(
            n, s_spec, jax.random.PRNGKey(0), mode=self.sample_type[1],
            roughness=rgh, samples=samples,
        )
        light_dirs, _ = reflect_soa(view, half)
        spec_origins = tuple(
            jnp.broadcast_to(p[:, None], (b, s_spec)) for p in pts
        )
        # per-pixel-origin specular rays: Pallas stream kernel on TPU,
        # skip-link traversal on CPU
        from texir_code_tpu.models.tbl import query_tbl_auto

        rgbe_pre = None
        if self.specular_fetch == "prefiltered":
            rgbe_pre = (
                self._rgbe_pre_vhl if tbl is self.tbl_vhl else self._rgbe_pre
            )
        lighting = query_tbl_auto(
            tbl,
            self.fan_scene if self.use_pallas else None,
            spec_origins,
            tuple(jax.lax.stop_gradient(d) for d in light_dirs),
            rgbe_pre=rgbe_pre,
            cluster_scene=self.cluster_scene if self.use_pallas else None,
            fan_block=self.spec_fan_block,
            exit_rows=self.spec_exit_rows,
            row_width=self.spec_row_width,
            two_pass_cut=self.spec_two_pass_cut,
            two_pass_cap=self.spec_two_pass_cap,
            proxy=self.proxy_scene,
            occluders=self.occluders,
        )
        spec = shading.specular_estimator_soa(
            lighting, half, n, view, light_dirs, rgh
        )
        specular = jnp.stack(spec, axis=-1) / s_spec
        return diffuse + specular
