"""Sharded IrT baking: texel batches split across the device mesh.

The bake is embarrassingly parallel over texels (2.1 G independent rays at
reference scale) — each chip takes an equal slice of every batch via
shard_map with no collectives; the host assembles the texture.  The BVH,
cluster rows, and atlas are replicated (a scan mesh's BVH + HDR atlas is
tens of MB — far under per-chip HBM).

The per-device compute is the SAME fast path as the single-chip baker: the
culled Pallas wedge kernel when a ClusterScene is configured
(ops.pallas_culled), else the XLA skip-link traversal.  Per-texel RNG is
derived by fold_in of the *global* texel index, so results are bit-identical
for any device count.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from jax import shard_map

from texir_code_tpu.models.tbl import TBL
from texir_code_tpu.models.tracer_irt import (
    GeometryTextures,
    IrradianceTextureBaker,
    bake_irradiance_soa,
    morton_order,
)
from texir_code_tpu.parallel.mesh import RAY_AXIS, make_device_mesh
from texir_code_tpu.parallel.multihost import process_local_slice


class ShardedIrradianceBaker(IrradianceTextureBaker):
    """IrT baker whose per-batch compute is shard_map-ped over texels."""

    def __init__(
        self,
        tbl: TBL,
        spp: int = 2048,
        texel_batch: int = 8192,
        surface_eps: float = 1e-2,
        mesh: Optional[Mesh] = None,
        cluster_scene=None,
        wedges: int = 8,
        pallas_interpret: bool = False,
    ):
        super().__init__(
            tbl, spp=spp, texel_batch=texel_batch, surface_eps=surface_eps,
            cluster_scene=cluster_scene, wedges=wedges,
            pallas_interpret=pallas_interpret,
        )
        self.mesh = mesh if mesh is not None else make_device_mesh()
        n = self.mesh.devices.size
        if texel_batch % n:
            raise ValueError(f"texel_batch {texel_batch} not divisible by {n} devices")
        self._sharded = self._build()

    def _build(self):
        spp = self.spp
        eps = self.surface_eps
        tbl = self.tbl

        use_culled = (
            self.cluster_scene is not None and self._use_device_kernels()
        )

        def device_fn(points, normals, texel_ids, seed):
            if use_culled:
                # the Pallas culled wedge kernel — the same engine the
                # single-chip baker and bench run
                return self._bake_culled_impl(points, normals, texel_ids, seed)
            out = bake_irradiance_soa(
                tbl,
                tuple(points[:, k] for k in range(3)),
                tuple(normals[:, k] for k in range(3)),
                texel_ids, seed, spp, eps,
            )
            return jnp.stack(out, axis=-1)

        fn = shard_map(
            device_fn,
            mesh=self.mesh,
            in_specs=(
                PartitionSpec(RAY_AXIS),
                PartitionSpec(RAY_AXIS),
                PartitionSpec(RAY_AXIS),
                PartitionSpec(),
            ),
            out_specs=PartitionSpec(RAY_AXIS),
            check_vma=False,
        )

        def super_fn(points, normals, texel_ids, seed):
            # [K, B/n, 3] per device: K batches in one dispatch (lax.map)
            return jax.lax.map(
                lambda a: device_fn(a[0], a[1], a[2], seed),
                (points, normals, texel_ids),
            )

        self._sharded_super = jax.jit(
            shard_map(
                super_fn,
                mesh=self.mesh,
                in_specs=(
                    PartitionSpec(None, RAY_AXIS),
                    PartitionSpec(None, RAY_AXIS),
                    PartitionSpec(None, RAY_AXIS),
                    PartitionSpec(),
                ),
                out_specs=PartitionSpec(None, RAY_AXIS),
                check_vma=False,
            )
        )
        return jax.jit(fn)

    def bake_batch(self, points, normals, texel_ids, seed):
        """Sharded override: one shard_map'ped batch (shapes [B, 3])."""
        return self._sharded(points, normals, texel_ids, seed)

    def bake(
        self,
        geom: GeometryTextures,
        key: jax.Array,
        progress: bool = False,
    ) -> np.ndarray:
        res = geom.position.shape[0]
        vr, vc = np.nonzero(geom.valid)
        # spatially coherent batches (see morton_order)
        order = morton_order(geom.position[vr, vc])
        vr, vc = vr[order], vc[order]
        pts = np.asarray(geom.position[vr, vc])
        nrm = np.asarray(geom.normal[vr, vc])
        n = pts.shape[0]
        bs = self.texel_batch
        nb = (n + bs - 1) // bs
        pad = nb * bs - n
        if pad:
            pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
            nrm = np.concatenate(
                [nrm, np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (pad, 1))]
            )
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        out = np.zeros((n + pad, 3), np.float32)
        ids = jnp.arange(nb * bs, dtype=jnp.int32)
        # multi-host: each process takes a contiguous share of the batches
        # (texel RNG is keyed by global id, so the split is bit-invariant)
        pidx, pcnt = jax.process_index(), jax.process_count()
        my = process_local_slice(nb, pidx, pcnt)
        kd = self.batches_per_dispatch if self.cluster_scene is not None else 1
        i = my.start
        while i < my.stop:
            k = min(kd, my.stop - i)
            sl = slice(i * bs, (i + k) * bs)
            if k > 1:
                out[sl] = np.asarray(
                    self._sharded_super(
                        jnp.asarray(pts[sl]).reshape(k, bs, 3),
                        jnp.asarray(nrm[sl]).reshape(k, bs, 3),
                        ids[sl].reshape(k, bs), seed,
                    )
                ).reshape(k * bs, 3)
            else:
                out[sl] = np.asarray(
                    self._sharded(
                        jnp.asarray(pts[sl]), jnp.asarray(nrm[sl]), ids[sl], seed
                    )
                )
            i += k
            if progress and (i // max(k, 1)) % 16 == 0:
                print(f"sharded bake: {i}/{nb} batches")
        if pcnt > 1:
            # disjoint batch ranges → summing the gathered copies merges them
            from jax.experimental import multihost_utils

            out = np.asarray(
                multihost_utils.process_allgather(jnp.asarray(out))
            ).sum(axis=0)
        tex = np.zeros((res, res, 3), np.float32)
        tex[vr, vc] = out[:n]
        return tex
