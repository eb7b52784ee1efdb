"""Neural fields (flax.linen): the MLP zoo behind every TexIR stage.

TPU-native equivalents of reference models/incidentNet.py + models/embedder.py:

  * ``positional_encoding``       — NeRF PE (reference models/embedder.py:6-53)
  * ``MatNetwork``                — PE→LeakyReLU MLP, Kaiming init; the NIrF
                                    irradiance field (incidentNet.py:103-142)
  * ``IRNetwork``                 — (point, dir) → RGB radiance (:16-53)
  * ``PILNetwork``                — (point, dir, roughness) → prefiltered
                                    specular (:202-239)
  * ``SineLayer``/``BRDFMLP``/``NeILFMLP`` — SIREN ω=30 with skips
                                    (:421-627)
  * ``EnvmapMaterialNetwork``     — InvRender latent-32 BRDF autoencoder with
                                    jittered-latent outputs (:268-327)
  * ``HashGridEncoding``/``MLPTexture3D`` — multiresolution hash grid + tiny
                                    MLP, the tiny-cuda-nn replacement
                                    (:331-416): gather + trilinear lerp over
                                    a [levels, table, features] parameter.

All fields are fp32 (HDR radiance targets need the mantissa); the MXU still
drives the dense layers.  Matmul-heavy widths (512) align to hardware tiles.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# positional encoding
# ---------------------------------------------------------------------------


def positional_encoding(
    x: jnp.ndarray, num_freqs: int, include_input: bool = True
) -> jnp.ndarray:
    """NeRF positional encoding with log-sampled bands 2^0..2^(m-1).

    Output order matches the reference embedder (models/embedder.py:27-31):
    [x, sin(x·2^0), cos(x·2^0), sin(x·2^1), ...] concatenated per band.
    """
    outs = [x] if include_input else []
    for i in range(num_freqs):
        freq = 2.0 ** i
        outs.append(jnp.sin(x * freq))
        outs.append(jnp.cos(x * freq))
    return jnp.concatenate(outs, axis=-1)


def pe_dim(in_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return in_dim * (2 * num_freqs + (1 if include_input else 0))


_kaiming = nn.initializers.kaiming_uniform()
_zeros = nn.initializers.zeros


# ---------------------------------------------------------------------------
# plain MLP fields
# ---------------------------------------------------------------------------


class MatNetwork(nn.Module):
    """PE → LeakyReLU(0.01) MLP (reference incidentNet.py:103-142).

    Used as the NIrF irradiance field (`irrf_network` config block): input a
    3D point, output `p_out_dim` channels in hdr_scale (log) domain.
    """

    points_multires: int = 10
    dims: Sequence[int] = (512, 512, 512, 512)
    p_out_dim: int = 3
    p_input_dim: int = 3

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        x = (
            positional_encoding(points, self.points_multires)
            if self.points_multires > 0
            else points
        )
        for d in self.dims:
            x = nn.Dense(d, kernel_init=_kaiming, bias_init=_zeros)(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return nn.Dense(self.p_out_dim, kernel_init=_kaiming, bias_init=_zeros)(x)


class IRSGNetwork(nn.Module):
    """point → 24 spherical gaussians (lobe dir, λ, μ) — reference
    incidentNet.py:55-101 (present in the reference but unused by its
    runners; kept for API completeness)."""

    points_multires: int = 10
    dims: Sequence[int] = (128, 128, 128, 128)
    num_lgt_sgs: int = 24

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        x = (
            positional_encoding(points, self.points_multires)
            if self.points_multires > 0
            else points
        )
        for d in self.dims:
            x = nn.Dense(d)(x)
            x = nn.relu(x)
        out = nn.Dense(self.num_lgt_sgs * 6)(x)
        out = out.reshape(points.shape[:-1] + (self.num_lgt_sgs, 6))
        lobes = jax.nn.sigmoid(out[..., :2])
        theta = lobes[..., 0:1] * 2 * jnp.pi
        phi = lobes[..., 1:2] * 2 * jnp.pi
        lobe_dir = jnp.concatenate(
            [jnp.cos(theta) * jnp.sin(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(phi)],
            axis=-1,
        )
        lam = jax.nn.sigmoid(out[..., 2:3]) * 30.0 + 0.1
        mu = nn.relu(out[..., 3:6])
        return jnp.concatenate([lobe_dir, lam, mu], axis=-1)


def frequency_encoding(x: jnp.ndarray, n_frequencies: int = 6) -> jnp.ndarray:
    """tcnn 'Frequency' encoding equivalent (reference models/embedder.py:
    114-159): sin/cos at 2^k without the raw input."""
    return positional_encoding(x, n_frequencies, include_input=False)


class IRNetwork(nn.Module):
    """(point, direction) → RGB incident radiance (reference :16-53)."""

    points_multires: int = 10
    dirs_multires: int = 4
    dims: Sequence[int] = (128, 128, 128, 128)

    @nn.compact
    def __call__(self, points: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
        p = (
            positional_encoding(points, self.points_multires)
            if self.points_multires > 0
            else points
        )
        d = (
            positional_encoding(dirs, self.dirs_multires)
            if self.dirs_multires > 0
            else dirs
        )
        x = jnp.concatenate([p, d], axis=-1)
        for dim in self.dims:
            x = nn.Dense(dim)(x)
            x = nn.relu(x)
        return nn.Dense(3)(x)


class PILNetwork(nn.Module):
    """(point, dir, roughness) → prefiltered specular radiance
    (reference :202-239)."""

    points_multires: int = 10
    dirs_multires: int = 4
    dims: Sequence[int] = (128, 128, 128, 128)
    p_out_dim: int = 3

    @nn.compact
    def __call__(
        self, points: jnp.ndarray, dirs: jnp.ndarray, roughness: jnp.ndarray
    ) -> jnp.ndarray:
        p = (
            positional_encoding(points, self.points_multires)
            if self.points_multires > 0
            else points
        )
        d = (
            positional_encoding(dirs, self.dirs_multires)
            if self.dirs_multires > 0
            else dirs
        )
        x = jnp.concatenate([p, d, roughness], axis=-1)
        for dim in self.dims:
            x = nn.Dense(dim)(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return nn.Dense(self.p_out_dim)(x)


# ---------------------------------------------------------------------------
# SIREN family
# ---------------------------------------------------------------------------


def _siren_first_init(omega: float):
    def init(key, shape, dtype=jnp.float32):
        bound = omega / shape[0]
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _siren_hidden_init(key, shape, dtype=jnp.float32):
    bound = math.sqrt(3.0 / shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SineLayer(nn.Module):
    """sin(ω·Wx+b) with SIREN init (reference incidentNet.py:421-455)."""

    features: int
    is_first: bool = False
    omega: float = 30.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = _siren_first_init(self.omega) if self.is_first else _siren_hidden_init
        y = nn.Dense(self.features, kernel_init=init, bias_init=_zeros)(x)
        return jnp.sin(y)


class BRDFMLP(nn.Module):
    """NeILF's spatial BRDF SIREN: point → (albedo 3, roughness 1) in [0,1]
    via tanh/2+0.5 (reference incidentNet.py:457-534)."""

    in_dims: int = 3
    out_dims: int = 4
    dims: Sequence[int] = (512,) * 8
    skip_connection: Sequence[int] = (4,)
    multires_view: int = 6

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        init_x = (
            positional_encoding(points, self.multires_view)
            if self.multires_view > 0
            else points
        )
        in_dim = init_x.shape[-1]
        dims = [in_dim] + list(self.dims) + [self.out_dims]
        x = init_x
        num_layers = len(dims)
        for l in range(num_layers - 1):
            out_dim = dims[l + 1]
            if l + 1 in self.skip_connection:
                out_dim -= dims[0]
            if l in self.skip_connection:
                x = jnp.concatenate([x, init_x], axis=-1)
            is_last = l == num_layers - 2
            if not is_last:
                x = SineLayer(out_dim, is_first=(l == 0 and self.multires_view == 0))(x)
            else:
                x = nn.Dense(out_dim, kernel_init=_zeros, bias_init=_zeros)(x)
        return jnp.tanh(x) / 2.0 + 0.5


class NeILFMLP(nn.Module):
    """NeILF incident-light SIREN: (pos, dir) packed as [..., 6] → radiance,
    position inserted at layer 4, final bias ln(1.5)
    (reference incidentNet.py:537-627)."""

    out_dims: int = 3
    dims: Sequence[int] = (128,) * 8
    skip_connection: Sequence[int] = (4,)
    position_insertion: Sequence[int] = (4,)
    multires_view: int = 6

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        pos = points[..., 0:3]
        view = points[..., 3:6]
        view_embed = (
            positional_encoding(view, self.multires_view)
            if self.multires_view > 0
            else view
        )
        d0 = view_embed.shape[-1]
        dims = [d0] + list(self.dims) + [self.out_dims]
        x = view_embed
        num_layers = len(dims)
        for l in range(num_layers - 1):
            out_dim = dims[l + 1]
            if l + 1 in self.skip_connection:
                out_dim -= dims[0]
            if l + 1 in self.position_insertion:
                out_dim -= 3
            if l in self.skip_connection:
                x = jnp.concatenate([x, view_embed], axis=-1)
            if l in self.position_insertion:
                x = jnp.concatenate([x, pos], axis=-1)
            is_last = l == num_layers - 2
            if not is_last:
                x = SineLayer(out_dim, is_first=(l == 0 and self.multires_view == 0))(x)
            else:
                x = nn.Dense(
                    out_dim,
                    kernel_init=_zeros,
                    bias_init=nn.initializers.constant(math.log(1.5)),
                )(x)
        return x


# ---------------------------------------------------------------------------
# InvRender latent BRDF autoencoder
# ---------------------------------------------------------------------------


class EnvmapMaterialNetwork(nn.Module):
    """InvRender's BRDF autoencoder (reference incidentNet.py:268-327):
    PE(point) → encoder → sigmoid latent(32) → decoder → sigmoid BRDF, with a
    second decode of a noise-jittered latent for the smoothness loss."""

    multires: int = 10
    brdf_encoder_dims: Sequence[int] = (512, 512, 512, 512)
    brdf_decoder_dims: Sequence[int] = (128, 128)
    latent_dim: int = 32

    def setup(self):
        self.encoder_layers = [nn.Dense(d) for d in self.brdf_encoder_dims] + [
            nn.Dense(self.latent_dim)
        ]
        self.decoder_layers = [nn.Dense(d) for d in self.brdf_decoder_dims] + [
            nn.Dense(4)
        ]

    def encode(self, points: jnp.ndarray) -> jnp.ndarray:
        x = positional_encoding(points, self.multires) if self.multires > 0 else points
        for i, layer in enumerate(self.encoder_layers):
            x = layer(x)
            if i < len(self.encoder_layers) - 1:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return x

    def decode(self, latent: jnp.ndarray) -> jnp.ndarray:
        x = latent
        for i, layer in enumerate(self.decoder_layers):
            x = layer(x)
            if i < len(self.decoder_layers) - 1:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return jax.nn.sigmoid(x)

    def __call__(self, points: jnp.ndarray, noise_key: Optional[jax.Array] = None):
        latent = jax.nn.sigmoid(self.encode(points))
        brdf = self.decode(latent)
        roughness = brdf[..., 3:] * 0.9 + 0.09
        albedo = brdf[..., :3]
        out = {
            "roughness": roughness,
            "diffuse_albedo": albedo,
            "latent": latent,
        }
        if noise_key is not None:
            rand_lc = latent + jax.random.normal(noise_key, latent.shape) * 0.01
            brdf_j = self.decode(rand_lc)
            out["random_xi_roughness"] = brdf_j[..., 3:] * 0.9 + 0.09
            out["random_xi_diffuse_albedo"] = brdf_j[..., :3]
        return out


# ---------------------------------------------------------------------------
# hash-grid encoding (tiny-cuda-nn replacement)
# ---------------------------------------------------------------------------


class HashGridEncoding(nn.Module):
    """Multiresolution hash-grid positional encoding, pure JAX.

    tcnn.Encoding('HashGrid') equivalent (reference incidentNet.py:378-389):
    16 levels, 2 features/level, 2^19 table, base res 16 → desired res 4096.
    Dense indexing where the level grid fits in the table, spatial hashing
    otherwise; trilinear interpolation of the 8 cell corners.  The table is a
    single [levels, table_size, features] parameter — shardable across chips.
    """

    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    desired_resolution: int = 4096

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @nn.compact
    def __call__(self, x01: jnp.ndarray) -> jnp.ndarray:
        """x01: [..., 3] in [0, 1] → [..., out_dim]."""
        growth = math.exp(
            math.log(self.desired_resolution / self.base_resolution)
            / (self.num_levels - 1)
        )
        table_size = 2 ** self.log2_hashmap_size
        table = self.param(
            "table",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1e-4, 1e-4),
            (self.num_levels, table_size, self.features_per_level),
        )

        primes = jnp.asarray([1, 2654435761, 805459861], jnp.uint32)
        outs = []
        for level in range(self.num_levels):
            res = int(math.floor(self.base_resolution * growth ** level))
            pos = x01 * res
            cell = jnp.floor(pos)
            frac = pos - cell
            cell = cell.astype(jnp.int32)

            feats = jnp.zeros(x01.shape[:-1] + (self.features_per_level,))
            dense = (res + 1) ** 3 <= table_size
            for corner in range(8):
                offs = jnp.asarray(
                    [(corner >> k) & 1 for k in range(3)], jnp.int32
                )
                c = jnp.clip(cell + offs, 0, res)
                if dense:
                    idx = (c[..., 0] * (res + 1) + c[..., 1]) * (res + 1) + c[..., 2]
                else:
                    cu = c.astype(jnp.uint32)
                    h = cu[..., 0] * primes[0] ^ cu[..., 1] * primes[1] ^ cu[..., 2] * primes[2]
                    idx = (h % jnp.uint32(table_size)).astype(jnp.int32)
                w = jnp.ones(x01.shape[:-1])
                for k in range(3):
                    w = w * jnp.where(offs[k] == 1, frac[..., k], 1.0 - frac[..., k])
                feats = feats + w[..., None] * jnp.take(table[level], idx, axis=0)
            outs.append(feats)
        return jnp.concatenate(outs, axis=-1)


class MLPTexture3D(nn.Module):
    """nvdiffrec's hash-grid material field (reference incidentNet.py:360-416):
    normalize points into the AABB, hash-encode, 2-hidden-layer 32-wide MLP,
    sigmoid remapped to per-channel [min, max] (albedo [0,1]³, roughness
    [0.01, 1])."""

    aabb: Any  # [2, 3] array-like
    channels: int = 4
    internal_dims: int = 32
    hidden: int = 2

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        aabb = jnp.asarray(self.aabb)
        x01 = (points - aabb[0]) / (aabb[1] - aabb[0])
        x01 = jnp.clip(x01, 0.0, 1.0)
        enc = HashGridEncoding()(x01)
        x = enc
        for _ in range(self.hidden):
            x = nn.Dense(self.internal_dims, use_bias=False, kernel_init=_kaiming)(x)
            x = nn.relu(x)
        x = nn.Dense(self.channels, use_bias=False, kernel_init=_kaiming)(x)
        mn = jnp.asarray([0.0, 0.0, 0.0, 0.01])[: self.channels]
        mx = jnp.asarray([1.0, 1.0, 1.0, 1.0])[: self.channels]
        return jax.nn.sigmoid(x) * (mx - mn) + mn
