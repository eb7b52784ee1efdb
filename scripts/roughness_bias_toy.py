"""Isolate the low-spp roughness overshoot (PERF.md round-4 residual #3).

A single flat patch under an analytic environment (bright lamp disc +
ambient), shaded with the SAME GGX importance estimator and log-L1 loss the
Mat stage trains through (ops/sampling.generate_dir_soa +
ops/shading.specular_estimator_soa + hdr_scale) — no ray tracing, so the
experiment isolates the ESTIMATOR+LOSS interaction:

  the GT image is (effectively) noise-free, but the model render is a
  16-sample GGX MC estimate whose variance explodes as roughness drops
  (fewer samples hit the lamp).  E[L1(log(noisy), log(clean))] grows with
  estimator variance, so gradient descent prefers a smoother,
  higher-roughness render even when the mean at GT roughness matches —
  E[loss(MC)] != loss(E[MC]).

Prints the converged roughness per training spp for several GT values.
CPU-friendly (~1 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from texir_code_tpu.ops.sampling import generate_dir_soa, reflect_soa
from texir_code_tpu.ops.shading import hdr_scale, specular_estimator_soa

N_PIX = 64          # independent pixels (each its own RNG stream)
LAMP_DIR = np.array([0.3, 0.8, 0.53])
LAMP_COS = 0.985    # ~10 deg disc
LAMP_RAD = 20.0
AMBIENT = 0.1


def radiance(light_dirs):
    """Analytic environment lookup (replaces the TBL query)."""
    ld = LAMP_DIR / np.linalg.norm(LAMP_DIR)
    cos = (
        light_dirs[0] * ld[0] + light_dirs[1] * ld[1] + light_dirs[2] * ld[2]
    )
    val = jnp.where(cos > LAMP_COS, LAMP_RAD, AMBIENT)
    return (val, val, val)


def _views():
    """Per-pixel view dirs on a ~18 deg cone around the lamp's mirror
    direction — a highlight neighborhood: pixels sample the GGX lobe at
    graded offsets, so roughness is well identified (as in the Mat stage's
    highlight-masked regions)."""
    ld = LAMP_DIR / np.linalg.norm(LAMP_DIR)
    mirror = np.array([-ld[0], ld[1], -ld[2]])  # reflect(view)=lamp at center
    rng = np.random.default_rng(4)
    v = mirror[None, :] + 0.16 * rng.standard_normal((N_PIX, 3))
    v[:, 1] = np.abs(v[:, 1])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return tuple(jnp.asarray(v[:, k]) for k in range(3))


_V = _views()


def render(rough, spp, key):
    """Specular-only render of N_PIX pixels at the given roughness."""
    n = (jnp.zeros(N_PIX), jnp.ones(N_PIX), jnp.zeros(N_PIX))    # normal +y
    v = _V
    r = jnp.broadcast_to(rough, (N_PIX,))
    half = generate_dir_soa(n, spp, key, mode="importance", roughness=r,
                            pre_mode="independent")
    light_dirs, _ = reflect_soa(v, half)
    lighting = radiance(light_dirs)
    spec = specular_estimator_soa(lighting, half, n, v, light_dirs, r)
    return jnp.stack(spec, axis=-1) / spp


def fit(gt_img, spp, steps=400, lr=5e-2, seed=0):
    """Gradient-descent roughness fit under log-L1 with fresh MC draws."""
    import optax

    opt = optax.adam(lr)

    def loss_fn(rho, key):
        img = render(jax.nn.sigmoid(rho) * 0.79 + 0.01, spp, key)
        return jnp.abs(hdr_scale(img) - hdr_scale(gt_img)).mean()

    @jax.jit
    def step(rho, opt_state, key):
        l, g = jax.value_and_grad(loss_fn)(rho, key)
        up, opt_state = opt.update(g, opt_state)
        return rho + up[...], opt_state, l

    rho = jnp.asarray(np.log(0.1 / 0.7))   # init near roughness 0.1
    opt_state = opt.init(rho)
    base = jax.random.PRNGKey(seed)
    for i in range(steps):
        rho, opt_state, _ = step(rho, opt_state, jax.random.fold_in(base, i))
    return float(jax.nn.sigmoid(rho) * 0.79 + 0.01)


def main():
    print(f"{'gt rough':>9} | " + " | ".join(f"spp {s:>4}" for s in (16, 64, 256)))
    for gt in (0.2, 0.35, 0.5, 0.65):
        gt_img = render(gt, 4096, jax.random.PRNGKey(999))
        row = []
        for spp in (16, 64, 256):
            row.append(fit(gt_img, spp))
        print(f"{gt:9.2f} | " + " | ".join(f"{r:8.3f}" for r in row), flush=True)


if __name__ == "__main__":
    main()
