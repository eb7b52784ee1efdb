"""Micro-bench: texture-sampler backward variants at Mat-step shapes (TPU).

VERDICT #8 follow-up: the sampler backward is 17.6% of the full Mat step
(scatter-add ~48 ms, mip-build transpose ~32 ms, measure_sampler_backward).
This compares like-for-like fwd+bwd implementations:

  pyramid build [4096, 4096, 3]:
    reshape   — reshape(h/2, 2, w/2, 2, c).mean((1, 3))  (current)
    separable — strided-slice adds, rows then cols
    window    — lax.reduce_window add, 2x2 stride 2
  sample backward (98k samples, 8 taps, 2048^2+mips flat atlas):
    autodiff  — XLA scatter-add transpose of jnp.take (current)
    sorted    — sort taps by texel id + segment_sum

Each timed call varies the input (relay replays identical dispatches).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, mk_args, n=4):
    import jax

    out = fn(*mk_args(0))
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        outs = [fn(*mk_args(1 + r * n + i)) for i in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp

    H = W = 4096
    C = 3

    def mk_tex(i):
        return (jax.random.uniform(jax.random.PRNGKey(i), (H, W, C)),)

    def pyr_reshape(x):
        levels = [x]
        while levels[-1].shape[0] >= 2:
            cur = levels[-1]
            h, w = cur.shape[0], cur.shape[1]
            levels.append(
                cur.reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3))
            )
        return levels

    def pyr_separable(x):
        levels = [x]
        while levels[-1].shape[0] >= 2:
            cur = levels[-1]
            y = (cur[0::2] + cur[1::2]) * 0.5
            levels.append((y[:, 0::2] + y[:, 1::2]) * 0.5)
        return levels

    def pyr_window(x):
        levels = [x]
        while levels[-1].shape[0] >= 2:
            cur = levels[-1]
            s = jax.lax.reduce_window(
                cur, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
            )
            levels.append(s * 0.25)
        return levels

    def loss_of(pyr_fn):
        @jax.jit
        def f(x):
            return jax.grad(
                lambda t: sum(jnp.sum(l) * (k + 1.0)
                              for k, l in enumerate(pyr_fn(t)))
            )(x).sum()
        return f

    for name, fn in [("reshape", pyr_reshape), ("separable", pyr_separable),
                     ("window", pyr_window)]:
        dt = timeit(loss_of(fn), mk_tex)
        print(f"pyramid {name}: {dt * 1e3:.1f} ms fwd+bwd", flush=True)
        if name == "reshape":
            ref = pyr_reshape(mk_tex(0)[0])
        got = fn(mk_tex(0)[0])
        err = max(float(jnp.abs(a - b).max()) for a, b in zip(ref, got))
        print(f"  max abs err vs reshape: {err:.2e}", flush=True)

    # ---- sample backward at Mat shapes ----
    from texir_code_tpu.ops.texture import build_mip_pyramid, texture_sample

    HB = 2048
    base = jax.random.uniform(jax.random.PRNGKey(0), (HB, HB, C))
    n = 6 * 128 * 128

    def mk_uv(i):
        k = jax.random.PRNGKey(100 + i)
        uv = jax.random.uniform(k, (n, 2))
        lod = jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * 6.0
        return uv, lod

    @jax.jit
    def bwd_autodiff(tex, uv, lod):
        def f(t):
            pyr = build_mip_pyramid(t)
            return jnp.sum(texture_sample(pyr, uv, lod) ** 2)
        return jax.grad(f)(tex).sum()

    uv0, lod0 = mk_uv(0)
    dt = timeit(bwd_autodiff, lambda i: (base, *mk_uv(i)))
    print(f"sample bwd autodiff (incl pyr): {dt * 1e3:.1f} ms", flush=True)

    @jax.jit
    def bwd_autodiff_nopyr(flatpyr, uv, lod):
        # gradient only through the gathers: isolates the scatter-add
        def f(fp):
            pyr = [fp[:HB * HB].reshape(HB, HB, C)]
            off = HB * HB
            h = HB // 2
            while h >= 1:
                pyr.append(fp[off:off + h * h].reshape(h, h, C))
                off += h * h
                h //= 2
            return jnp.sum(texture_sample(pyr, uv, lod) ** 2)
        return jax.grad(f)(flatpyr).sum()

    sizes = []
    h = HB
    while h >= 1:
        sizes.append(h * h)
        h //= 2
    flat0 = jax.random.uniform(jax.random.PRNGKey(1), (sum(sizes), C))
    dt = timeit(bwd_autodiff_nopyr, lambda i: (flat0, *mk_uv(i)))
    print(f"sample bwd autodiff (flat pyr input): {dt * 1e3:.1f} ms",
          flush=True)

    # sorted + segment_sum variant of the same scatter
    m = sum(sizes)

    @jax.jit
    def bwd_sorted(uv, lod, g):
        # 8 taps per sample as in _flat_pyramid_fetch (both mip levels)
        widths = jnp.asarray([int(np.sqrt(s)) for s in sizes], jnp.int32)
        offsets = jnp.asarray(np.cumsum([0] + sizes[:-1]), jnp.int32)
        lodc = jnp.clip(lod, 0.0, len(sizes) - 1.0)
        lo = jnp.floor(lodc).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, len(sizes) - 1)
        frac = lodc - lo
        idxs, ws = [], []
        for lev, lw in ((lo, 1.0 - frac), (hi, frac)):
            wdim = jnp.take(widths, lev)
            off = jnp.take(offsets, lev)
            x = uv[:, 0] * wdim.astype(uv.dtype) - 0.5
            y = uv[:, 1] * wdim.astype(uv.dtype) - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            x0i = jnp.mod(x0.astype(jnp.int32), wdim)
            x1i = jnp.mod(x0.astype(jnp.int32) + 1, wdim)
            y0i = jnp.mod(y0.astype(jnp.int32), wdim)
            y1i = jnp.mod(y0.astype(jnp.int32) + 1, wdim)
            for yy, xx, wgt in (
                (y0i, x0i, (1 - fx) * (1 - fy)),
                (y0i, x1i, fx * (1 - fy)),
                (y1i, x0i, (1 - fx) * fy),
                (y1i, x1i, fx * fy),
            ):
                idxs.append(off + yy * wdim + xx)
                ws.append(wgt * lw)
        idx = jnp.concatenate(idxs)
        wall = jnp.concatenate(ws)
        gall = jnp.tile(g, (8, 1)) * wall[:, None]
        order = jnp.argsort(idx)
        idx_s = jnp.take(idx, order)
        g_s = jnp.take(gall, order, axis=0)
        out = jax.ops.segment_sum(
            g_s, idx_s, num_segments=m, indices_are_sorted=True
        )
        return out.sum()

    g0 = jax.random.uniform(jax.random.PRNGKey(2), (n, C))
    dt = timeit(bwd_sorted, lambda i: (*mk_uv(i), g0))
    print(f"sample bwd sorted+segment_sum: {dt * 1e3:.1f} ms", flush=True)

    # ---- end-to-end Mat step A/B: scatter-add vs segment-sum backward ----
    import bench
    from texir_code_tpu.data.synthetic import make_apartment_scene
    from texir_code_tpu.ops import texture

    apt = make_apartment_scene(atlas_res=256, subdiv=24)
    ips = bench._mat_step(apt)
    print(f"mat step scatter-add: {ips:.3f} iters/s", flush=True)
    texture.SEGSUM_BACKWARD = True
    try:
        ips = bench._mat_step(apt)
    finally:
        texture.SEGSUM_BACKWARD = False
    print(f"mat step segment-sum: {ips:.3f} iters/s", flush=True)


if __name__ == "__main__":
    main()
