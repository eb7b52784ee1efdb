"""Microbenchmark: u32 gather variants at bake shapes (TPU, idle host).

[16384, 512] index arrays into a [256*256] u32 table: the RGBE fetch shape.
Variants probe layout/dtype/fusion effects to find the fast formulation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS, R = 16384, 512
H = W = 256
N = 6


def main():
    import jax
    import jax.numpy as jnp

    from texir_code_tpu.models.tbl import bilinear_rgbe, rgbe_decode

    table = jnp.asarray(
        np.random.randint(0, 2**31, (H * W,), dtype=np.int64).astype(np.uint32)
    )
    table2d = table.reshape(H, W)

    def timeit(fn, args_fn, tag, elems):
        jfn = jax.jit(fn)
        out = jfn(*args_fn(0))
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [jfn(*args_fn(i)) for i in range(1, N + 1)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / N
        print(f"{tag}: {dt * 1e3:.1f} ms ({elems / dt / 1e9:.2f} G elem/s)",
              flush=True)

    def uv_args(i):
        k = jax.random.PRNGKey(i)
        u = jax.random.uniform(k, (ROWS, R))
        v = jax.random.uniform(jax.random.fold_in(k, 1), (ROWS, R))
        return u, v

    # 1. one u32 gather [ROWS, R] 2D indices
    def g1(u, v):
        idx = (v * (H * W - 1)).astype(jnp.int32)
        return jnp.take(table, idx)

    timeit(g1, uv_args, "1x u32 gather (2D idx)", ROWS * R)

    # 2. four independent u32 gathers (the bilinear pattern, no decode)
    def g4(u, v):
        x = u * W - 0.5
        y = v * H - 0.5
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
        x1 = jnp.clip(x0 + 1, 0, W - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
        y1 = jnp.clip(y0 + 1, 0, H - 1)
        a = jnp.take(table, y0 * W + x0)
        b = jnp.take(table, y0 * W + x1)
        c = jnp.take(table, y1 * W + x0)
        d = jnp.take(table, y1 * W + x1)
        return a + b + c + d

    timeit(g4, uv_args, "4x u32 gather (sum only)", 4 * ROWS * R)

    # 3. full bilinear_rgbe (gathers + decode + lerp)
    def g_full(u, v):
        return bilinear_rgbe(table2d, u, v)[0]

    timeit(g_full, uv_args, "bilinear_rgbe", 4 * ROWS * R)

    # 4. decode only (no gather): rgbe_decode on a same-size u32 array
    def dec(u, v):
        p = (u * 4e9).astype(jnp.uint32)
        return rgbe_decode(p)[0]

    timeit(dec, uv_args, "rgbe_decode only", ROWS * R)

    # 5. 4 gathers from a 2D table via vmap-style row gather
    def g4_2d(u, v):
        x0 = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
        y0 = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
        return table2d[y0, x0]

    timeit(g4_2d, uv_args, "1x u32 gather (2D table adv-idx)", ROWS * R)

    # 6. flat 1D indices (reshape first)
    def g1_flat(u, v):
        idx = (v.reshape(-1) * (H * W - 1)).astype(jnp.int32)
        return jnp.take(table, idx).reshape(ROWS, R)

    timeit(g1_flat, uv_args, "1x u32 gather (1D idx)", ROWS * R)

    # 7. f32 gather for comparison
    ftab = table.astype(jnp.float32)

    def g1f(u, v):
        idx = (v * (H * W - 1)).astype(jnp.int32)
        return jnp.take(ftab, idx)

    timeit(g1f, uv_args, "1x f32 gather (2D idx)", ROWS * R)


if __name__ == "__main__":
    main()
