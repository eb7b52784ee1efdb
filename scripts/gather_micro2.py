"""Gather rate vs index coherence, table size, and layout (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS, R = 16384, 512
N = 6


def main():
    import jax
    import jax.numpy as jnp

    def timeit(fn, args_fn, tag, elems=ROWS * R):
        jfn = jax.jit(fn)
        out = jfn(*args_fn(0))
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [jfn(*args_fn(i)) for i in range(1, N + 1)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / N
        print(f"{tag}: {dt * 1e3:.1f} ms ({elems / dt / 1e9:.2f} G elem/s)",
              flush=True)

    for size in [4096, 65536, 1 << 20]:
        table = jnp.asarray(
            np.random.randint(0, 2**31, (size,), dtype=np.int64).astype(np.float32)
        )

        def rand_idx(i, size=size):
            k = jax.random.PRNGKey(i)
            return (jax.random.uniform(k, (ROWS, R)) * (size - 1)).astype(jnp.int32),

        def sorted_idx(i, size=size):
            (idx,) = rand_idx(i, size)
            return (jnp.sort(idx, axis=1),)

        def coherent_idx(i, size=size):
            # per-row random base + small in-row walk (hit-like coherence)
            k = jax.random.PRNGKey(i)
            base = (jax.random.uniform(k, (ROWS, 1)) * (size - 256)).astype(jnp.int32)
            step = (jax.random.uniform(jax.random.fold_in(k, 1), (ROWS, R)) * 255).astype(jnp.int32)
            return (base + step,)

        g = lambda idx: jnp.take(table, idx)
        timeit(g, rand_idx, f"size={size} random")
        timeit(g, sorted_idx, f"size={size} row-sorted")
        timeit(g, coherent_idx, f"size={size} row-coherent")

    # index layout: [R, ROWS] (transposed minor dim)
    table = jnp.asarray(
        np.random.randint(0, 2**31, (65536,), dtype=np.int64).astype(np.float32)
    )

    def t_idx(i):
        k = jax.random.PRNGKey(i)
        return ((jax.random.uniform(k, (R, ROWS)) * 65535).astype(jnp.int32),)

    timeit(lambda idx: jnp.take(table, idx), t_idx, "size=65536 transposed idx")

    # gather through lax.gather with explicit dims on [H, W] table
    table2 = table.reshape(256, 256)

    def yx_idx(i):
        k = jax.random.PRNGKey(i)
        y = (jax.random.uniform(k, (ROWS, R)) * 255).astype(jnp.int32)
        x = (jax.random.uniform(jax.random.fold_in(k, 1), (ROWS, R)) * 255).astype(jnp.int32)
        return y, x

    def adv(y, x):
        return table2[y, x]

    timeit(adv, yx_idx, "size=65536 2D advanced idx")


if __name__ == "__main__":
    main()
