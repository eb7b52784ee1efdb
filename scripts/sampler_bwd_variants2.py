"""Sampler-backward round 3: scatter-free variants at Mat shapes (TPU).

Key observation (scripts/lod_histogram.py): at Mat shapes every trilinear
tap lands on a COARSE mip level (128^2 faces vs 2048^2/4096^2 atlases give
lod ~4+), so the backward's scatter targets are small arrays (<= 65k rows).
Variants benchmarked here, all computing grad wrt a per-level [S, C] table
from N taps (idx [N] in [0, S), g [N, C]):

  scatter      — flat.at[idx].add(g)                        (today's path)
  scatter_seg  — sort by idx + segment_sum(sorted)          (round-2 loser)
  runsum       — sort by idx + cumsum-diff segmented run totals + a scatter
                 of UNIQUE indices (run ends get idx, rest get distinct
                 dump keys), declared unique to XLA
  pallas_acc   — Pallas kernel: 8 sublane-phased VMEM accumulators, serial
                 dynamic-row stores, tree-add at the end
  pallas_cmp   — Pallas kernel: stream taps via SMEM scalars, broadcast
                 compare against the output iota, masked add (O(N*S/1024))

Each timed call varies inputs (the axon relay replays identical dispatches).
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 786432  # 8 taps x 98304 px
    for S, C in [(16384, 3), (65536, 3), (65536, 1), (262144, 3)]:
        print(f"--- S={S} C={C} N={N}", flush=True)

        def mk(i):
            k = jax.random.PRNGKey(i)
            # realistic duplication: taps cluster around image-smooth uv
            idx = (jax.random.uniform(k, (N,)) ** 1.2 * S).astype(jnp.int32)
            idx = jnp.clip(idx, 0, S - 1)
            g = jax.random.uniform(jax.random.fold_in(k, 1), (N, C))
            return idx, g

        @jax.jit
        def scatter(idx, g, S=S, C=C):
            return jnp.zeros((S, C)).at[idx].add(g).sum()

        @jax.jit
        def scatter_seg(idx, g, S=S, C=C):
            order = jnp.argsort(idx)
            return jax.ops.segment_sum(
                jnp.take(g, order, axis=0), jnp.take(idx, order),
                num_segments=S, indices_are_sorted=True,
            ).sum()

        @jax.jit
        def runsum(idx, g, S=S, C=C):
            order = jnp.argsort(idx)
            idx_s = jnp.take(idx, order)
            g_s = jnp.take(g, order, axis=0)
            csum = jnp.cumsum(g_s, axis=0)
            is_last = jnp.concatenate(
                [idx_s[1:] != idx_s[:-1], jnp.ones((1,), bool)]
            )
            # run total = csum at run end minus csum at previous run end
            pos = jnp.arange(N)
            prev_end = jnp.where(is_last, pos, -1)
            prev_end = jax.lax.associative_scan(jnp.maximum, prev_end)
            prev_end = jnp.concatenate([jnp.array([-1]), prev_end[:-1]])
            base = jnp.where(
                prev_end[:, None] >= 0,
                jnp.take(csum, jnp.maximum(prev_end, 0), axis=0), 0.0,
            )
            total = csum - base
            # unique scatter: run ends write idx, others write distinct keys
            keys = jnp.where(is_last, idx_s, S + pos)
            out = jnp.zeros((S + N, C)).at[keys].add(
                jnp.where(is_last[:, None], total, 0.0),
                unique_indices=True,
            )
            return out[:S].sum()

        # --- pallas accumulate: P phase-interleaved VMEM accumulators,
        # serial dynamic-row read-add-stores, chunked grid (idx chunks fit
        # SMEM), scratch persists across the sequential TPU grid
        P = 8
        CH = 32768
        K = N // CH
        TN = CH // P

        def acc_kernel(idx_ref, g_ref, out_ref, acc, *, S, C):
            @pl.when(pl.program_id(0) == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            def body(n, _):
                for p in range(P):
                    i = idx_ref[p * TN + n]
                    row = g_ref[p * TN + n, :]
                    cur = acc[p, pl.dslice(i, 1), :]
                    acc[p, pl.dslice(i, 1), :] = cur + row[None, :]
                return 0

            jax.lax.fori_loop(0, TN, body, 0)

            @pl.when(pl.program_id(0) == K - 1)
            def _():
                out_ref[...] = acc[...].sum(axis=0)

        @jax.jit
        def pallas_acc(idx, g, S=S, C=C):
            import functools

            out = pl.pallas_call(
                functools.partial(acc_kernel, S=S, C=C),
                grid=(K,),
                in_specs=[
                    pl.BlockSpec((CH,), lambda k: (k,),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((CH, C), lambda k: (k, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((S, C), lambda k: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
                scratch_shapes=[pltpu.VMEM((P, S, C), jnp.float32)],
            )(idx, g)
            return out.sum()

        variants = [
            ("scatter", scatter),
            ("scatter_seg", scatter_seg),
            ("runsum", runsum),
        ]
        if S * C * (P + 1) * 4 <= 100 * 2**20:
            variants.append(("pallas_acc", pallas_acc))
        for name, fn in variants:
            # correctness vs scatter first
            idx0, g0 = mk(0)
            ref = jnp.zeros((S, C)).at[idx0].add(g0).sum()
            try:
                got = fn(idx0, g0)
                err = abs(float(got) - float(ref)) / max(abs(float(ref)), 1)
                dt = timeit(fn, mk)
                print(f"{name}: {dt * 1e3:.2f} ms  (rel err {err:.2e})",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
