"""Sampler-backward round 3b: Pallas serial-RMW accumulators (TPU).

variants2 showed: scatter 14-22 ms per atlas at Mat shapes; sorted
segment-sum and cumsum-runsum lose; the (P, S, C) accumulator layout is
ILLEGAL (C=3 minor pads to 128 lanes -> 64x VMEM).  This round measures
TPU-legal layouts of the dynamic-row read-modify-write idea:

  acc1    — single (S, 128) accumulator, serial loop, one RMW per tap
            (dependency chain limited by VMEM load-use latency)
  acc4    — (4*S, 128) accumulator, 4 interleaved phases (independent RMW
            chains), tree-add at the end
  acc1s   — acc1 on PRE-SORTED taps (XLA argsort outside): consecutive
            equal indices -> store-to-load forwarding locality

All compute grad wrt a [S, C] table from N taps.  C rides in lanes 0:C of
the 128-lane row (the pad is free — VMEM tiles are 128-lane anyway).
"""

import functools
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


def make_acc(S, C, N, P, CH=32768, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = N // CH
    TN = CH // P

    def kernel(idx_ref, g_ref, out_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        def body(n, _):
            for p in range(P):
                i = idx_ref[p * TN + n]
                row = g_ref[p * TN + n, :]
                cur = acc[pl.dslice(p * S + i, 1), :]
                acc[pl.dslice(p * S + i, 1), :] = cur + row[None, :]
            return 0

        jax.lax.fori_loop(0, TN, body, 0)

        @pl.when(pl.program_id(0) == K - 1)
        def _():
            total = acc[pl.dslice(0, S), :]
            for p in range(1, P):
                total = total + acc[pl.dslice(p * S, S), :]
            out_ref[...] = total

    @jax.jit
    def run(idx, g):
        # g rides in lanes 0:C of a 128-lane row (tile pad is free)
        g128 = jnp.zeros((N, 128), g.dtype).at[:, :C].set(g)
        out = pl.pallas_call(
            kernel,
            grid=(K,),
            in_specs=[
                pl.BlockSpec((CH,), lambda k: (k,), memory_space=pltpu.SMEM),
                pl.BlockSpec((CH, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, 128), lambda k: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((P * S, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=interpret,
        )(idx, g128)
        return out[:, :C].sum()

    return run


def main():
    import jax
    import jax.numpy as jnp

    N = 786432
    for S, C in [(16384, 3), (65536, 3), (22528, 3)]:
        print(f"--- S={S} C={C} N={N}", flush=True)

        def mk(i):
            k = jax.random.PRNGKey(i)
            idx = (jax.random.uniform(k, (N,)) ** 1.2 * S).astype(jnp.int32)
            idx = jnp.clip(idx, 0, S - 1)
            g = jax.random.uniform(jax.random.fold_in(k, 1), (N, C))
            return idx, g

        @jax.jit
        def scatter(idx, g, S=S, C=C):
            return jnp.zeros((S, C)).at[idx].add(g).sum()

        idx0, g0 = mk(0)
        ref = float(scatter(idx0, g0))
        dt = timeit(scatter, mk)
        print(f"scatter: {dt * 1e3:.2f} ms", flush=True)

        variants = [("acc1", make_acc(S, C, N, 1)),
                    ("acc4", make_acc(S, C, N, 4))]

        acc1 = make_acc(S, C, N, 1)

        @jax.jit
        def acc1s(idx, g):
            order = jnp.argsort(idx)
            return acc1(jnp.take(idx, order), jnp.take(g, order, axis=0))

        variants.append(("acc1s", acc1s))
        for name, fn in variants:
            try:
                got = float(fn(idx0, g0))
                err = abs(got - ref) / max(abs(ref), 1)
                dt = timeit(fn, mk)
                print(f"{name}: {dt * 1e3:.2f} ms  (rel err {err:.2e})",
                      flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:200]
                print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
