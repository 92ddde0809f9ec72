"""Micro-diagnostic: does pltpu.roll cost depend on the shift amount?

Times a kernel that applies `reps` dependent lane-rolls of a (BM, N)
i32 plane at a fixed shift, for shifts across the butterfly's range.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BM, N, reps = 128, 2048, 22   # 2 rolls/stage x 11 stages equivalent
    B = 64

    def kern(shift, x_ref, o_ref):
        v = x_ref[0]
        for _ in range(reps):
            v = pltpu.roll(v, N - shift, axis=1) + 1
        o_ref[0] = v

    def run(shift):
        f = pl.pallas_call(
            functools.partial(kern, shift),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, BM, N), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, BM, N), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, BM, N), jnp.int32),
        )
        return f

    x = jnp.asarray(np.random.RandomState(0).randint(0, 100, (B, BM, N)),
                    jnp.int32)

    def timed(name, fn, *xs, iters=64):
        @jax.jit
        def window(*xs):
            def body(acc, _):
                out = fn(*[a + acc for a in xs])
                return acc + jnp.sum(out[0, 0, :8]), None
            acc, _ = jax.lax.scan(body, jnp.ones((), jnp.int32), None,
                                  length=iters)
            return acc
        _ = int(window(*xs))
        t0 = time.perf_counter()
        _ = int(window(*xs))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:<40s} {dt*1e3:9.3f} ms/iter", flush=True)

    for sh in (1, 8, 64, 128, 256, 512, 1024):
        timed(f"lane roll x{reps}, shift={sh}", run(sh), x)

    # transposed: same data volume, roll along SUBLANES (axis 0 of the
    # in-kernel (N, BM) tile) — hypothesis: cross-vreg sublane shifts
    # are register permutes, cheap at every shift
    BMt, Nt = 256, 2048

    def kern_t(shift, x_ref, o_ref):
        v = x_ref[0]
        for _ in range(reps):
            v = pltpu.roll(v, Nt - shift, axis=0) + 1
        o_ref[0] = v

    def run_t(shift):
        return pl.pallas_call(
            functools.partial(kern_t, shift),
            grid=(B // 2,),
            in_specs=[pl.BlockSpec((1, Nt, BMt), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, Nt, BMt), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B // 2, Nt, BMt), jnp.int32),
        )

    xt = jnp.asarray(np.random.RandomState(0).randint(
        0, 100, (B // 2, Nt, BMt)), jnp.int32)
    for sh in (1, 8, 64, 128, 256, 512, 1024):
        timed(f"sublane roll x{reps}, shift={sh}", run_t(sh), xt)

    # mixed-shift chains (the butterfly's real pattern): one dependent
    # chain of 11 distinct power-of-2 shifts, lane vs sublane
    def kern_mix(axis, x_ref, o_ref):
        v = x_ref[0]
        n = v.shape[axis]
        for rep in range(2):
            for b in range(11):
                v = pltpu.roll(v, n - (1 << b), axis=axis) + 1
        o_ref[0] = v

    f_lane = pl.pallas_call(
        functools.partial(kern_mix, 1),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, BM, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BM, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, BM, N), jnp.int32),
    )
    timed("lane roll mixed shifts 1..1024 x22", f_lane, x)
    f_sub = pl.pallas_call(
        functools.partial(kern_mix, 0),
        grid=(B // 2,),
        in_specs=[pl.BlockSpec((1, Nt, BMt), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Nt, BMt), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // 2, Nt, BMt), jnp.int32),
    )
    timed("sublane roll mixed shifts 1..1024 x22", f_sub, xt)


if __name__ == "__main__":
    main()
