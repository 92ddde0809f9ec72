"""Measure this chip's practical HBM bandwidth and VPU elementwise
throughput (the two resources the selection/gather-bound pipeline
actually spends), for the roofline accounting in docs/roofline_r4.md.

Same scan-window discipline as bench.py: one dispatch, carry-perturbed
inputs so XLA can't hoist the body.

  python scripts/probe_chip_limits.py            # TPU via the tunnel
"""
import argparse
import sys
import time

import numpy as np


def _window(jax, jnp, fn, x, iters):
    @jax.jit
    def w(x):
        def body(c, _):
            y = fn(c)
            return y, None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y[..., :1].astype(jnp.float32))
    _ = float(w(x))
    t0 = time.perf_counter()
    _ = float(w(x))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # --- HBM stream: y = x * c + c  on an array far beyond VMEM --------
    # reads 4B + writes 4B per element per iter = 8B/elem of HBM traffic
    for mb in (256, 512):
        n = mb * 1024 * 1024 // 4
        x = jnp.asarray(np.random.RandomState(0).rand(n).astype(np.float32))
        dt = _window(jax, jnp, lambda c: c * 1.000001 + 1e-9, x, args.iters)
        gbps = 2 * n * 4 / dt / 1e9
        print(f"HBM stream {mb} MiB: {dt*1e3:8.3f} ms/iter "
              f"-> {gbps:7.1f} GB/s", flush=True)

    # --- HBM gather: random-index take along a big table ----------------
    n = 64 * 1024 * 1024 // 4
    tbl = jnp.asarray(np.random.RandomState(1).rand(n).astype(np.float32))
    m = 8 * 1024 * 1024
    idx = jnp.asarray(np.random.RandomState(2).randint(0, n, size=m),
                      jnp.int32)

    def gather_fn(c):
        # rotate indices via the carry so each iter reads new rows
        i = (idx + c[0].astype(jnp.int32)) % n
        g = tbl[i]
        return g + c * 0.0

    x0 = jnp.zeros((m,), jnp.float32)
    dt = _window(jax, jnp, gather_fn, x0, args.iters)
    print(f"HBM gather {m/1e6:.0f}M f32 rows: {dt*1e3:8.3f} ms/iter "
          f"-> {m*4/dt/1e9:7.1f} GB/s effective", flush=True)

    # --- VPU elementwise: fma chain on a VMEM-resident block ------------
    # 64 fma per element per iter, block small enough to stay in VMEM
    n = 2 * 1024 * 1024  # 8 MiB f32
    x = jnp.asarray(np.random.RandomState(3).rand(n).astype(np.float32))

    def vpu_fn(c):
        y = c
        for _ in range(64):
            y = y * 1.000001 + 1e-9
        return y

    dt = _window(jax, jnp, vpu_fn, x, args.iters)
    print(f"VPU fma chain (8 MiB, 64 deep): {dt*1e3:8.3f} ms/iter "
          f"-> {64*n/dt/1e9:7.1f} Gfma/s "
          f"({2*64*n/dt/1e12:6.3f} f32 TFLOP/s)", flush=True)

    # --- on-chip sort throughput (what partition/median/top-k pay) ------
    B, N = 64, 2048
    x = jnp.asarray(np.random.RandomState(4).rand(B, N).astype(np.float32))
    dt = _window(jax, jnp, lambda c: jnp.sort(c, axis=-1) + 1e-9, x,
                 args.iters)
    print(f"sort (64,2048) rows: {dt*1e3:8.3f} ms/iter "
          f"-> {B*N/dt/1e6:7.1f} Melem/s", flush=True)


if __name__ == "__main__":
    main()
