"""On-chip A/B: exact vs packed-key three_nn at FP1 shape (B=64, 2048<-512)."""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from articulated_pose_tpu.ops.pallas.three_nn import three_nn_pallas
from articulated_pose_tpu import ops

ITERS = 64
B, N, M = 64, 2048, 512
r = np.random.RandomState(0)
Q = jnp.asarray(r.rand(B, N, 3), jnp.float32)
P = jnp.asarray(r.rand(B, M, 3), jnp.float32)

def timed(name, fn, *xs):
    @jax.jit
    def window(*xs):
        def body(acc, _):
            eps = 1e-30 * acc
            xs_i = jax.tree.map(lambda a: a + eps.astype(a.dtype)
                                if jnp.issubdtype(a.dtype, jnp.floating) else a, xs)
            out = fn(*xs_i)
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree.leaves(out)), None
        acc, _ = jax.lax.scan(body, jnp.ones((), jnp.float32), None, length=ITERS)
        return acc
    _ = float(window(*xs))
    t0 = time.perf_counter(); _ = float(window(*xs))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:<24s} {dt*1e3:8.3f} ms/iter", flush=True)

# parity first (on chip)
d_e, i_e = three_nn_pallas(Q, P)
d_p, i_p = three_nn_pallas(Q, P, packed=True)
d_e, i_e, d_p, i_p = map(np.asarray, (d_e, i_e, d_p, i_p))
agree = (i_e == i_p).mean()
print(f"idx agreement: {agree:.6f}  max reldiff dist: "
      f"{(np.abs(d_p - d_e) / np.maximum(d_e, 1e-9)).max():.3e}", flush=True)
for rep in range(2):
    timed("exact", lambda q, p: three_nn_pallas(q, p), Q, P)
    timed("packed", lambda q, p: three_nn_pallas(q, p, packed=True), Q, P)
