"""Device-mesh parallelism.

The reference is a single-process single-GPU codebase (SURVEY.md §2.3);
its only "multi-device" story was launching independent jobs with
CUDA_VISIBLE_DEVICES pinning (reference: main.py:56-59).  Here scaling
is first-class and TPU-native:

- a (data, model) `jax.sharding.Mesh` over the slice's ICI,
- batch sharded over 'data' (pure DP — the throughput lever for the
  10k-clouds/sec target),
- the widest backbone layers (the 1024-wide global-SA MLP and the FP
  trunk) tensor-sharded over 'model' on their output-feature axis,
- GSPMD/jit inserts the gradient psum and activation collectives; no
  hand-written NCCL analogue exists or is needed.

Sequence/pipeline/expert parallelism do not apply to this model family
(no attention, 3-layer hierarchy, no MoE) — the scaling axis analogous
to sequence length is point count N, which shards trivially *within*
ball-query/FPS blocks, not across chips (SURVEY.md §5).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parameters whose output-feature axis is worth tensor-sharding: the
# global SA stage (512/1024-wide) and first FP stage.
_TP_PATTERN = re.compile(r"(sa_global/mlp/conv[12]|fp1/mlp/conv0)/dense/kernel")
_TP_MIN_FEATURES = 256


def make_mesh(spec: Optional[str] = None, devices=None) -> Mesh:
    """Build a mesh from "data=4,model=2"-style spec (None: all 'data')."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not spec:
        return Mesh(np.asarray(devices), ("data",))
    names, sizes = [], []
    for part in spec.split(","):
        k, v = part.split("=")
        names.append(k.strip())
        sizes.append(int(v))
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh spec {spec!r} needs {np.prod(sizes)} devices, have {n}")
    return Mesh(np.asarray(devices).reshape(sizes), tuple(names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def _param_spec(path: str, leaf, mesh: Mesh) -> P:
    if ("model" in mesh.axis_names and hasattr(leaf, "ndim") and leaf.ndim >= 1
            and _TP_PATTERN.search(path)
            and leaf.shape[-1] >= _TP_MIN_FEATURES
            and leaf.shape[-1] % mesh.shape["model"] == 0):
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def state_shardings(state, mesh: Mesh):
    """NamedSharding pytree for a TrainState: TP for wide kernels, else replicated.

    Adam moments mirror the params tree, so the same path rule shards them
    consistently.
    """

    def one(path, leaf):
        pstr = "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
        return NamedSharding(mesh, _param_spec(pstr, leaf, mesh))

    return jax.tree_util.tree_map_with_path(one, state)


def shard_serving_setup(run_fn, variables, mesh: Mesh):
    """SPMD data-parallel inference: `shard_map` over the 'data' axis.

    `run_fn(variables, P, key)` is the fused forward + pose-fit body
    (serving.py).  Variables replicate; the batch axis shards.  Unlike
    the train path (plain jit + GSPMD), inference is wrapped in
    `shard_map` so each device's Pallas kernels see only the LOCAL
    (B/data, N, 3) shard — GSPMD cannot repartition through a
    `pallas_call`, but under shard_map the kernel grid is per-device by
    construction, which is the idiomatic TPU pattern for custom kernels
    under SPMD.  The RNG key is folded with the data-axis index so pose
    RANSAC draws stay distinct across shards.

    Returns (sharded_run, placed_variables, batch_sharding); outputs
    come back sharded on 'data' (global arrays, transparent to callers).
    """

    def body(variables, P_local, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return run_fn(variables, P_local, key)

    run = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=P("data"),
        check_vma=False,  # key fold-in is deliberately axis-dependent
    )
    placed = jax.device_put(variables, NamedSharding(mesh, P()))
    return jax.jit(run), placed, batch_sharding(mesh)


def shard_train_setup(train_step_fn, state, mesh: Mesh):
    """jit the train step over the mesh.

    Returns (sharded_step, sharded_state, batch_sharding).  The state is
    placed according to state_shardings; the batch is sharded on 'data'.
    """
    st_sh = state_shardings(state, mesh)
    b_sh = batch_sharding(mesh)
    placed = jax.device_put(state, st_sh)
    step = jax.jit(
        train_step_fn,
        in_shardings=(st_sh, b_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    return step, placed, b_sh
