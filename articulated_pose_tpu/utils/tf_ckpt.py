"""Reference (TF1) checkpoint ingestion.

Maps the reference's variable naming (scopes like
`SPFN/est_net/layer1/conv0/weights`, `.../bn/...`,
`SPFN/nocs_net/fc2_0/...`, `SPFN/joint_net/fc3_0/...` — see
lib/architecture.py:86-208, pointnet_plusplus/architectures.py:56-95,
tf_util.py conv scopes) onto this framework's Flax parameter tree, for
output-parity testing against reference checkpoints (BASELINE.md
protocol).

TensorFlow is not installed in this environment, so the loader consumes
an .npz export of the checkpoint ({var_name: array}), producible
anywhere with TF via:

    import tensorflow as tf, numpy as np
    r = tf.train.load_checkpoint(path)
    np.savez("ckpt.npz", **{k: r.get_tensor(k)
                            for k in r.get_variable_to_shape_map()})
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

# (tf scope regex) -> (flax path template) ; \g<n> backrefs carry indices
_RULES: Tuple[Tuple[str, str], ...] = (
    # SA stages: the global stage (layer3) must match before layer[12]
    (r"SPFN/est_net/layer3/conv(\d)",
     r"backbone/sa_global/mlp/conv\1"),
    (r"SPFN/est_net/layer([12])/conv(\d)",
     r"backbone/sa\1/mlp/conv\2"),
    # FP stages
    (r"SPFN/est_net/fa_layer(\d)/conv_(\d)",
     r"backbone/fp\1/mlp/conv\2"),
    # FC head
    (r"SPFN/est_net/fc1",
     r"backbone/fc1"),
    # output heads
    (r"SPFN/nocs_net/fc11_(\d)",
     r"fc11_\1"),
    (r"SPFN/nocs_net/fc2_(\d)",
     r"fc2_\1"),
    # joint head
    (r"SPFN/joint_net/fc3_(\d)",
     r"joint_net/fc3_\1"),
    (r"SPFN/joint_net/fc4_(\d)",
     r"joint_net/fc4_\1"),
)

_LEAF_MAP = {
    "weights": ("dense", "kernel"),
    "biases": ("dense", "bias"),
    "bn/gamma": ("bn", "scale"),
    "bn/beta": ("bn", "bias"),
    "bn/moving_mean": ("bn", "mean"),      # batch_stats collection
    "bn/moving_variance": ("bn", "var"),   # batch_stats collection
}


def map_var_name(tf_name: str) -> Optional[Tuple[Tuple[str, ...], bool]]:
    """TF variable name -> (flax path tuple, is_batch_stat) or None."""
    tf_name = tf_name.strip("/")
    for leaf_tf, (sub, leaf) in sorted(_LEAF_MAP.items(),
                                       key=lambda kv: -len(kv[0])):
        if tf_name.endswith("/" + leaf_tf):
            scope = tf_name[: -len(leaf_tf) - 1]
            for pat, repl in _RULES:
                if re.fullmatch(pat, scope):
                    flax_scope = re.sub(pat, repl, scope)
                    is_stat = leaf in ("mean", "var")
                    path = tuple(flax_scope.split("/")) + (sub, leaf)
                    return path, is_stat
            return None
    return None


def _convert_kernel(arr: np.ndarray) -> np.ndarray:
    """TF conv kernels (1, 1, Cin, Cout) / (1, Cin, Cout) -> Dense (Cin, Cout)."""
    if arr.ndim == 4 and arr.shape[0] == 1 and arr.shape[1] == 1:
        return arr[0, 0]
    if arr.ndim == 3 and arr.shape[0] == 1:
        return arr[0]
    return arr


def load_reference_weights(ckpt_path: str, params: Dict, batch_stats: Dict):
    """Overlay reference weights onto (params, batch_stats) pytrees.

    `ckpt_path` is either an .npz export ({var_name: array}) or a TF1
    checkpoint-bundle prefix (`.../tf_model.ckpt-<step>`, with `.index`
    and `.data-*` files next to it) — the latter is parsed directly with
    the pure-NumPy reader in utils/tf_bundle.py, no TensorFlow needed.

    Returns (new_params, new_batch_stats, report) where report lists
    mapped / unmapped / shape-mismatched variables.
    """
    import os

    if ckpt_path.endswith(".npz"):
        raw = dict(np.load(ckpt_path))
    else:
        from articulated_pose_tpu.utils.tf_bundle import read_bundle

        prefix = (ckpt_path[: -len(".index")]
                  if ckpt_path.endswith(".index") else ckpt_path)
        if not os.path.exists(prefix + ".index"):
            raise FileNotFoundError(
                f"{ckpt_path}: neither an .npz export nor a checkpoint "
                f"bundle prefix ({prefix}.index missing)")
        raw = read_bundle(prefix)
    flat_p = _flatten(params)
    flat_s = _flatten(batch_stats)
    mapped, unmapped, mismatched = [], [], []
    for name, arr in raw.items():
        if name.endswith(("/Adam", "/Adam_1")) or name in ("global_step", "Variable"):
            continue
        hit = map_var_name(name)
        if hit is None:
            unmapped.append(name)
            continue
        path, is_stat = hit
        target = flat_s if is_stat else flat_p
        arr = _convert_kernel(np.asarray(arr))
        if path not in target:
            unmapped.append(name)
            continue
        if target[path].shape != arr.shape:
            mismatched.append((name, target[path].shape, arr.shape))
            continue
        target[path] = arr.astype(np.asarray(target[path]).dtype)
        mapped.append(name)
    report = {"mapped": mapped, "unmapped": unmapped, "mismatched": mismatched}
    return _unflatten(flat_p, params), _unflatten(flat_s, batch_stats), report


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray], template):
    def build(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: build(v, prefix + (k,)) for k, v in tree.items()}
        return flat[prefix]

    return build(template)
