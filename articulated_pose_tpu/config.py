"""Typed configuration.

One dataclass subsumes the reference's three config mechanisms —
argparse flags (reference: main.py:22-52), the YAML getter class
(reference: lib/network_config.py:8-162 + cfg/network_config.yml) and the
hardcoded registry (see registry.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import yaml

from articulated_pose_tpu.registry import CategorySpec, get_category


@dataclasses.dataclass
class NetworkConfig:
    """Training / model / loss configuration.

    Defaults mirror cfg/network_config.yml of the reference.
    """

    # --- experiment identity -------------------------------------------------
    nn_name: str = "ancsh"
    category: str = "eyeglasses"
    nocs_type: str = "ancsh"           # 'ancsh' (part+global NOCS) | 'npcs' (part only)
    experiment_dir: str = "results"

    # --- model ---------------------------------------------------------------
    n_max_parts: int = 3               # reference cfg: n_max_parts: 3
    num_points: int = 1024             # reference lib/dataset.py:35
    pred_joint: bool = True
    pred_joint_ind: bool = True
    early_split_nocs: bool = True
    dropout_rate: float = 0.5          # reference keep_prob=0.5
    # backbone width preset: 'reference' (architectures.py:62-93 widths)
    # or 'tiny' (same topology, trimmed widths — for CLI smokes and
    # compile-bound CI on slow hosts; NOT a production recipe)
    backbone_preset: str = "reference"
    # backbone compute dtype; params stay f32 either way.  float32 is the
    # measured training default (bf16 training collapsed accuracy AND ran
    # slower — the pipeline is gather-bound, not MXU-bound); bf16 is
    # accuracy-neutral for INFERENCE and used by bench/serving forwards.
    # A/B protocol + numbers: docs/dtype_ab.md.
    compute_dtype: str = "float32"
    # output-head dtype override (None = compute_dtype): "float32" keeps
    # head logits/gradients f32 under a bf16 trunk (docs/dtype_ab.md)
    head_compute_dtype: Optional[str] = None
    # backbone mixed-precision policy under a bf16 trunk (docs/dtype_ab.md):
    # pool_compute_dtype="float32" keeps each SA stage's pre-pool
    # activation and max selection unrounded (pooled output cast back);
    # act_compute_dtype="float32" keeps ALL inter-layer activations f32
    # so only the matmuls run bf16.
    pool_compute_dtype: Optional[str] = None
    act_compute_dtype: Optional[str] = None
    # backbone stages pinned to f32 under a bf16 trunk ("sa1", "sa2",
    # "sa_global", "fp1".."fp3", "fc1").  The round-3 gradient bisect
    # (docs/dtype_ab.md) localized the bf16 training collapse to SA1's
    # bf16 compute (grad cosine 0.19 vs f32 at trained params, norm 5.6x,
    # unaffected by head/pool/activation-dtype interventions); SA1's
    # MLPs are <1 ms of the forward, so pinning them f32 is ~free.
    f32_stages: tuple = ()
    use_pallas: bool = True            # Pallas FPS kernel when on TPU
    # packed butterfly ball query: coordinates ride the compaction
    # network as ONE 10-bit-quantized i32 plane instead of three f32
    # planes (SA1 4.96 -> 3.55 ms).  Grouped coords carry <= extent/2046
    # absolute error (idx/cnt exact — parity-tested) — below the bf16
    # rounding the inference trunk applies anyway; perf + bound evidence
    # in docs/perf_round3.md.
    ball_query_packed: bool = False

    # --- losses (reference cfg/network_config.yml:12-22,64) -------------------
    miou_loss_multiplier: float = 1.0
    nocs_loss_multiplier: float = 10.0
    gocs_loss_multiplier: float = 1.0
    offset_loss_multiplier: float = 5.0    # heatmap & unitvec
    orient_loss_multiplier: float = 0.2
    index_loss_multiplier: float = 1.0
    total_loss_multiplier: float = 1.0
    coord_regress_loss: str = "L2"     # 'L2' | 'Soft_L1' | 'L1'

    # --- schedule (reference cfg:44-49) ---------------------------------------
    batch_size: int = 16
    n_epochs: int = 1000
    init_learning_rate: float = 1e-3
    decay_step: int = 200_000          # in samples (global_step * batch_size)
    decay_rate: float = 0.7
    bn_decay_step: int = 200_000
    val_interval: int = 5000
    snapshot_interval: int = 1000
    val_prediction_n_keep: int = 2
    writer_start_step: int = 100

    # --- data ----------------------------------------------------------------
    data_root: str = "data"
    num_expr: str = "0.01"
    # Gaussian input-point jitter on training samples (provider.py:99-112
    # semantics).  NOTE: the reference's cfg sets this true but its loader
    # never consumes the flag (lib/dataset.py:436,558 accept add_noise and
    # ignore it), so the reference effectively trains WITHOUT noise —
    # default False matches that behavior; True actually augments here.
    train_data_add_noise: bool = False
    fixed_order_val: bool = True
    thres_r: float = 0.2               # joint-association radius (reference dataset.py:535)

    # --- pose fitting (reference parallel_ancsh_pose.py:262,288) --------------
    ransac_niter_part: int = 128       # reference: 10000 serial CPU iters; flat accuracy >=128 (ab_ransac_strength)
    ransac_niter_joint: int = 64       # reference: 200; flat >=64 in the same sweep
    ransac_inlier_th: float = 0.1
    lm_iters: int = 20
    use_gt_joint_association: bool = False   # reference evaluation/ uses GT assoc; we default honest

    # --- parallelism ----------------------------------------------------------
    mesh_shape: Optional[str] = None   # e.g. "data=4,model=2"; None = all-data mesh
    seed: int = 0

    # -------------------------------------------------------------------------
    @property
    def is_mixed(self) -> bool:
        """ANCSH mode regresses part + global NOCS (reference lib/network.py:36-38)."""
        return self.nocs_type == "ancsh"

    @property
    def category_spec(self) -> CategorySpec:
        return get_category(self.category)

    def replace(self, **kw) -> "NetworkConfig":
        return dataclasses.replace(self, **kw)


def load_config(path: Optional[str] = None, **overrides) -> NetworkConfig:
    """Load a NetworkConfig from YAML (flat mapping), applying overrides."""
    fields = {}
    if path is not None:
        with open(path) as f:
            fields.update(yaml.safe_load(f) or {})
    fields.update(overrides)
    known = {f.name for f in dataclasses.fields(NetworkConfig)}
    unknown = set(fields) - known
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    cfg = NetworkConfig(**fields)
    if cfg.nocs_type not in ("ancsh", "npcs"):
        raise ValueError(f"nocs_type must be 'ancsh' or 'npcs', got {cfg.nocs_type!r}")
    if cfg.f32_stages:
        # fail loudly on typos: a silently-ignored stage name would undo
        # the bf16-collapse pin this field exists for (docs/dtype_ab.md)
        stages = tuple(str(s).strip() for s in cfg.f32_stages)
        valid = {"sa1", "sa2", "sa_global", "fp1", "fp2", "fp3", "fc1"}
        bad = [s for s in stages if s not in valid]
        if bad:
            raise ValueError(f"unknown f32_stages {bad}; valid: {sorted(valid)}")
        cfg = cfg.replace(f32_stages=stages)
    # mode presets (reference main.py:42-52): npcs disables the joint heads' use
    if cfg.nocs_type == "npcs":
        cfg = cfg.replace(pred_joint=False, pred_joint_ind=False)
    return cfg


def bn_momentum_schedule(step: int, batch_size: int, bn_decay_step: int):
    """EMA momentum for batch-norm statistics.

    The reference schedules tf.contrib batch_norm's ``decay`` as
    min(0.99, 1 - 0.5 * 0.5^(step*B/bn_decay_step)) (reference:
    lib/network.py:385-398).  Returns that decay (our BN's EMA momentum).
    """
    import jax.numpy as jnp

    samples = step * batch_size
    bn_momentum = 0.5 * jnp.power(0.5, jnp.floor(samples / bn_decay_step))
    return jnp.minimum(0.99, 1.0 - bn_momentum)


def lr_schedule(step, batch_size: int, init_lr: float, decay_step: int, decay_rate: float):
    """Staircase exponential LR decay in units of samples (reference lib/network.py:400-407)."""
    import jax.numpy as jnp

    samples = step * batch_size
    return init_lr * jnp.power(decay_rate, jnp.floor(samples / decay_step))
