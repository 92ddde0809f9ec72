"""NN layer primitives.

TPU-first equivalents of the reference's TF layer wrappers
(reference: pointnet_plusplus/utils/tf_util.py):

- 1×1 convs over point sets are plain Dense layers applied pointwise —
  on TPU that is a single large (B·N, C_in)×(C_in, C_out) matmul on the
  MXU; there is no spatial kernel to convolve.
- Batch norm takes its EMA momentum as a *runtime* scalar so the
  reference's decayed bn-momentum schedule (tf_util.py:512-532,
  lib/network.py:385-398) works under one compiled train step.
- Compute dtype is configurable (bf16 matmuls, f32 statistics/params).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ScheduledBatchNorm(nn.Module):
    """Batch norm whose EMA momentum is a traced runtime value.

    Normalizes over all axes but the last (matching TF's fused batch norm
    over conv activations).  Statistics and params are kept in f32.
    """

    epsilon: float = 1e-3          # tf.contrib.layers.batch_norm default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool, momentum) -> jax.Array:
        feat = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)

        if train:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=reduce_axes)
            var = jnp.var(x32, axis=reduce_axes)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype)


class PointConv(nn.Module):
    """Pointwise (1×1) conv: Dense + optional BN + activation.

    Equivalent of tf_util.conv1d/conv2d with kernel size 1 (the only way
    the reference ever uses them).  Xavier-uniform init matches
    tf_util.py:52-64.
    """

    features: int
    use_bn: bool = True
    activation: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32
    # dtype the layer *emits* (None = self.dtype).  The matmul still runs
    # at self.dtype; out_dtype=f32 under a bf16 compute dtype keeps the
    # post-BN activation unrounded — the mixed-precision policy knob.
    out_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, bn_momentum=0.9) -> jax.Array:
        odt = self.dtype if self.out_dtype is None else self.out_dtype
        y = nn.Dense(
            self.features,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )(x.astype(self.dtype))
        if self.use_bn:
            y = ScheduledBatchNorm(dtype=odt, name="bn")(
                y, train=train, momentum=bn_momentum)
        else:
            y = y.astype(odt)
        if self.activation is not None:
            y = self.activation(y)
        return y


class SharedMLP(nn.Module):
    """Stack of PointConv layers applied to every point/neighborhood."""

    channels: Sequence[int]
    use_bn: bool = True
    dtype: Dtype = jnp.float32
    # dtype of the FINAL layer's output (None = dtype); intermediate
    # layers always emit self.dtype.
    out_dtype: Optional[Dtype] = None
    # dtype EVERY layer emits (None = dtype); overrides out_dtype when
    # set — the "bf16 matmuls, f32 activations" policy.
    act_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, bn_momentum=0.9) -> jax.Array:
        last = len(self.channels) - 1
        for i, ch in enumerate(self.channels):
            odt = self.act_dtype if self.act_dtype is not None else (
                self.out_dtype if i == last else None)
            x = PointConv(ch, use_bn=self.use_bn, dtype=self.dtype,
                          out_dtype=odt,
                          name=f"conv{i}")(x, train=train, bn_momentum=bn_momentum)
        return x
