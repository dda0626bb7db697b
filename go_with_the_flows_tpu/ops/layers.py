"""Primitive layers.

TPU-native counterparts of the reference's `lib/networks/layers.py`:
a per-point shared linear map ("SharedDot", reference layers.py:13-45) and the
Swish activation (layers.py:5-10; we use `jax.nn.silu`, which is the same
function).

Data layout: point features are carried as ``(B, C, N)`` — batch,
channels, points — mirroring the reference semantics (BatchNorm over the
channel axis, max-pool over the point axis). XLA is free to relayout; the
einsum below contracts channels and keeps N (2048) on the fast (lane)
dimension, which maps well onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .precision import matmul_precision

# torch's default nn.Linear init (kaiming_uniform with a=sqrt(5)) reduces to
# U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both kernel and bias. We match that
# scale so optimization dynamics at init are statistically comparable.
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_linear_bias_init(in_features: int):
    bound = 1.0 / (in_features ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _shared_dot_kernel_init(key, shape, dtype=jnp.float32):
    """Init matching the scale torch's kaiming_uniform_ produces on the
    reference's (1, out, in) SharedDot weight tensor (layers.py:29-33), where
    torch computes fan_in = out*in for that 3-D shape."""
    out_features, in_features = shape
    bound = (6.0 / (out_features * in_features)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SharedDot(nn.Module):
    """Per-point linear layer: a (out, in) matrix applied to every point.

    Equivalent to the reference's SharedDot with n_channels=1
    (layers.py:40-45): ``out[b, o, n] = sum_i W[o, i] x[b, i, n] (+ bias[o])``.
    """

    out_features: int
    use_bias: bool = False
    kernel_init: nn.initializers.Initializer = _shared_dot_kernel_init

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[1]
        kernel = self.param(
            "kernel", self.kernel_init, (self.out_features, in_features)
        )
        y = jnp.einsum(
            "oi,bin->bon", kernel, x, preferred_element_type=x.dtype,
            precision=matmul_precision(),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.out_features,)
            )
            y = y + bias[None, :, None]
        return y


class TorchBatchNorm(nn.Module):
    """BatchNorm with EXACT torch `_BatchNorm` training semantics.

    Differs from flax `nn.BatchNorm` in one place: torch normalizes with
    the BIASED batch variance but blends the UNBIASED (Bessel-corrected,
    x n/(n-1)) variance into `running_var` (torch functional.batch_norm);
    flax blends the biased one. The gap per update is var/(n-1) — noise
    for point-axis BNs (n = B*N) but up to 33% per update for the
    B-reduced FiLM BNs at small batch — and it lands exactly where
    checkpoint equivalence is judged: eval-time normalization. Found by
    the step-locked training parity test (tests/test_training_parity.py).

    Variable/param names and stat math mirror flax `nn.BatchNorm`
    (batch_stats {mean, var}, params {scale, bias}; float32 stats,
    fast-variance E[x^2] - E[x]^2 clipped at 0) so checkpoints and
    weight-synced tests are unaffected.
    """

    use_running_average: bool
    axis: int = -1
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        feature_axis = self.axis % x.ndim
        red_axes = tuple(i for i in range(x.ndim) if i != feature_axis)
        feat_shape = (x.shape[feature_axis],)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros(feat_shape, jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones(feat_shape, jnp.float32),
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=red_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=red_axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = 1
                for i in red_axes:
                    n *= x.shape[i]
                bessel = float(n) / float(max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * bessel)
        shape = [1] * x.ndim
        shape[feature_axis] = -1
        y = (x - mean.reshape(shape).astype(x.dtype)) * jax.lax.rsqrt(
            var.reshape(shape).astype(x.dtype) + self.epsilon
        )
        if self.use_scale:
            scale = self.param(
                "scale", nn.initializers.ones_init(), feat_shape
            )
            y = y * scale.reshape(shape).astype(x.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), feat_shape
            )
            y = y + bias.reshape(shape).astype(x.dtype)
        return y


def batch_norm(train: bool, axis: int, name: str, affine: bool = True,
               momentum: float = 0.9) -> TorchBatchNorm:
    """BatchNorm configured to match torch BatchNorm1d semantics
    (momentum 0.1 in torch convention == 0.9 in flax, eps 1e-5,
    Bessel-corrected running_var — see TorchBatchNorm). `momentum`
    overrides the running-stat blend for modules the reference invokes
    more than once per step (K same-batch updates == one momentum^K
    update).

    Under `jit` SPMD over a device mesh the batch axis is global, so the
    batch statistics are automatically synchronized across replicas — this is
    the TPU-native equivalent of the reference's SyncBatchNorm conversion
    (train_ae.py:152).
    """
    return TorchBatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=1e-5,
        axis=axis,
        use_scale=affine,
        use_bias=affine,
        name=name,
    )
