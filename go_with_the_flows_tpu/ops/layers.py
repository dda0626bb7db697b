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


def batch_norm(train: bool, axis: int, name: str, affine: bool = True,
               axis_name: str | None = None) -> nn.BatchNorm:
    """BatchNorm configured to match torch BatchNorm1d semantics
    (momentum 0.1 in torch convention == 0.9 in flax, eps 1e-5).

    Under `jit` SPMD over a device mesh the batch axis is global, so the
    batch statistics are automatically synchronized across replicas — this is
    the TPU-native equivalent of the reference's SyncBatchNorm conversion
    (train_ae.py:152). `axis_name` is only needed under shard_map/pmap.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        axis=axis,
        use_scale=affine,
        use_bias=affine,
        axis_name=axis_name,
        name=name,
    )
