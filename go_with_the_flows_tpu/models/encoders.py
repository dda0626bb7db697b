"""Encoders: PointNet cloud encoder, feature/weights MLP encoders.

TPU-native re-implementations of the reference's `lib/networks/encoders.py`.
Layout: point clouds are (B, C, N); latent features are (B, F).
"""

from __future__ import annotations

from typing import Sequence, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.precision import matmul_precision

from ..ops.layers import (
    SharedDot,
    batch_norm,
    torch_linear_kernel_init,
)


class PointNetCloudEncoder(nn.Module):
    """Per-point SharedDot + BN + ReLU stack (reference encoders.py:9-28).

    Channels: init_n_channels -> init_n_features -> n_features[0..].
    The caller max-pools over the point axis (reference models.py:128).
    """

    init_n_features: int
    n_features: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = SharedDot(self.init_n_features, name="init_sd")(x)
        h = batch_norm(train, 1, "init_sd_bn")(h)
        h = nn.relu(h)
        for i, f in enumerate(self.n_features):
            h = SharedDot(f, name=f"sd{i}")(h)
            h = batch_norm(train, 1, f"sd{i}_bn")(h)
            h = nn.relu(h)
        return h


class FeatureEncoder(nn.Module):
    """n-layer Linear+BN+Swish MLP with `mus` (and optional `logvars`) heads.

    Reference encoders.py:31-83. The heads use the reference's near-identity
    init: weight ~ N(0, std), bias = const (encoders.py:60-72).
    """

    n_layers: int
    latent_space_size: int
    deterministic: bool = False
    use_batch_norm: bool = True
    mu_weight_std: float = 0.001
    mu_bias: float = 0.0
    logvar_weight_std: float = 0.01
    logvar_bias: float = 0.0
    # torch-equivalent running-stat momentum. The mixture's SHARED
    # p_prior is invoked once per component in the reference's decode
    # loop (flow_mixture.py:163-167 -> one_flow_decode -> p_prior), i.e.
    # K momentum-0.9 updates per step with the SAME batch — identical to
    # a single update with momentum 0.9^K, which is what the vmapped
    # single-call path here must use (found by the step-locked training
    # parity test).
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        h = x
        for i in range(self.n_layers):
            h = nn.Dense(
                x.shape[-1],
                use_bias=False,
                kernel_init=torch_linear_kernel_init,
                precision=matmul_precision(),
                name=f"mlp{i}",
            )(h)
            if self.use_batch_norm:
                h = batch_norm(train, -1, f"mlp{i}_bn",
                               momentum=self.bn_momentum)(h)
            h = jax.nn.silu(h)

        mus = nn.Dense(
            self.latent_space_size,
            kernel_init=nn.initializers.normal(stddev=self.mu_weight_std),
            bias_init=nn.initializers.constant(self.mu_bias),
            precision=matmul_precision(),
            name="mu_head",
        )(h)
        if self.deterministic:
            return mus
        logvars = nn.Dense(
            self.latent_space_size,
            kernel_init=nn.initializers.normal(stddev=self.logvar_weight_std),
            bias_init=nn.initializers.constant(self.logvar_bias),
            precision=matmul_precision(),
            name="logvar_head",
        )(h)
        return mus, logvars


class WeightsEncoder(nn.Module):
    """FeatureEncoder whose mus head is log-softmax'd into mixture
    log-weights (reference encoders.py:85-89)."""

    n_layers: int
    n_components: int
    mu_weight_std: float = 0.001
    mu_bias: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mus = FeatureEncoder(
            n_layers=self.n_layers,
            latent_space_size=self.n_components,
            deterministic=True,
            mu_weight_std=self.mu_weight_std,
            mu_bias=self.mu_bias,
            name="features",
        )(x, train=train)
        return jax.nn.log_softmax(mus, axis=-1)
