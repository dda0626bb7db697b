"""ResNet-18 image encoder for single-view reconstruction.

Re-implementation of the reference's `lib/networks/resnet.py`: a
torchvision-style ResNet-18 with a **4-channel input** (RGB + prepended
grayscale, reference resnet.py:129) and an extra BatchNorm + ReLU after the
fc head (resnet.py:142-143,200-202). No pretrained weights (the reference
never loads any).

Layout: NHWC (B, H, W, 4) — the idiomatic JAX/XLA convolution layout.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.layers import TorchBatchNorm
from ..ops.precision import matmul_precision


def _conv(features, kernel, stride, name):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        kernel_init=nn.initializers.variance_scaling(
            2.0, "fan_out", "normal"
        ),  # torch's kaiming_normal_(mode='fan_out') (resnet.py:153-156)
        precision=matmul_precision(),
        name=name,
    )


def _bn(train, name):
    # TorchBatchNorm: Bessel-corrected running_var, exactly torch's
    # BatchNorm2d train-time bookkeeping (see ops/layers.py)
    return TorchBatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.features, 3, self.stride, "conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, "conv2")(out)
        out = _bn(train, "bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _conv(self.features, 1, self.stride, "downsample_conv")(x)
            identity = _bn(train, "downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet18(nn.Module):
    """4-channel-input ResNet-18 with fc -> BN -> ReLU head
    (reference resnet.py:125-224)."""

    num_classes: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _conv(64, 7, 2, "conv1")(x)
        h = _bn(train, "bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for s, (n_blocks, feats) in enumerate(
            zip(self.stage_sizes, self.stage_features)
        ):
            for b in range(n_blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                h = BasicBlock(feats, stride, name=f"layer{s + 1}_{b}")(
                    h, train=train
                )
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        h = nn.Dense(self.num_classes, precision=matmul_precision(), name="fc")(h)
        h = _bn(train, "fc_bn")(h)
        return nn.relu(h)
