"""ResNet-18 image-encoder parity: weights synced from the reference's
torch implementation (lib/networks/resnet.py — 4-channel input, fc_bn+ReLU
head) into the flax NHWC model must give identical outputs."""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REFERENCE, "lib"))
try:
    import torch  # noqa: F401

    HAVE_TORCH = True
except Exception:
    HAVE_TORCH = False

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not (HAVE_REF and HAVE_TORCH),
    reason="reference repo or torch unavailable",
)]

if HAVE_REF:
    sys.path.insert(0, REFERENCE)

import jax.numpy as jnp


def _t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def _conv(w):  # torch (O, I, kH, kW) -> flax (kH, kW, I, O)
    return np.transpose(_t2n(w), (2, 3, 1, 0))


def _bn(bn):
    return (
        {"scale": _t2n(bn.weight), "bias": _t2n(bn.bias)},
        {"mean": _t2n(bn.running_mean), "var": _t2n(bn.running_var)},
    )


def _block_vars(block):
    p, s = {}, {}
    p["conv1"] = {"kernel": _conv(block.conv1.weight)}
    p["bn1"], s["bn1"] = _bn(block.bn1)
    p["conv2"] = {"kernel": _conv(block.conv2.weight)}
    p["bn2"], s["bn2"] = _bn(block.bn2)
    if block.downsample is not None:
        p["downsample_conv"] = {
            "kernel": _conv(block.downsample[0].weight)
        }
        p["downsample_bn"], s["downsample_bn"] = _bn(block.downsample[1])
    return p, s


def test_resnet18_parity():
    import torch
    from lib.networks.resnet import resnet18

    from go_with_the_flows_tpu.models.resnet import ResNet18

    torch.manual_seed(20)
    num_classes = 16
    ref = resnet18(num_classes=num_classes)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.8, 1.2)
    ref.eval()

    params, stats = {}, {}
    params["conv1"] = {"kernel": _conv(ref.conv1.weight)}
    params["bn1"], stats["bn1"] = _bn(ref.bn1)
    for li, layer in enumerate(
        [ref.layer1, ref.layer2, ref.layer3, ref.layer4], start=1
    ):
        for bi, block in enumerate(layer):
            p, s = _block_vars(block)
            params[f"layer{li}_{bi}"] = p
            stats[f"layer{li}_{bi}"] = s
    params["fc"] = {"kernel": _t2n(ref.fc.weight).T,
                    "bias": _t2n(ref.fc.bias)}
    params["fc_bn"], stats["fc_bn"] = _bn(ref.fc_bn)

    mine = ResNet18(num_classes=num_classes)
    rng = np.random.RandomState(21)
    # small input keeps the test fast; 64 >= the 32x downsampling
    x = rng.randn(2, 4, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = mine.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False,
    )
    np.testing.assert_allclose(np.asarray(got), _t2n(want), rtol=5e-4,
                               atol=5e-5)
