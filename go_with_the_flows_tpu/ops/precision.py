"""Model matmul-precision knob.

TPU matmuls default to bf16 multiply passes; the reference
(torch + CUDA, fp32 end-to-end) has no such mode, so numerical parity of
the flow stack on TPU requires explicitly pinning the model's matmuls to
fp32 accumulation. This knob controls the `precision` argument of every
matmul in the model stack (SharedDot einsum, conditioner/encoder Dense
layers, ResNet convs); the metric ops (ops/chamfer.py, ops/emd.py) pin
HIGHEST unconditionally — CD is reported at the 1e-4 scale, where bf16
passes are ~20% off.

Modes:
  * "highest": full fp32 passes — strict parity with the torch
    reference's fp32 math; the library-level default and a config
    opt-in on the CLIs. The measured on-TPU drift and throughput cost
    are published in RESULTS.md ("On-TPU numerical parity audit").
  * "high": bf16x3 passes (~f32 accuracy; drift audit: tensor drift
    equal to 'highest'). Since round 4 this is the CLI default only for
    the PAIRED eval modes (autoencoding / reconstruction — the paired
    F1@1e-4 is the one reported number that visibly moves under bf16
    drift, RESULTS.md round 4).
  * "fast": bf16 passes (the hardware default) — the CLI default for
    TRAINING (train_ae.py / train_svr.py; promoted by full-training
    end-metric A/Bs for both model families) and for GENERATING-mode
    eval (flagship paired A/B: every distributional metric identical to
    'highest' sampling). RESULTS.md round 4 holds all three gates.

The module-level default stays "highest" so library users get parity
unless a CLI/scope says otherwise.

The knob is read at TRACE time: set it (or enter the scope) BEFORE
building/jitting step functions. Already-compiled functions keep the
precision they were traced with. The CLIs set it once at startup from the
`matmul_precision` config key.
"""

from __future__ import annotations

import contextlib

import jax

_MODES = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "fast": None,
    "default": None,
}

_mode = "highest"


def set_matmul_precision(mode: str) -> None:
    """Set the model matmul precision: 'highest' | 'high' | 'fast'."""
    global _mode
    if mode not in _MODES:
        raise ValueError(
            f"matmul_precision must be one of {sorted(_MODES)}, got {mode!r}"
        )
    _mode = mode


def get_matmul_precision() -> str:
    return _mode


def matmul_precision():
    """The lax.Precision for model matmuls under the current mode
    (None = hardware default)."""
    return _MODES[_mode]


@contextlib.contextmanager
def matmul_precision_scope(mode: str):
    """Temporarily switch the precision mode (trace-time only — functions
    jitted inside the scope keep it)."""
    global _mode
    prev = _mode
    set_matmul_precision(mode)
    try:
        yield
    finally:
        _mode = prev
