"""Conditional RealNVP coupling flows, TPU-first.

Functional re-design of the reference's `lib/networks/flows.py` +
`lib/networks/decoders.py`:

  * the point coupling (reference flows.py:10-117) — an affine coupling over
    the 3 xyz channels whose conditioner is FiLM-modulated by the shape
    latent ``g``;
  * the latent coupling (flows.py:163-243) — an affine coupling over the
    g-dimensional latent;
  * the stacks (decoders.py:7-79) — alternating warp patterns, runnable in
    ``direct`` and ``inverse`` mode.

TPU-first differences from the reference:

  * Stacks return the running **sum of log-variances** (the quantity every
    loss actually consumes as the log-determinant, reference losses.py:14,
    :29, :115) instead of Python lists of per-layer tensors — O(1) live
    activations rather than O(n_flows).
  * All warp/keep index sets are static tuples, so every gather/scatter
    compiles to static slices; there is no data-dependent control flow and
    the whole stack fuses under `jit`.
  * Exact-math parity notes: the point coupling applies
    ``p' = sqrt(eps + exp(logvar)) * p + mu`` over the FULL 3 channels with
    mu/logvar zero-filled on the kept channels (flows.py:112-115) — so kept
    channels are scaled by sqrt(1+eps), not exactly 1. We reproduce this.
    The latent coupling uses ``exp(0.5*logvar)`` (flows.py:208-211), which is
    exactly 1 on kept dims.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.layers import (
    SharedDot,
    batch_norm,
    torch_linear_kernel_init,
    torch_linear_bias_init,
)
from ..ops.precision import matmul_precision


def _near_identity_kernel(weight_std: float):
    return nn.initializers.normal(stddev=weight_std)


def _dense(features, use_bias, name, in_features=None, near_identity_std=None):
    """torch-style nn.Linear; optionally with the reference's near-identity
    init (weight ~ N(0, std), bias = 0; reference flows.py:52-58)."""
    if near_identity_std is not None:
        kernel_init = _near_identity_kernel(near_identity_std)
        bias_init = nn.initializers.zeros_init()
    else:
        kernel_init = torch_linear_kernel_init
        bias_init = (
            torch_linear_bias_init(in_features)
            if in_features is not None
            else nn.initializers.zeros_init()
        )
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=kernel_init,
        bias_init=bias_init,
        precision=matmul_precision(),
        name=name,
    )


class _FiLMNet(nn.Module):
    """Conditioner-modulation MLP: Linear(g->f, no bias) -> BN -> Swish ->
    Linear(f->f, bias) with near-identity last layer.
    Reference flows.py:33-45 (T_*_0_cond_w / T_*_0_cond_b)."""

    f_features: int
    weight_std: float

    @nn.compact
    def __call__(self, g: jax.Array, train: bool) -> jax.Array:
        h = _dense(self.f_features, False, "film0")(g)
        h = batch_norm(train, -1, "film0_bn")(h)
        h = jax.nn.silu(h)
        h = _dense(
            self.f_features, True, "film1",
            near_identity_std=self.weight_std,
        )(h)
        return h


class _PointConditioner(nn.Module):
    """One conditioner head of the point coupling (mu or logvar path).

    Reference flows.py:25-50 & :99-107:
      T1( relu( (eps + exp(FiLM_w(g))) * T0(p_keep) + FiLM_b(g) ) )
    where T0 = SharedDot -> BN -> ReLU -> SharedDot -> BN(affine=False)
    and T1 = SharedDot(f -> |warp|, bias) with near-identity init.
    """

    f_features: int
    n_warp: int
    weight_std: float
    eps: float

    @nn.compact
    def __call__(self, p_keep: jax.Array, g: jax.Array, train: bool) -> jax.Array:
        h = SharedDot(self.f_features, name="sd0")(p_keep)
        h = batch_norm(train, 1, "sd0_bn")(h)
        h = nn.relu(h)
        h = SharedDot(self.f_features, name="sd1")(h)
        h = batch_norm(train, 1, "sd1_bn", affine=False)(h)

        w = _FiLMNet(self.f_features, self.weight_std, name="cond_w")(g, train)
        b = _FiLMNet(self.f_features, self.weight_std, name="cond_b")(g, train)
        h = (self.eps + jnp.exp(w))[:, :, None] * h + b[:, :, None]

        h = nn.relu(h)
        out = SharedDot(
            self.n_warp,
            use_bias=True,
            kernel_init=_near_identity_kernel(self.weight_std),
            name="sd2",
        )(h)
        return out


class CondAffineCoupling3D(nn.Module):
    """One conditional RealNVP affine coupling over the 3 xyz channels.

    Reference flows.py:10-117 (CondRealNVPFlow3D). Given points ``p`` of
    shape (B, 3, N) and a latent ``g`` (B, G), warps the channels in
    ``warp_inds`` conditioned on the complementary kept channels and ``g``:

        logvar[warp] = softsign(T_logvar(p_keep, g))
        mu[warp]     = T_mu(p_keep, g)
        direct:  p' = sqrt(eps + exp(logvar)) * p + mu
        inverse: p' = (p - mu) / sqrt(eps + exp(logvar))

    applied full-width with zero-filled mu/logvar on kept channels.
    Returns (p_out, logvar) — logvar is the loss's per-layer log-det
    contribution (reference losses.py:115).
    """

    warp_inds: Tuple[int, ...]
    f_features: int
    weight_std: float = 0.01
    eps: float = 1e-6

    @nn.compact
    def __call__(self, p, g, mode: str = "direct", train: bool = False):
        keep_inds = tuple(i for i in range(3) if i not in self.warp_inds)
        p_keep = p[:, keep_inds, :]

        logvar_w = jax.nn.soft_sign(
            _PointConditioner(
                self.f_features, len(self.warp_inds), self.weight_std,
                self.eps, name="T_logvar",
            )(p_keep, g, train)
        )
        mu_w = _PointConditioner(
            self.f_features, len(self.warp_inds), self.weight_std,
            self.eps, name="T_mu",
        )(p_keep, g, train)

        zeros = jnp.zeros_like(p)
        logvar = zeros.at[:, self.warp_inds, :].set(logvar_w)
        mu = zeros.at[:, self.warp_inds, :].set(mu_w)

        scale = jnp.sqrt(self.eps + jnp.exp(logvar))
        if mode == "direct":
            p_out = scale * p + mu
        elif mode == "inverse":
            p_out = (p - mu) / scale
        else:
            raise ValueError(f"unknown mode: {mode}")
        return p_out, logvar


# Warp patterns of the coupling triple (reference flows.py:129-148):
# pattern 0 warps one channel at a time, pattern 1 warps pairs.
_TRIPLE_PATTERNS = {
    0: ((0,), (1,), (2,)),
    1: ((0, 1), (0, 2), (1, 2)),
}


def point_decoder_param_count(n_flows: int, f_features: int, g_features: int) -> int:
    """Static parameter-count formula used for mixture parameter budgeting.
    Reference decoders.py:54-59 (LocalCondRNVPDecoder.get_param_count)."""
    per_coupling = (
        18 * f_features
        + 4 * f_features * g_features
        + 6 * f_features ** 2
    )
    return n_flows * 3 * per_coupling


class PointDecoderFlow(nn.Module):
    """Stack of ``n_flows`` coupling triples with alternating warp patterns.

    Reference decoders.py:41-79 (LocalCondRNVPDecoder): flow ``i`` uses
    pattern ``i % 2``; ``direct`` runs flows 0..n-1 (each triple nvp1, nvp2,
    nvp3), ``inverse`` runs the exact reverse coupling order.

    Returns ``(p_out, logvar_sum)`` where ``logvar_sum`` is the sum of every
    coupling's (B, 3, N) logvar — the flow part of the log-determinant the
    mixture NLL consumes (reference losses.py:115 sums the per-layer list).

    ``remat=True`` rematerializes each coupling in the backward pass
    (jax.checkpoint): live activation memory drops from O(n_flows * B*3*N)
    to O(B*3*N), buying headroom for large global batches on HBM at ~1/3
    extra forward FLOPs.
    """

    n_flows: int
    f_features: int
    g_features: int  # conditioner latent size (kept for config parity)
    weight_std: float = 0.01
    remat: bool = False

    def setup(self):
        coupling_cls = CondAffineCoupling3D
        if self.remat:
            # static_argnums index the lifted fn's args where 0 is the
            # module scope: (3, 4) marks the positional (mode, train) args
            coupling_cls = nn.remat(
                CondAffineCoupling3D, static_argnums=(3, 4)
            )
        couplings = []
        for i in range(self.n_flows):
            pattern = _TRIPLE_PATTERNS[i % 2]
            for j, warp in enumerate(pattern):
                couplings.append(
                    coupling_cls(
                        warp_inds=warp,
                        f_features=self.f_features,
                        weight_std=self.weight_std,
                        name=f"flow{i}_nvp{j + 1}",
                    )
                )
        self.couplings = couplings

    def __call__(self, p, g, mode: str = "direct", train: bool = False):
        order = (
            self.couplings if mode == "direct" else self.couplings[::-1]
        )
        logvar_sum = jnp.zeros_like(p)
        for coupling in order:
            # positional mode/train: jax.checkpoint's static_argnums only
            # applies to positional args
            p, logvar = coupling(p, g, mode, train)
            logvar_sum = logvar_sum + logvar
        return p, logvar_sum


class _LatentConditionerNet(nn.Module):
    """Linear(keep->f, no bias) -> BN -> Swish -> Linear(f->|warp|, bias,
    near-identity). Reference flows.py:175-193."""

    n_features: int
    n_warp: int
    weight_std: float

    @nn.compact
    def __call__(self, g_keep: jax.Array, train: bool) -> jax.Array:
        h = _dense(self.n_features, False, "mlp0")(g_keep)
        h = batch_norm(train, -1, "mlp0_bn")(h)
        h = jax.nn.silu(h)
        h = _dense(
            self.n_warp, True, "mlp1", near_identity_std=self.weight_std
        )(h)
        return h


class LatentAffineCoupling(nn.Module):
    """Affine coupling over the g-dimensional latent.

    Reference flows.py:163-213 (RealNVPFlow):
        logvar[warp] = log(eps + exp(net_logvar(g_keep)))
        mu[warp]     = net_mu(g_keep)
        direct:  g' = exp(0.5 * logvar) * g + mu
        inverse: g' = exp(-0.5 * logvar) * (g - mu)
    """

    g_features: int
    n_features: int
    warp_inds: Tuple[int, ...]
    weight_std: float = 0.01
    eps: float = 1e-6

    @nn.compact
    def __call__(self, g, mode: str = "direct", train: bool = False):
        keep_inds = tuple(
            i for i in range(self.g_features) if i not in set(self.warp_inds)
        )
        g_keep = g[:, keep_inds]

        logvar_w = jnp.log(
            self.eps
            + jnp.exp(
                _LatentConditionerNet(
                    self.n_features, len(self.warp_inds), self.weight_std,
                    name="T_logvar",
                )(g_keep, train)
            )
        )
        mu_w = _LatentConditionerNet(
            self.n_features, len(self.warp_inds), self.weight_std,
            name="T_mu",
        )(g_keep, train)

        zeros = jnp.zeros_like(g)
        logvar = zeros.at[:, self.warp_inds].set(logvar_w)
        mu = zeros.at[:, self.warp_inds].set(mu_w)

        if mode == "direct":
            g_out = jnp.exp(0.5 * logvar) * g + mu
        elif mode == "inverse":
            g_out = jnp.exp(-0.5 * logvar) * (g - mu)
        else:
            raise ValueError(f"unknown mode: {mode}")
        return g_out, logvar


def _couple_patterns(g_features: int, pattern: int):
    """Warp index sets of a latent coupling couple.
    Reference flows.py:224-233: pattern 0 = (even, odd) indices,
    pattern 1 = (first half, second half)."""
    idx = tuple(range(g_features))
    if pattern == 0:
        return idx[::2], idx[1::2]
    return idx[: g_features // 2], idx[g_features // 2:]


class LatentPriorFlow(nn.Module):
    """Stack of ``n_flows`` latent coupling couples with alternating
    patterns. Reference decoders.py:7-38 (GlobalRNVPDecoder): flow ``i`` is a
    RealNVPFlowCouple with pattern ``i % 2`` (two couplings, nvp1 then nvp2
    in direct mode); inverse runs the exact reverse coupling order.

    Returns ``(g_out, logvar_sum)``.
    """

    n_flows: int
    n_features: int
    g_features: int
    weight_std: float = 0.01

    def setup(self):
        couplings = []
        for i in range(self.n_flows):
            warps = _couple_patterns(self.g_features, i % 2)
            for j, warp in enumerate(warps):
                couplings.append(
                    LatentAffineCoupling(
                        g_features=self.g_features,
                        n_features=self.n_features,
                        warp_inds=warp,
                        weight_std=self.weight_std,
                        name=f"flow{i}_nvp{j + 1}",
                    )
                )
        self.couplings = couplings

    def __call__(self, g, mode: str = "direct", train: bool = False):
        order = (
            self.couplings if mode == "direct" else self.couplings[::-1]
        )
        logvar_sum = jnp.zeros_like(g)
        for coupling in order:
            g, logvar = coupling(g, mode=mode, train=train)
            logvar_sum = logvar_sum + logvar
        return g, logvar_sum


class _PatternPeriod(nn.Module):
    """One scanned unit of the decoder stack: a pattern-0 flow followed by
    a pattern-1 flow (6 couplings — the repeating period of the
    alternating warp schedule). Carry = (p, logvar_sum, g)."""

    f_features: int
    weight_std: float
    mode: str
    train: bool

    @nn.compact
    def __call__(self, carry, _):
        p, lv_sum, g = carry
        warps = list(_TRIPLE_PATTERNS[0]) + list(_TRIPLE_PATTERNS[1])
        steps = [(f"nvp{k + 1}", w) for k, w in enumerate(warps)]
        if self.mode == "inverse":
            steps = steps[::-1]
        for name, warp in steps:
            coupling = CondAffineCoupling3D(
                warp_inds=warp, f_features=self.f_features,
                weight_std=self.weight_std, name=name,
            )
            p, lv = coupling(p, g, self.mode, self.train)
            lv_sum = lv_sum + lv
        return (p, lv_sum, g), None


class ScanPointDecoderFlow(nn.Module):
    """`lax.scan`-compiled variant of PointDecoderFlow: the repeating
    6-coupling pattern period is traced ONCE and scanned n_flows//2 times
    (plus an unscanned trailing pattern-0 flow when n_flows is odd).

    Same math and same (p_out, logvar_sum) contract as the unrolled stack
    — see unrolled_to_scanned_params for the checkpoint layout converter.
    Compile time drops with depth (one period trace instead of n_flows*3
    coupling traces); runtime is within noise of the unrolled stack.
    """

    n_flows: int
    f_features: int
    g_features: int
    weight_std: float = 0.01

    @nn.compact
    def __call__(self, p, g, mode: str = "direct", train: bool = False):
        n_pairs, tail = divmod(self.n_flows, 2)
        lv_sum = jnp.zeros_like(p)

        def run_pairs(p, lv_sum):
            # remat the scanned body: scan otherwise saves every
            # intermediate of every period for backward (OOM at flagship
            # scale); with remat only the per-period carries are stored
            Scanned = nn.scan(
                nn.remat(_PatternPeriod),
                variable_axes={"params": 0, "batch_stats": 0},
                variable_broadcast=False,
                split_rngs={"params": True},
                length=n_pairs,
                reverse=(mode == "inverse"),
            )
            period = Scanned(
                f_features=self.f_features, weight_std=self.weight_std,
                mode=mode, train=train, name="periods",
            )
            (p, lv_sum, _), _ = period((p, lv_sum, g), None)
            return p, lv_sum

        def run_tail(p, lv_sum):
            steps = [
                (f"tail_nvp{j + 1}", w)
                for j, w in enumerate(_TRIPLE_PATTERNS[0])
            ]
            if mode == "inverse":
                steps = steps[::-1]
            for name, warp in steps:
                coupling = CondAffineCoupling3D(
                    warp_inds=warp, f_features=self.f_features,
                    weight_std=self.weight_std, name=name,
                )
                p, lv = coupling(p, g, mode, train)
                lv_sum = lv_sum + lv
            return p, lv_sum

        if mode == "direct":
            if n_pairs:
                p, lv_sum = run_pairs(p, lv_sum)
            if tail:
                p, lv_sum = run_tail(p, lv_sum)
        elif mode == "inverse":
            # the tail is the LAST flow, so it inverts first
            if tail:
                p, lv_sum = run_tail(p, lv_sum)
            if n_pairs:
                p, lv_sum = run_pairs(p, lv_sum)
        else:
            raise ValueError(f"unknown mode: {mode}")
        return p, lv_sum


def unrolled_to_scanned_params(tree, n_flows: int):
    """Convert a PointDecoderFlow param/batch-stat subtree (flow{i}_nvp{j}
    entries) into the ScanPointDecoderFlow layout (periods/* stacked over
    the pair axis + tail_nvp*). Works on params and batch_stats alike."""
    n_pairs, tail = divmod(n_flows, 2)
    out = {}
    if n_pairs:
        stacked = {}
        for k in range(6):
            flow_off, j = divmod(k, 3)
            per_pair = [
                tree[f"flow{2 * t + flow_off}_nvp{j + 1}"]
                for t in range(n_pairs)
            ]
            stacked[f"nvp{k + 1}"] = jax.tree.map(
                lambda *xs: jnp.stack(xs, axis=0), *per_pair
            )
        out["periods"] = stacked
    if tail:
        for j in range(3):
            out[f"tail_nvp{j + 1}"] = tree[f"flow{n_flows - 1}_nvp{j + 1}"]
    return out
