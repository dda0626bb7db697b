"""Fused Pallas TRAINING kernels for the point-decoder coupling stack.

The training step's hot path is the inverse decode of the whole cloud
through n_flows*3 couplings with TRAIN-MODE BatchNorm (reference
flows.py:95-117 under model.train(); our models/flows.py
CondAffineCoupling3D with train=True) plus its backward pass. Under XLA
with full rematerialization the step is HBM-bound: every coupling
writes its (K, B, f, N) activations to HBM in forward AND recompute, and
the measured grad/forward ratio sits at the remat floor (~4.7x,
RESULTS.md round-3 breakdown) — 160 ms/step for the B=64 flagship.

These kernels run the ENTIRE chain on chip:

  * forward (`_fwd_kernel`): grid (K, C) — one grid step per
    (component, coupling), executed in the training (inverse) order.
    The cloud state lives in the revisited output block; per coupling
    the BatchNorm batch statistics are computed on chip (masked to the
    real points), each coupling's INPUT state is streamed to HBM for
    the backward, and the (mean, var) pairs are emitted for the
    running-stat update (torch momentum + Bessel semantics are applied
    outside, decoder_stats_update). Round-5 pipeline: the sd0_bn stat
    sweep is MOMENT ALGEBRA — h0 = W0 x is linear, so its stats come
    from the 3x3 second moment of the state (Σh0 = W0 S,
    Σh0² = diag(W0 M W0ᵀ)), accumulated in the PREVIOUS coupling's
    output sweep and carried across grid steps in scratch — so each
    coupling after the first runs 2 full-width passes over the (f2, L)
    state instead of 3. (The same algebra for sd1 via the activation
    Gram Σ a aᵀ was measured SLOWER at 'fast' — the bf16 (f2, f2) dot
    costs more than the VPU sweeps it replaces — and numerically
    fragile; sd1 keeps direct full-width sums.)
  * backward (`_bwd_kernel`): grid (K, C) in the reverse (direct)
    order. Hidden activations are recomputed from the saved coupling
    inputs; the only full-width tensor kept between the in-step passes
    is n1 (the affine-free-BN output) — everything else is recomputed
    through the CHEAP dots (the (2f, 3)-shaped W0/W2 maps are ~25x
    lighter than the (2f, 2f) W1), keeping the heavy-dot count per
    coupling near the theoretical minimum (W1 fwd recompute, 2x W1^T,
    dW1). Inner loops batch clouds into wide lane chunks — one-cloud
    dots are MXU-latency-bound (measured 1.4x SLOWER than XLA before
    chunking; the eval kernel's lesson) — with the per-cloud FiLM
    affines applied on static sub-segments.
    The BatchNorm backward includes the batch-statistic terms
    (dx = inv*(dy - mean(dy) - xhat*mean(dy*xhat))), masked to real
    points, exactly matching XLA's autodiff of flax BatchNorm.

HBM traffic per step collapses to the points in/out, one (K, C, 3, L)
saved-input stream, and the per-coupling weights — instead of every
hidden activation twice.

Math/weight layout shared with the eval kernel (coupling_kernel.py):
heads stacked feature-wise (2f) with block-diagonal W1, weights in torch
(out, in) orientation, warp/keep channel selection folded as zero
columns/rows (so the packing function's zero-fill scatters also give the
correct gradient extraction under autodiff). FiLM modulation enters as a
per-(cloud, coupling) affine `ab` computed OUTSIDE the kernel by
`film_wb_train` (plain jnp, so its params train by ordinary autodiff
through the kernel's d_ab output).

Scope: inverse mode (the training decode direction), train-mode BN.
Eval/sampling stay on coupling_kernel.py; the latent prior flow and
encoders stay on XLA (they are ~100x smaller).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coupling_kernel import (
    _BN_EPS,
    _EPS,
    _VMEM_LIMIT,
    _mxdot,
    coupling_warps,
    scanned_to_unrolled_params,
)

_STAT_ROWS = 4  # [mean0, var0, mean1, var1] per coupling
# the backward keeps a full-width (f2, B*N) f32 n1 cache (~42 MB at
# flagship scale) plus wide chunk temporaries; give it the full measured
# headroom (a 120 MB scratch allocation compiles on v5e)
_VMEM_LIMIT_BWD = 119 * 1024 * 1024


# --------------------------------------------------------------------- #
# packing                                                               #
# --------------------------------------------------------------------- #


def pack_point_decoder_train(params: Dict, n_flows: int,
                             scan_layout: bool) -> Dict[str, jax.Array]:
    """Stack a single decoder's RAW params (no BN folding — train-mode BN
    statistics are computed in-kernel) into the kernel's packed arrays.

    All leaves are plain gathers/scatters/stacks, so `jax.grad` through
    this function maps the kernel's dense d_packed cotangents back onto
    the flax param tree (zero-filled rows/columns contribute nothing).
    vmap over a leading component axis for the mixture.
    """
    if scan_layout:
        params = scanned_to_unrolled_params(params, n_flows)
    warps = coupling_warps(n_flows)

    acc = {k: [] for k in (
        "w0", "bn0_scale", "bn0_bias", "w1", "w2", "b2",
        "film_k0", "film_scale", "film_bias", "film_k1", "film_b1",
    )}
    for c, warp in enumerate(warps):
        i, j = divmod(c, 3)
        cp = params[f"flow{i}_nvp{j + 1}"]
        keep = tuple(i for i in range(3) if i not in warp)
        heads = []
        for head in ("T_logvar", "T_mu"):
            hp = cp[head]
            f = hp["sd1"]["kernel"].shape[0]
            w0 = jnp.zeros((f, 3), hp["sd0"]["kernel"].dtype)
            w0 = w0.at[:, jnp.asarray(keep)].set(hp["sd0"]["kernel"])
            w2 = jnp.zeros((3, f), hp["sd2"]["kernel"].dtype)
            w2 = w2.at[jnp.asarray(warp), :].set(hp["sd2"]["kernel"])
            b2 = jnp.zeros((3,), hp["sd2"]["bias"].dtype)
            b2 = b2.at[jnp.asarray(warp)].set(hp["sd2"]["bias"])
            heads.append((
                w0, hp["sd0_bn"]["scale"], hp["sd0_bn"]["bias"],
                hp["sd1"]["kernel"], w2, b2[:, None],
            ))
        (w0l, s0l, bb0l, w1l, w2l, b2l) = heads[0]
        (w0m, s0m, bb0m, w1m, w2m, b2m) = heads[1]
        f = w1l.shape[0]
        acc["w0"].append(jnp.concatenate([w0l, w0m], axis=0))   # (2f, 3)
        acc["bn0_scale"].append(jnp.concatenate([s0l, s0m])[None, :])
        acc["bn0_bias"].append(jnp.concatenate([bb0l, bb0m])[None, :])
        w1 = jnp.zeros((2 * f, 2 * f), w1l.dtype)
        w1 = w1.at[:f, :f].set(w1l).at[f:, f:].set(w1m)
        acc["w1"].append(w1)
        # both heads in ONE stacked (6, 2f) map (rows 0-2 y_lv, 3-5
        # y_mu): halves the W2 MXU sweeps in the forward AND the dW2 /
        # dfz dots in the backward (coupling_kernel.py rationale)
        zf = jnp.zeros((3, f), w2l.dtype)
        acc["w2"].append(jnp.concatenate([
            jnp.concatenate([w2l, zf], axis=1),
            jnp.concatenate([zf, w2m], axis=1),
        ], axis=0))                                             # (6, 2f)
        acc["b2"].append(jnp.concatenate([b2l, b2m], axis=0))   # (6, 1)
        # FiLM nets in head-stacked order (lv_w, lv_b, mu_w, mu_b),
        # RAW (train-mode film BN stats are computed in film_wb_train)
        film = [
            cp[h][n]
            for h in ("T_logvar", "T_mu")
            for n in ("cond_w", "cond_b")
        ]
        acc["film_k0"].append(
            jnp.stack([x["film0"]["kernel"] for x in film])
        )  # (4, G, f)
        acc["film_scale"].append(
            jnp.stack([x["film0_bn"]["scale"] for x in film])
        )  # (4, f)
        acc["film_bias"].append(
            jnp.stack([x["film0_bn"]["bias"] for x in film])
        )
        acc["film_k1"].append(
            jnp.stack([x["film1"]["kernel"] for x in film])
        )  # (4, f, f)
        acc["film_b1"].append(
            jnp.stack([x["film1"]["bias"] for x in film])
        )
    return {k: jnp.stack(v).astype(jnp.float32) for k, v in acc.items()}


def film_wb_train(packed: Dict, g: jax.Array):
    """Train-mode FiLM affines per (coupling, cloud).

    Returns (ab, film_stats):
      ab: (C, B, 2, 2f) — ab[..., 0, :] = eps + exp(film_w(g)) (the
      multiplicative conditioner gain), ab[..., 1, :] = film_b(g); heads
      stacked (lv | mu) on the last axis.
      film_stats: (mean, var) of each film0_bn over the batch,
      each (C, 4, f) in (lv_w, lv_b, mu_w, mu_b) order.

    Pure jnp on purpose: gradients to every film parameter flow through
    here + the kernel's d_ab output by ordinary autodiff. Matches
    models/flows.py _FiLMNet with train=True (batch statistics over B).
    The tiny (B, G) x (G, f) dots are pinned HIGHEST regardless of the
    session precision mode — they are ~0.1% of the step's FLOPs and the
    film path is the gradient-noise-sensitive one (see the f64 study in
    RESULTS.md).
    """
    hp = jax.lax.Precision.HIGHEST
    h = jnp.einsum("bg,chgf->chbf", g, packed["film_k0"], precision=hp)
    mean = jnp.mean(h, axis=2)                      # (C, 4, f)
    var = jnp.mean(jnp.square(h), axis=2) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + _BN_EPS)
    n = (h - mean[:, :, None]) * inv[:, :, None]
    n = n * packed["film_scale"][:, :, None] + packed["film_bias"][:, :, None]
    y = jnp.einsum(
        "chbf,chfe->chbe", jax.nn.silu(n), packed["film_k1"], precision=hp
    ) + packed["film_b1"][:, :, None]               # (C, 4, B, f)
    fw = _EPS + jnp.exp(y[:, 0::2])                 # (C, 2, B, f) lv, mu
    fb = y[:, 1::2]
    C, _, B, f = fw.shape
    # heads onto the feature axis -> (C, B, 2, 2f)
    fw = jnp.transpose(fw, (0, 2, 1, 3)).reshape(C, B, 2 * f)
    fb = jnp.transpose(fb, (0, 2, 1, 3)).reshape(C, B, 2 * f)
    ab = jnp.stack([fw, fb], axis=2)
    return ab, (mean, var)


# --------------------------------------------------------------------- #
# forward kernel                                                        #
# --------------------------------------------------------------------- #


def _global_stat_sums(s, ss, parity, axis_name, n_shards,
                      acc_ref, recv_ref, send_sem, recv_sem):
    """All-reduce two per-shard (f2, 1) stat partial sums across the
    `axis_name` shards with IN-KERNEL remote DMAs: an all-to-all
    broadcast of one (1, 2, f2) message per device plus a local sum.
    This is what lets the fused training kernel keep GLOBAL-batch
    (SyncBN) BatchNorm semantics under SPMD without splitting the
    coupling chain into per-BN pallas_calls (which would re-materialize
    the HBM traffic the fusion removes).

    Safety of slot reuse (the classic double-buffering argument):
    exchanges strictly alternate parity 0/1 within and across grid
    steps on every device. A peer writes my parity-p slot again only in
    exchange n+2; it can start exchange n+2 only after completing n+1,
    which requires MY n+1 message, which I send only after consuming my
    parity-p buffer in exchange n. So every overwrite happens-after my
    read. The recv semaphore is per-parity so byte counts of adjacent
    exchanges never mix.
    """
    # message layout: row 0 = sum, row 1 = sum of squares
    acc_ref[0, 0, :] = s[:, 0]
    acc_ref[0, 1, :] = ss[:, 0]
    my = jax.lax.axis_index(axis_name)
    copies = []
    for off in range(1, n_shards):
        dst = jax.lax.rem(my + jnp.int32(off), jnp.int32(n_shards))
        copy = pltpu.make_async_remote_copy(
            src_ref=acc_ref,
            # slot = SENDER id: writers never collide
            dst_ref=recv_ref.at[parity, pl.ds(my, 1)],
            send_sem=send_sem,
            recv_sem=recv_sem.at[parity],
            # dict form: other mesh axes (e.g. a size-1 'points' axis)
            # keep the sender's own coordinates
            device_id={axis_name: dst},
        )
        copy.start()
        copies.append(copy)
    # my own slot, written locally (no DMA)
    recv_ref[parity, pl.ds(my, 1)] = acc_ref[...]
    for c in copies:
        c.wait_send()
    # all incoming messages are shape-identical and signal the same
    # per-parity semaphore: waiting one descriptor n-1 times drains them
    for _ in range(n_shards - 1):
        copies[0].wait_recv()
    total = jnp.sum(recv_ref[parity], axis=0)  # (2, f2)
    return total[0:1, :].T, total[1:2, :].T    # (f2, 1) each


def _xchg_scratch(n_shards: int, f2: int):
    """Extra scratch for the cross-shard stat exchange (n_shards > 1)."""
    return [
        pltpu.VMEM((1, 2, f2), jnp.float32),           # outgoing message
        pltpu.VMEM((2, n_shards, 2, f2), jnp.float32),  # per-parity slots
        pltpu.SemaphoreType.DMA,                        # send
        pltpu.SemaphoreType.DMA((2,)),                  # recv, per parity
    ]


def _lane_mask(npad: int, n: int, cb: int = 1):
    """(1, cb * npad) validity mask over a cb-cloud lane chunk."""
    if npad == n:
        return None
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, cb * npad), 1)
    return ((ids % npad) < n).astype(jnp.float32)


def _chunk_clouds(B: int, npad: int, lane_target: int) -> int:
    """Clouds per inner iteration: the widest divisor of B whose lane
    span fits `lane_target` — one-cloud dots are MXU-latency-bound (the
    eval kernel's lesson), so the inner loops batch clouds into wide
    lane segments and apply the per-cloud FiLM affines on static
    sub-segments."""
    cb = 1
    for cand in (32, 16, 8, 4, 2):
        if B % cand == 0 and cand * npad <= lane_target:
            cb = cand
            break
    return cb


def _film_rows(ab_ref, chunk, cb):
    """FiLM affine rows for the clouds of lane chunk `chunk`:
    (fw, fb) each (cb, f2) — row j is cloud chunk*cb + j."""
    rows = [
        ab_ref[0, 0, pl.ds(chunk * cb + j, 1)][0]  # (2, f2)
        for j in range(cb)
    ]
    fw = jnp.concatenate([r[0:1, :] for r in rows], axis=0)
    fb = jnp.concatenate([r[1:2, :] for r in rows], axis=0)
    return fw, fb


def _film_apply(n1, fw, fb, npad, cb):
    """z = fw*n1 + fb with per-cloud (f2,) affines over the cb static
    lane segments of the chunk."""
    segs = []
    for j in range(cb):
        seg = n1[:, j * npad:(j + 1) * npad]
        segs.append(fw[j:j + 1, :].T * seg + fb[j:j + 1, :].T)
    return segs[0] if cb == 1 else jnp.concatenate(segs, axis=1)


def _moments3(xb, mask, prec):
    """First/second moments of a (3, lc) state chunk over its (masked)
    lanes: S = Σ x (3, 1), M = Σ x xᵀ (3, 3). The whole sd0_bn stat
    sweep reduces to these NINE numbers because h0 = W0 x is linear:
    Σh0 = W0 S and Σh0² = diag(W0 M W0ᵀ) — so the stats cost 3-wide
    work plus a tiny dot instead of full-width f2-wide reductions."""
    xm = xb if mask is None else xb * mask
    S = jnp.sum(xm, axis=1, keepdims=True)
    M = _mxdg(xm, xb, prec)
    return S, M


def _h0_sums_from_moments(w0, S, M):
    """(Σ h0, Σ h0²) per feature from the x-moments (all tiny, VPU)."""
    s = jnp.sum(w0 * S.T, axis=1, keepdims=True)  # W0 @ S
    t = (w0[:, 0:1] * M[0:1, :] + w0[:, 1:2] * M[1:2, :]
         + w0[:, 2:3] * M[2:3, :])                # W0 @ M  (f2, 3)
    ss = jnp.sum(t * w0, axis=1, keepdims=True)   # diag(W0 M W0ᵀ)
    return s, ss


def _fwd_kernel(C, B, npad, n_real, cb, prec, axis_name, n_shards,
                p_ref, w0_ref, s0_ref, bb0_ref, w1_ref,
                w2_ref, b2_ref, ab_ref,
                p0_ref, lv_ref, xsave_ref, stats_ref, h2_scr, carry_scr,
                *xchg_refs):
    c = pl.program_id(1)
    # B is the LOCAL (per-shard) batch; BN statistics divide by the
    # GLOBAL point count (SyncBN semantics, parallel/mesh.py)
    denom = jnp.float32(n_shards * B * n_real)
    mask = _lane_mask(npad, n_real, cb)
    nb = B // cb
    lc = cb * npad

    @pl.when(c == 0)
    def _init():
        p0_ref[...] = p_ref[...]
        lv_ref[...] = jnp.zeros(lv_ref.shape, jnp.float32)

    # stream this coupling's INPUT state for the backward pass
    xsave_ref[0, 0] = p0_ref[0]

    w0 = w0_ref[0, 0]        # (f2, 3)
    scale0 = s0_ref[0, 0].T  # (f2, 1)
    bias0 = bb0_ref[0, 0].T
    w1 = w1_ref[0, 0]        # (f2, f2)
    w2 = w2_ref[0, 0]        # (6, f2): rows 0-2 y_lv, rows 3-5 y_mu
    b2 = b2_ref[0, 0]        # (6, 1)
    f2 = w1.shape[0]

    def h0_of(chunk):
        xb = p0_ref[0, :, pl.ds(chunk * lc, lc)]  # (3, lc)
        return xb, _mxdot(w0, xb, prec)           # (f2, lc)

    z3 = (jnp.zeros((3, 1), jnp.float32), jnp.zeros((3, 3), jnp.float32))

    # x-moment seed (FIRST coupling of each component only): every later
    # coupling consumes the moments its PREDECESSOR's output sweep
    # accumulated (pass 3 below), so the former per-coupling stat sweep
    # vanishes: 3 full-width passes per coupling become 2, and the stat
    # arithmetic itself is moment algebra on (3, 3) / (f2, f2) blocks.
    @pl.when(c == 0)
    def _seed_stats():
        def p1(chunk, carry):
            S, M = carry
            xb = p0_ref[0, :, pl.ds(chunk * lc, lc)]
            Sc, Mc = _moments3(xb, mask, prec)
            return S + Sc, M + Mc

        S, M = jax.lax.fori_loop(0, nb, p1, z3)
        carry_scr[0:1, :] = S.T
        carry_scr[1:4, :] = M

    S = carry_scr[0:1, :].T
    M = carry_scr[1:4, :]
    s, ss = _h0_sums_from_moments(w0, S, M)
    if n_shards > 1:
        # the derived per-feature sums are LINEAR in (S, M), so the
        # cross-shard reduction can stay in the f2 message layout
        s, ss = _global_stat_sums(s, ss, 0, axis_name, n_shards,
                                  *xchg_refs)
    mean0 = s / denom
    # clamp like flax _compute_stats: reduced-precision moment dots can
    # push a tiny variance fractionally negative
    var0 = jnp.maximum(ss / denom - mean0 * mean0, 0.0)
    inv0 = jax.lax.rsqrt(var0 + _BN_EPS)
    alpha0 = inv0 * scale0
    beta0 = bias0 - mean0 * alpha0
    stats_ref[0, 0, 0:1, :] = mean0.T
    stats_ref[0, 0, 1:2, :] = var0.T

    # pass 2: sd1_bn batch statistics (h2 cached full-width in VMEM).
    # Direct full-width sums, NOT the h2-Gram algebra
    # (Σh2² = diag(W1 (Σ a aᵀ) W1ᵀ)): measured on v5e at 'fast', the
    # (f2, f2) Gram dot in bf16 is SLOWER than the VPU sweeps it
    # replaces AND numerically fragile — relu'd activations have
    # near-constant channels whose tiny variance drowns in the bf16
    # Gram's error, driving var1 negative (NaN through rsqrt).
    def p2(chunk, carry):
        s, ss = carry
        _, h0 = h0_of(chunk)
        a = jnp.maximum(alpha0 * h0 + beta0, 0.0)
        h2 = _mxdot(w1, a, prec)
        h2_scr[:, pl.ds(chunk * lc, lc)] = h2
        h2m = h2 if mask is None else h2 * mask
        s = s + jnp.sum(h2m, axis=1, keepdims=True)
        ss = ss + jnp.sum(h2m * h2m, axis=1, keepdims=True)
        return s, ss

    zf = (jnp.zeros((f2, 1), jnp.float32),
          jnp.zeros((f2, 1), jnp.float32))
    s, ss = jax.lax.fori_loop(0, nb, p2, zf)
    if n_shards > 1:
        s, ss = _global_stat_sums(s, ss, 1, axis_name, n_shards,
                                  *xchg_refs)
    mean1 = s / denom
    var1 = jnp.maximum(ss / denom - mean1 * mean1, 0.0)
    inv1 = jax.lax.rsqrt(var1 + _BN_EPS)
    stats_ref[0, 0, 2:3, :] = mean1.T
    stats_ref[0, 0, 3:4, :] = var1.T

    # pass 3: FiLM + heads + the inverse coupling update, fused with the
    # NEXT coupling's x-moment accumulation (x_new is still in
    # registers; on the last coupling the tiny extra work is harmless —
    # the carry is either consumed by the next grid step or re-seeded
    # at its c == 0)
    def p3(chunk, carry):
        S, M = carry
        sl = pl.ds(chunk * lc, lc)
        h2 = h2_scr[:, sl]
        n1 = (h2 - mean1) * inv1
        fw, fb = _film_rows(ab_ref, chunk, cb)
        fz = jnp.maximum(_film_apply(n1, fw, fb, npad, cb), 0.0)
        y = _mxdot(w2, fz, prec) + b2
        ylv = y[0:3, :]
        ymu = y[3:6, :]
        logvar = jax.nn.soft_sign(ylv)
        scale = jnp.sqrt(_EPS + jnp.exp(logvar))
        xb = p0_ref[0, :, sl]
        x_new = (xb - ymu) / scale
        p0_ref[0, :, sl] = x_new
        lv_ref[0, :, sl] = lv_ref[0, :, sl] + logvar
        Sc, Mc = _moments3(x_new, mask, prec)
        return S + Sc, M + Mc

    S, M = jax.lax.fori_loop(0, nb, p3, z3)
    carry_scr[0:1, :] = S.T
    carry_scr[1:4, :] = M


# --------------------------------------------------------------------- #
# backward kernel                                                       #
# --------------------------------------------------------------------- #


def _mxdg(a, b, prec):
    """Mode-aware `a @ b.T` (contraction over the LAST axis of both) —
    the lane-contracting weight-gradient dot, without materializing a
    transpose. Same precision emulation as coupling_kernel._mxdot,
    including the tripled-contraction fusion when it saves MXU chunks
    (never here in practice: the contraction is the lane axis, and
    3 * lanes is a 128-multiple whenever lanes is)."""
    from .coupling_kernel import _concat_saves_chunks

    dn = (((1,), (1,)), ((), ()))
    if prec == "high":
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, dn, preferred_element_type=jnp.float32
            )

        if _concat_saves_chunks(a.shape[1]):
            return d(
                jnp.concatenate([a_hi, a_hi, a_lo], axis=1),
                jnp.concatenate([b_hi, b_lo, b_hi], axis=1),
            )
        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    if prec == "fast":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32,
        )
    # 'highest': the split-once 6-term schedule (coupling_kernel._dot6)
    # only helps when it drops whole 128-chunks — never here: every
    # _mxdg contraction is the lane axis, always a 128-multiple — so
    # this stays on the native HIGHEST lowering
    return jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _film_broadcast(fw, npad, cb):
    """(cb, f2) per-cloud rows -> (f2, cb*npad) lane-aligned broadcast."""
    f2 = fw.shape[1]
    segs = [
        jnp.broadcast_to(fw[j:j + 1, :].T, (f2, npad)) for j in range(cb)
    ]
    return segs[0] if cb == 1 else jnp.concatenate(segs, axis=1)


def _head_chain(n1, fw, fb, npad, cb, w2, b2, prec):
    """n1 -> (fw_lanes, z, fz, ylv, ymu, logvar, scale) for a chunk."""
    z = _film_apply(n1, fw, fb, npad, cb)
    fw_lanes = _film_broadcast(fw, npad, cb)
    fz = jnp.maximum(z, 0.0)
    y = _mxdot(w2, fz, prec) + b2      # (6, L): stacked lv | mu heads
    ylv = y[0:3, :]
    ymu = y[3:6, :]
    logvar = jax.nn.soft_sign(ylv)
    scale = jnp.sqrt(_EPS + jnp.exp(logvar))
    return fw_lanes, z, fz, ylv, ymu, logvar, scale


def _dchain_from_out(xb, dxout, dlvc, ymu, ylv, logvar, scale):
    """Cotangents of (ymu, ylv) from the coupling-output cotangent.

    xout = (xb - ymu)/scale; logvar = softsign(ylv);
    scale = sqrt(eps + exp(logvar)); the logvar-sum output contributes
    dlvc directly to logvar."""
    xout = (xb - ymu) / scale
    dymu = -dxout / scale
    ds = -dxout * xout / scale
    dlogvar = dlvc + ds * jnp.exp(logvar) / (2.0 * scale)
    sg = 1.0 + jnp.abs(ylv)
    dylv = dlogvar / (sg * sg)
    return dymu, dylv


def _make_bwd_kernel(C, B, npad, n_real, cb, prec, axis_name=None,
                     n_shards=1):
    def kernel(xs_ref, stats_ref, w0_ref, s0_ref, bb0_ref, w1_ref,
               w2_ref, b2_ref, ab_ref,
               dy_ref, dlv_ref,
               dp_ref, dw0_ref, dbn0_ref, dw1_ref, dw2_ref,
               db2_ref, dab_ref,
               n1_scr, dn1_scr, scale_scr, *xchg_refs):
        c = pl.program_id(1)
        # the BN backward's batch-statistic terms reduce over the
        # GLOBAL batch (matching the forward's SyncBN semantics); the
        # weight-gradient accumulators stay per-shard partial sums
        # (psummed at the shard_map level)
        denom = jnp.float32(n_shards * B * n_real)
        mask = _lane_mask(npad, n_real, cb)
        nb = B // cb
        lc = cb * npad

        @pl.when(c == 0)
        def _init():
            dp_ref[...] = dy_ref[...]

        mean0 = stats_ref[0, 0, 0:1, :].T  # (f2, 1)
        var0 = stats_ref[0, 0, 1:2, :].T
        mean1 = stats_ref[0, 0, 2:3, :].T
        var1 = stats_ref[0, 0, 3:4, :].T
        inv0 = jax.lax.rsqrt(var0 + _BN_EPS)
        inv1 = jax.lax.rsqrt(var1 + _BN_EPS)

        w0 = w0_ref[0, 0]
        scale0 = s0_ref[0, 0].T
        bias0 = bb0_ref[0, 0].T
        w1 = w1_ref[0, 0]
        w2 = w2_ref[0, 0]      # (6, f2)
        b2 = b2_ref[0, 0]      # (6, 1)
        f2 = w1.shape[0]
        w0t = w0.T
        w1t = w1.T
        w2t = w2.T             # (f2, 6)

        def base(chunk):
            sl = pl.ds(chunk * lc, lc)
            xb = xs_ref[0, 0, :, sl]
            h0 = _mxdot(w0, xb, prec)
            n0 = (h0 - mean0) * inv0
            a = jnp.maximum(n0 * scale0 + bias0, 0.0)
            return sl, xb, n0, a

        def dn1_of(chunk, sl, xb, n1):
            """Recompute dn1 (cheap dots only) for a lane chunk."""
            fw, fb = _film_rows(ab_ref, chunk, cb)
            fw_lanes, z, fz, ylv, ymu, logvar, scale = _head_chain(
                n1, fw, fb, npad, cb, w2, b2, prec
            )
            dxout = dp_ref[0, :, sl]
            dlvc = dlv_ref[0, :, sl]
            dymu, dylv = _dchain_from_out(
                xb, dxout, dlvc, ymu, ylv, logvar, scale
            )
            # stacked head cotangent (6, L): one W2^T dot and (in pass A)
            # one dW2 lane sweep instead of two each
            dy6 = jnp.concatenate([dylv, dymu], axis=0)
            dfz = _mxdot(w2t, dy6, prec)
            dz = jnp.where(z > 0.0, dfz, 0.0)
            dn1 = dz * fw_lanes
            return dn1, dz, dy6, fz, scale

        # ---- pass A: the ONLY full forward+chain evaluation; caches
        # n1 / dn1 / scale so the expensive VPU chain (softsign, exp,
        # sqrt, the W2 head dots) runs once, not once per pass ----
        def pA(chunk, carry):
            s_dn1, s_dn1n1, dW2, dB2 = carry
            sl, xb, n0, a = base(chunk)
            h2 = _mxdot(w1, a, prec)
            n1 = (h2 - mean1) * inv1
            # bf16 cache: the 128 MB physical VMEM cannot hold three f32
            # full-width caches beside the chunk temporaries (measured
            # 141.9M). n1's cached copy only feeds the BN1-backward
            # correction product n1 * mean(dn1*n1) in passes B/C — a
            # small term where 2^-8 relative error is negligible; the
            # fresh f32 n1 is used for everything in this pass.
            n1_scr[:, sl] = n1.astype(jnp.bfloat16)
            dn1, dz, dy6, fz, scale = dn1_of(chunk, sl, xb, n1)
            dn1_scr[:, sl] = dn1
            scale_scr[:, sl] = scale
            # per-cloud FiLM cotangents (dz/dy6 vanish on pad lanes
            # because the output cotangents are zero there)
            dzn1 = dz * n1
            for j in range(cb):
                seg = slice(j * npad, (j + 1) * npad)
                dfw = jnp.sum(dzn1[:, seg], axis=1, keepdims=True)
                dfb = jnp.sum(dz[:, seg], axis=1, keepdims=True)
                b = chunk * cb + j
                dab_ref[0, 0, pl.ds(b, 1), 0, :] = dfw.T
                dab_ref[0, 0, pl.ds(b, 1), 1, :] = dfb.T
            s_dn1 = s_dn1 + jnp.sum(dn1, axis=1, keepdims=True)
            s_dn1n1 = s_dn1n1 + jnp.sum(dn1 * n1, axis=1, keepdims=True)
            dW2 = dW2 + _mxdg(dy6, fz, prec)   # (6, f2), one lane sweep
            dB2 = dB2 + jnp.sum(dy6, axis=1, keepdims=True)
            return s_dn1, s_dn1n1, dW2, dB2

        zf = jnp.zeros((f2, 1), jnp.float32)
        z6 = jnp.zeros((6, 1), jnp.float32)
        z6f = jnp.zeros((6, f2), jnp.float32)
        s_dn1, s_dn1n1, dW2, dB2 = jax.lax.fori_loop(
            0, nb, pA, (zf, zf, z6f, z6)
        )
        if n_shards > 1:
            s_dn1, s_dn1n1 = _global_stat_sums(
                s_dn1, s_dn1n1, 0, axis_name, n_shards, *xchg_refs
            )
        mdn1 = s_dn1 / denom
        mdn1n1 = s_dn1n1 / denom
        dw2_ref[0, 0] = dW2
        db2_ref[0, 0] = dB2

        # ---- pass B: BN1 backward; dW1; BN0 sums (all from caches) ----
        def pB(chunk, carry):
            dW1, dsc0, dbi0, s_dn0, s_dn0n0 = carry
            sl, xb, n0, a = base(chunk)
            n1 = n1_scr[:, sl].astype(jnp.float32)
            dn1 = dn1_scr[:, sl]
            dh2 = inv1 * (dn1 - mdn1 - n1 * mdn1n1)
            if mask is not None:
                dh2 = dh2 * mask
            dW1 = dW1 + _mxdg(dh2, a, prec)
            da = _mxdot(w1t, dh2, prec)
            dabn = jnp.where(a > 0.0, da, 0.0)
            dsc0 = dsc0 + jnp.sum(dabn * n0, axis=1, keepdims=True)
            dbi0 = dbi0 + jnp.sum(dabn, axis=1, keepdims=True)
            dn0 = dabn * scale0
            s_dn0 = s_dn0 + jnp.sum(dn0, axis=1, keepdims=True)
            s_dn0n0 = s_dn0n0 + jnp.sum(dn0 * n0, axis=1, keepdims=True)
            return dW1, dsc0, dbi0, s_dn0, s_dn0n0

        zff = jnp.zeros((f2, f2), jnp.float32)
        dW1, dsc0, dbi0, s_dn0, s_dn0n0 = jax.lax.fori_loop(
            0, nb, pB, (zff, zf, zf, zf, zf)
        )
        if n_shards > 1:
            s_dn0, s_dn0n0 = _global_stat_sums(
                s_dn0, s_dn0n0, 1, axis_name, n_shards, *xchg_refs
            )
        mdn0 = s_dn0 / denom
        mdn0n0 = s_dn0n0 / denom
        dw1_ref[0, 0] = dW1
        dbn0_ref[0, 0, 0:1, :] = dsc0.T
        dbn0_ref[0, 0, 1:2, :] = dbi0.T

        # ---- pass C: BN0 backward; dW0; input cotangent. dh2 is three
        # VPU ops from the caches; da's W1^T dot is recomputed — a
        # full-width da cache would not fit beside the other three ----
        def pC(chunk, carry):
            dW0 = carry
            sl, xb, n0, a = base(chunk)
            n1 = n1_scr[:, sl].astype(jnp.float32)
            dn1 = dn1_scr[:, sl]
            scale = scale_scr[:, sl]
            dh2 = inv1 * (dn1 - mdn1 - n1 * mdn1n1)
            if mask is not None:
                dh2 = dh2 * mask
            da = _mxdot(w1t, dh2, prec)
            dabn = jnp.where(a > 0.0, da, 0.0)
            dn0 = dabn * scale0
            dh0 = inv0 * (dn0 - mdn0 - n0 * mdn0n0)
            if mask is not None:
                dh0 = dh0 * mask
            dW0 = dW0 + _mxdg(dh0, xb, prec)       # (f2, 3)
            dx = dp_ref[0, :, sl] / scale + _mxdot(w0t, dh0, prec)
            dp_ref[0, :, sl] = dx
            return dW0

        dW0 = jax.lax.fori_loop(0, nb, pC, jnp.zeros((f2, 3), jnp.float32))
        dw0_ref[0, 0] = dW0

    return kernel


# --------------------------------------------------------------------- #
# pallas_call wrappers + custom_vjp                                     #
# --------------------------------------------------------------------- #


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _to_lanes(p):
    """(K, B, 3, N) -> (K, 3, B * npad) cloud-major lane layout."""
    K, B, _, N = p.shape
    npad = _round_up(N, 128)
    x = p.astype(jnp.float32)
    if npad != N:
        x = jnp.concatenate(
            [x, jnp.zeros((K, B, 3, npad - N), jnp.float32)], axis=3
        )
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(K, 3, B * npad)
    return x, npad


def _from_lanes(x, B, npad, N):
    K = x.shape[0]
    x = x.reshape(K, 3, B, npad)
    return jnp.transpose(x, (0, 2, 1, 3))[:, :, :, :N]


def _wspec(arr, C):
    """Per-(component, coupling) weight block in the training (inverse)
    execution order: grid step c runs coupling C-1-c."""
    s = arr.shape[2:]
    return pl.BlockSpec(
        (1, 1) + s, lambda k, c: (k, C - 1 - c) + (0,) * len(s)
    )


def _wspec_fwdorder(arr):
    s = arr.shape[2:]
    return pl.BlockSpec(
        (1, 1) + s, lambda k, c: (k, c) + (0,) * len(s)
    )


def _ospec(tail: Tuple[int, ...]):
    """Per-(k, c) output block in forward coupling order."""
    return pl.BlockSpec(
        (1, 1) + tuple(tail), lambda k, c: (k, c) + (0,) * len(tail)
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "precision_mode", "axis_name",
                     "n_shards"),
)
def _fwd_call(packed, ab, p, interpret, precision_mode, axis_name=None,
              n_shards=1):
    K, B, _, N = p.shape
    C = packed["w1"].shape[1]
    f2 = packed["w1"].shape[2]
    x, npad = _to_lanes(p)
    L = B * npad
    cb = _chunk_clouds(B, npad, 16384)

    grid = (K, C)
    state_spec = pl.BlockSpec((1, 3, L), lambda k, c: (k, 0, 0))
    scratch = [
        pltpu.VMEM((f2, L), jnp.float32),  # h2 cache
        pltpu.VMEM((4, 3), jnp.float32),   # carried x-moments [Sᵀ; M]
    ]
    if n_shards > 1:
        scratch += _xchg_scratch(n_shards, f2)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C, B, npad, N, cb, precision_mode,
                          axis_name, n_shards),
        grid=grid,
        in_specs=[
            state_spec,                      # p (resident per k row)
            _wspec(packed["w0"], C),
            _wspec(packed["bn0_scale"], C),
            _wspec(packed["bn0_bias"], C),
            _wspec(packed["w1"], C),
            _wspec(packed["w2"], C),
            _wspec(packed["b2"], C),
            _wspec(ab, C),                   # (K, C, B, 2, f2)
        ],
        out_specs=[
            state_spec,                      # p0 (the carried state)
            state_spec,                      # logvar sum
            pl.BlockSpec((1, 1, 3, L),
                         lambda k, c: (k, C - 1 - c, 0, 0)),  # saved x
            pl.BlockSpec((1, 1, _STAT_ROWS, f2),
                         lambda k, c: (k, C - 1 - c, 0, 0)),  # bn stats
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, 3, L), jnp.float32),
            jax.ShapeDtypeStruct((K, 3, L), jnp.float32),
            jax.ShapeDtypeStruct((K, C, 3, L), jnp.float32),
            jax.ShapeDtypeStruct((K, C, _STAT_ROWS, f2), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(
        x,
        packed["w0"], packed["bn0_scale"], packed["bn0_bias"],
        packed["w1"], packed["w2"], packed["b2"], ab,
    )
    p0, lv, xsave, stats = out
    return (
        _from_lanes(p0, B, npad, N),
        _from_lanes(lv, B, npad, N),
        xsave,
        stats,
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "precision_mode", "axis_name",
                     "n_shards"),
)
def _bwd_call(packed, ab, xsave, stats, dp0, dlv, interpret,
              precision_mode, axis_name=None, n_shards=1):
    K, C = stats.shape[:2]
    f2 = stats.shape[3]
    B = ab.shape[2]
    N = dp0.shape[3]
    dy, npad = _to_lanes(dp0)
    dlv_l, _ = _to_lanes(dlv)
    L = B * npad
    # narrower chunks than the forward: three full-width caches leave
    # ~30 MB for pass-A's live set (measured: 8192-lane chunks overflow
    # the 128 MB physical VMEM by ~1.5 MB at flagship scale)
    cb = _chunk_clouds(B, npad, 4096)

    state_spec = pl.BlockSpec((1, 3, L), lambda k, c: (k, 0, 0))
    scratch = [
        pltpu.VMEM((f2, L), jnp.bfloat16),  # n1 cache (see pA note)
        pltpu.VMEM((f2, L), jnp.float32),   # dn1 cache
        pltpu.VMEM((3, L), jnp.float32),    # scale cache
    ]
    if n_shards > 1:
        scratch += _xchg_scratch(n_shards, f2)
    out = pl.pallas_call(
        _make_bwd_kernel(C, B, npad, N, cb, precision_mode, axis_name,
                         n_shards),
        grid=(K, C),
        in_specs=[
            pl.BlockSpec((1, 1, 3, L), lambda k, c: (k, c, 0, 0)),  # xsave
            _wspec_fwdorder(stats),
            _wspec_fwdorder(packed["w0"]),
            _wspec_fwdorder(packed["bn0_scale"]),
            _wspec_fwdorder(packed["bn0_bias"]),
            _wspec_fwdorder(packed["w1"]),
            _wspec_fwdorder(packed["w2"]),
            _wspec_fwdorder(packed["b2"]),
            _wspec_fwdorder(ab),
            state_spec,  # dY (p0 cotangent)
            state_spec,  # dLV (logvar-sum cotangent)
        ],
        out_specs=[
            state_spec,  # running input cotangent -> d p
            _ospec((f2, 3)),
            _ospec((2, f2)),
            _ospec((f2, f2)),
            _ospec((6, f2)),
            _ospec((6, 1)),
            _ospec(ab.shape[2:]),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, 3, L), jnp.float32),
            jax.ShapeDtypeStruct((K, C, f2, 3), jnp.float32),
            jax.ShapeDtypeStruct((K, C, 2, f2), jnp.float32),
            jax.ShapeDtypeStruct((K, C, f2, f2), jnp.float32),
            jax.ShapeDtypeStruct((K, C, 6, f2), jnp.float32),
            jax.ShapeDtypeStruct((K, C, 6, 1), jnp.float32),
            jax.ShapeDtypeStruct(ab.shape, jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BWD
        ),
        interpret=interpret,
    )(
        xsave, stats,
        packed["w0"], packed["bn0_scale"], packed["bn0_bias"],
        packed["w1"], packed["w2"], packed["b2"], ab,
        dy, dlv_l,
    )
    (dp_l, dw0, dbn0, dw1, dw2, db2, dab) = out
    d_packed = {
        "w0": dw0,
        "bn0_scale": dbn0[:, :, 0][:, :, None, :],
        "bn0_bias": dbn0[:, :, 1][:, :, None, :],
        "w1": dw1,
        "w2": dw2,
        "b2": db2,
        # film params get their cotangents via d_ab -> film_wb_train
        "film_k0": jnp.zeros_like(packed["film_k0"]),
        "film_scale": jnp.zeros_like(packed["film_scale"]),
        "film_bias": jnp.zeros_like(packed["film_bias"]),
        "film_k1": jnp.zeros_like(packed["film_k1"]),
        "film_b1": jnp.zeros_like(packed["film_b1"]),
    }
    return _from_lanes(dp_l, B, npad, N), d_packed, dab


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_train_decode(packed, ab, p, interpret=False,
                       precision_mode="highest"):
    """Train-mode inverse decode of the full coupling stack.

    packed: pack_point_decoder_train output with a leading component
    axis K on every leaf; ab: (K, C, B, 2, 2f) from film_wb_train
    (vmapped over K); p: (K, B, 3, N) points.

    Returns (p0, logvar_sum, bn_stats) where bn_stats is
    (K, C, 4, 2f) = per-coupling [sd0_bn mean, sd0_bn var, sd1_bn mean,
    sd1_bn var] (heads stacked lv|mu on the last axis) for the
    running-statistics update. Differentiable in packed/ab/p with a
    hand-written Pallas backward; the stats output is non-differentiable
    (its cotangent is discarded, matching flax's running-stat update
    which is outside the loss graph).
    """
    p0, lv, _, stats = _fwd_call(packed, ab, p, interpret,
                                 precision_mode)
    return p0, lv, stats


def decoder_stats_update(old_stats, kernel_stats, film_stats,
                         n_flows: int, scan_layout: bool,
                         momentum: float = 0.9,
                         n_sd: int | None = None,
                         n_film: int | None = None):
    """Fold the kernel-computed batch statistics into the decoder's
    batch_stats collection with torch running-average semantics
    (ra = momentum * ra + (1 - momentum) * batch; ops/layers.py
    batch_norm uses momentum 0.9 = torch 0.1; running VAR blends the
    Bessel-corrected batch variance, x n/(n-1), exactly like
    TorchBatchNorm — the kernel emits raw biased batch stats).

    kernel_stats: (K, C, 4, 2f) from fused_train_decode;
    film_stats: (mean, var) each (K, C, 4, f) from film_wb_train
    (vmapped over K); old_stats: the decoder's current batch_stats
    subtree (unrolled or scanned layout to match `scan_layout`);
    n_sd / n_film: reduction counts of the conditioner BNs (global
    B * N) and the FiLM BNs (global B) for the Bessel factor — None
    keeps the raw biased blend (pre-round-5 behavior, tests only).
    """
    from ...models.flows import unrolled_to_scanned_params  # cycle-safe

    def bessel(n):
        if n is None:
            return 1.0
        return float(n) / float(max(n - 1, 1))

    b_sd = bessel(n_sd)
    b_film = bessel(n_film)
    f = kernel_stats.shape[3] // 2
    C = kernel_stats.shape[1]
    fmean, fvar = film_stats
    tree = {}
    for c in range(C):
        i, j = divmod(c, 3)
        heads = {}
        for hi, head in enumerate(("T_logvar", "T_mu")):
            sl = slice(hi * f, (hi + 1) * f)
            heads[head] = {
                "sd0_bn": {"mean": kernel_stats[:, c, 0, sl],
                           "var": kernel_stats[:, c, 1, sl] * b_sd},
                "sd1_bn": {"mean": kernel_stats[:, c, 2, sl],
                           "var": kernel_stats[:, c, 3, sl] * b_sd},
                # film nets in (lv_w, lv_b, mu_w, mu_b) order
                "cond_w": {"film0_bn": {
                    "mean": fmean[:, c, 2 * hi],
                    "var": fvar[:, c, 2 * hi] * b_film,
                }},
                "cond_b": {"film0_bn": {
                    "mean": fmean[:, c, 2 * hi + 1],
                    "var": fvar[:, c, 2 * hi + 1] * b_film,
                }},
            }
        tree[f"flow{i}_nvp{j + 1}"] = heads
    if scan_layout:
        # leaves carry the component axis K in front; vmap the layout
        # conversion so the scan-pair axis stacks at position 1
        # (matching nn.vmap-over-nn.scan: (K, n_pairs, ...))
        tree = jax.vmap(
            lambda t: unrolled_to_scanned_params(t, n_flows)
        )(tree)
    return jax.tree.map(
        lambda o, b: momentum * o + (1.0 - momentum) * b, old_stats, tree
    )


def _fused_fwd(packed, ab, p, interpret, precision_mode):
    p0, lv, xsave, stats = _fwd_call(packed, ab, p, interpret,
                                     precision_mode)
    return (p0, lv, stats), (packed, ab, xsave, stats)


def _fused_bwd(interpret, precision_mode, res, cts):
    packed, ab, xsave, stats = res
    dp0, dlv, _dstats = cts
    dp, d_packed, dab = _bwd_call(
        packed, ab, xsave, stats, dp0, dlv, interpret, precision_mode
    )
    return d_packed, dab, dp


fused_train_decode.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------- #
# SPMD (multi-device) wrapper                                           #
# --------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def make_fused_train_decode_spmd(axis_name: str, n_shards: int,
                                 interpret, precision_mode: str):
    """Fused training decode under a >1-device `data` mesh.

    Semantics are IDENTICAL to the XLA SPMD path (and to the
    single-device fused kernel on the same global batch): BatchNorm
    batch statistics are computed over the GLOBAL batch (SyncBN,
    parallel/mesh.py) via the kernels' in-kernel remote-DMA stat
    exchange (`_global_stat_sums`), in both the forward and the
    BN-backward batch-statistic terms. Everything else stays
    shard-local; weight gradients are per-shard partial sums psummed
    inside the shard_map body.

    Returns a custom-vjp function `f(packed, ab, p) -> (p0, lv, stats)`
    operating on GLOBAL arrays (call it inside jit under the mesh):
    packed leaves replicated, ab (K, C, B, 2, f2) and p (K, B, 3, N)
    batch-sharded over `axis_name`. B must divide by n_shards. The
    `stats` output is identical on every shard (the exchange makes it
    global) and is returned replicated.

    `interpret`: False on TPU; pass a `pltpu.InterpretParams()` instance
    to emulate the remote DMAs on CPU (plain `interpret=True` cannot —
    tests use the TPU interpret mode's shared-memory simulator).
    """
    from jax.sharding import PartitionSpec as P

    rep = P()
    fwd_in = (rep, P(None, None, axis_name), P(None, axis_name))
    fwd_out = (P(None, axis_name), P(None, axis_name),
               P(None, None, None, axis_name), rep)

    def fwd_body(packed, ab, p):
        return _fwd_call(packed, ab, p, interpret, precision_mode,
                         axis_name, n_shards)

    shard_fwd = jax.shard_map(
        fwd_body, in_specs=fwd_in, out_specs=fwd_out, check_vma=False,
    )

    bwd_in = (rep, P(None, None, axis_name),
              P(None, None, None, axis_name), rep,
              P(None, axis_name), P(None, axis_name))
    bwd_out = (P(None, axis_name), rep, P(None, None, axis_name))

    def bwd_body(packed, ab, xsave, stats, dp0, dlv):
        dp, d_packed, dab = _bwd_call(
            packed, ab, xsave, stats, dp0, dlv, interpret,
            precision_mode, axis_name, n_shards,
        )
        # weight cotangents are partial sums over the local shard
        d_packed = jax.lax.psum(d_packed, axis_name)
        return dp, d_packed, dab

    shard_bwd = jax.shard_map(
        bwd_body, in_specs=bwd_in, out_specs=bwd_out, check_vma=False,
    )

    @jax.custom_vjp
    def f(packed, ab, p):
        p0, lv, _, stats = shard_fwd(packed, ab, p)
        return p0, lv, stats

    def f_fwd(packed, ab, p):
        p0, lv, xsave, stats = shard_fwd(packed, ab, p)
        return (p0, lv, stats), (packed, ab, xsave, stats)

    def f_bwd(res, cts):
        packed, ab, xsave, stats = res
        dp0, dlv, _dstats = cts
        dp, d_packed, dab = shard_bwd(packed, ab, xsave, stats, dp0, dlv)
        return d_packed, dab, dp

    f.defvjp(f_fwd, f_bwd)
    return f
