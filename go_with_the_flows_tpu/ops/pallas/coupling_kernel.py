"""Fused Pallas sampling kernel for the point-decoder coupling stack.

The eval/sampling hot path (reference flow_mixture.py:162-177 direct
decode; our models/mixture.py decode_sampling) runs every point through
n_flows*3 affine couplings. Under XLA each coupling materializes its
(B, f, N) activations (plus einsum relayouts) in HBM — measured ~540 ms
for the K=4, B=1024, N=2048 flagship decode, ~5x the minimal HBM traffic
and ~25x the MXU compute — the pass is memory/latency bound. This kernel
runs the ENTIRE coupling chain in VMEM: HBM traffic drops to the points
in/out plus one weight/FiLM read per cloud tile.

Math (exactly CondAffineCoupling3D in eval mode, models/flows.py:95-180,
reference flows.py:95-117) with everything constant folded:

  per coupling c, head (logvar | mu):
    h = relu(W0 @ X + b0)          W0 = (BN0 scale) * sd0-kernel, with the
                                   keep-channel selection folded in
                                   (zero columns on warped channels)
    h = relu(alpha * (W1 @ h) + beta)
                                   W1 = sd1-kernel; alpha/beta fold the
                                   affine-free BN1 (running stats) with
                                   the per-cloud FiLM modulation
                                   (eps + exp(film_w(g))), film_b(g)
    y = W2 @ h + b2                sd2 with the warp-channel scatter
                                   folded in (zero rows on kept channels)
  logvar = softsign(y_lv); scale = sqrt(eps + exp(logvar))  [full-width:
  kept channels get logvar 0 -> scale sqrt(1+eps), the reference quirk]
  X <- scale * X + y_mu;  lv_sum <- lv_sum + logvar

Design notes:
  * The two heads are stacked feature-wise (2f) with a block-diagonal
    W1: on the 128-wide MXU both f=37 and 2f=74 pad to the same tile, so
    the stacked dot is strictly cheaper than two narrow ones.
  * Activations are (features, points) — features on sublanes, points on
    lanes — matching the torch (out, in) weight orientation, so the
    packed weights need no transposes at all.
  * Each program processes TB clouds as ALIGNED LANE SEGMENTS of one
    (2f, TB*N) activation matrix: the big dots span all TB clouds
    (hiding MXU latency that made a one-cloud-per-program variant
    latency-bound), while the per-cloud FiLM affine indexes static
    128-aligned lane windows.
  * Every per-coupling array keeps the coupling axis C LEADING with
    >= 2 trailing dims so the in-kernel fori_loop can index it
    dynamically (Mosaic rejects dynamic sublane/lane indices).

Scope: DIRECT mode, eval (running BN stats) — exactly the sampling /
reconstruction paths. Training/inverse stay on XLA (they need batch
stats + autodiff).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN_EPS = 1e-5   # ops/layers.py batch_norm (torch BatchNorm1d default)
_EPS = 1e-6      # coupling eps (models/flows.py CondAffineCoupling3D)
# v5e VMEM is ~128 MB/core (the 16 MB figure is only the compiler's
# default scoped-vmem limit); raising the limit admits wider lane tiles
_VMEM_LIMIT = 100 * 1024 * 1024

# warp patterns per coupling within the repeating 6-coupling period
# (models/flows.py _TRIPLE_PATTERNS; reference flows.py:129-148)
_PERIOD_WARPS = ((0,), (1,), (2,), (0, 1), (0, 2), (1, 2))


def coupling_warps(n_flows: int):
    """Warp tuple per coupling in direct order (flow i uses pattern i%2)."""
    out = []
    for i in range(n_flows):
        pattern = _PERIOD_WARPS[:3] if i % 2 == 0 else _PERIOD_WARPS[3:]
        out.extend(pattern)
    return out


def scanned_to_unrolled_params(tree, n_flows: int):
    """Inverse of flows.unrolled_to_scanned_params: split the stacked
    periods/* leaves back into flow{i}_nvp{j} entries (works on params
    and batch_stats alike; leaves keep any extra leading axes)."""
    n_pairs, tail = divmod(n_flows, 2)
    out = {}
    for t in range(n_pairs):
        for k in range(6):
            flow_off, j = divmod(k, 3)
            out[f"flow{2 * t + flow_off}_nvp{j + 1}"] = jax.tree.map(
                lambda x: x[t], tree["periods"][f"nvp{k + 1}"]
            )
    if tail:
        for j in range(3):
            out[f"flow{n_flows - 1}_nvp{j + 1}"] = tree[f"tail_nvp{j + 1}"]
    return out


def _fold_head(cp, cs, warp):
    """Constant-fold one conditioner head into (W0 (f,3), b0 (f),
    W1 (f,f), a1 (f), b1 (f), W2 (3,f), b2 (3)) — selection/scatter and
    eval-mode BN affines folded in, torch (out, in) orientation.
    cp/cs = the head's params/stats."""
    keep = tuple(i for i in range(3) if i not in warp)
    f = cp["sd1"]["kernel"].shape[0]

    a0 = cp["sd0_bn"]["scale"] * jax.lax.rsqrt(cs["sd0_bn"]["var"] + _BN_EPS)
    b0 = cp["sd0_bn"]["bias"] - cs["sd0_bn"]["mean"] * a0
    sd0 = cp["sd0"]["kernel"] * a0[:, None]  # (f, |K|)
    w0 = jnp.zeros((f, 3), sd0.dtype).at[:, jnp.asarray(keep)].set(sd0)

    a1 = jax.lax.rsqrt(cs["sd1_bn"]["var"] + _BN_EPS)  # affine-free BN
    b1 = -cs["sd1_bn"]["mean"] * a1
    w1 = cp["sd1"]["kernel"]  # (f_out, f_in)

    sd2 = cp["sd2"]["kernel"]  # (|W|, f)
    w2 = jnp.zeros((3, f), sd2.dtype).at[jnp.asarray(warp), :].set(sd2)
    b2 = jnp.zeros((3,), sd2.dtype).at[jnp.asarray(warp)].set(
        cp["sd2"]["bias"]
    )
    return w0, b0, w1, a1, b1, w2, b2


def _fold_film(cp, cs):
    """FiLM MLP constants of one head: (k0 (G,f), a0 (f), b0 (f),
    k1 (f,f), b1 (f)) with the eval BN folded."""
    a = cp["film0_bn"]["scale"] * jax.lax.rsqrt(
        cs["film0_bn"]["var"] + _BN_EPS
    )
    b = cp["film0_bn"]["bias"] - cs["film0_bn"]["mean"] * a
    return (cp["film0"]["kernel"], a, b,
            cp["film1"]["kernel"], cp["film1"]["bias"])


def pack_point_decoder(
    params: Dict, batch_stats: Dict, n_flows: int, scan_layout: bool
) -> Dict[str, jax.Array]:
    """Stack + constant-fold a PointDecoderFlow / ScanPointDecoderFlow
    variable tree (single decoder — vmap over a leading component axis
    for the mixture) into the kernel's packed arrays."""
    if scan_layout:
        params = scanned_to_unrolled_params(params, n_flows)
        batch_stats = scanned_to_unrolled_params(batch_stats, n_flows)
    warps = coupling_warps(n_flows)

    acc = {k: [] for k in (
        "w0", "b0", "w1", "a1", "b1", "w2", "b2",
        "film_k0", "film_a0", "film_b0", "film_k1", "film_b1",
    )}
    for c, warp in enumerate(warps):
        i, j = divmod(c, 3)
        cp = params[f"flow{i}_nvp{j + 1}"]
        cs = batch_stats[f"flow{i}_nvp{j + 1}"]
        heads = []
        for head in ("T_logvar", "T_mu"):
            heads.append(_fold_head(cp[head], cs[head], warp))
        (w0l, b0l, w1l, a1l, b1l, w2l, b2l) = heads[0]
        (w0m, b0m, w1m, a1m, b1m, w2m, b2m) = heads[1]
        f = w1l.shape[0]
        acc["w0"].append(jnp.concatenate([w0l, w0m], axis=0))  # (2f, 3)
        acc["b0"].append(jnp.concatenate([b0l, b0m])[:, None])  # (2f, 1)
        w1 = jnp.zeros((2 * f, 2 * f), w1l.dtype)
        w1 = w1.at[:f, :f].set(w1l).at[f:, f:].set(w1m)
        acc["w1"].append(w1)
        acc["a1"].append(jnp.concatenate([a1l, a1m])[None, :])  # (1, 2f)
        acc["b1"].append(jnp.concatenate([b1l, b1m])[None, :])
        # both heads in ONE stacked (6, 2f) block-diagonal map: rows 0-2
        # produce y_lv, rows 3-5 y_mu — one dot halves the W2 MXU passes
        # vs two (3, 2f) head dots (passes scale with contraction chunks
        # PER DOT, and both heads fit one 128-wide output tile)
        zf = jnp.zeros((3, f), w2l.dtype)
        acc["w2"].append(jnp.concatenate([
            jnp.concatenate([w2l, zf], axis=1),   # y_lv rows
            jnp.concatenate([zf, w2m], axis=1),   # y_mu rows
        ], axis=0))  # (6, 2f)
        acc["b2"].append(jnp.concatenate([b2l, b2m])[:, None])  # (6, 1)
        # FiLM nets in head-stacked order: (lv_w, lv_b, mu_w, mu_b)
        film = [
            _fold_film(cp[h][n], cs[h][n])
            for h in ("T_logvar", "T_mu")
            for n in ("cond_w", "cond_b")
        ]
        acc["film_k0"].append(jnp.stack([x[0] for x in film]))  # (4, G, f)
        acc["film_a0"].append(jnp.stack([x[1] for x in film]))  # (4, f)
        acc["film_b0"].append(jnp.stack([x[2] for x in film]))
        acc["film_k1"].append(jnp.stack([x[3] for x in film]))  # (4, f, f)
        acc["film_b1"].append(jnp.stack([x[4] for x in film]))
    return {k: jnp.stack(v).astype(jnp.float32) for k, v in acc.items()}


from ..precision import get_matmul_precision

_HP = jax.lax.Precision.HIGHEST


def _kernel_precision_mode() -> str:
    """Kernel matmul precision follows the model-wide knob
    (ops/precision.py): 'highest' (6 f32 MXU passes) for parity, 'high'
    (3 passes — emulated, see _mxdot) at ~f32 accuracy, 'fast' (one
    bf16 pass) as the throughput opt-in — the fused chain is MXU-bound,
    so passes translate ~directly to sampling throughput. The mode is
    read at TRACE time of whichever jit encloses the call (same
    semantics as ops/precision.py): an already-compiled outer step keeps
    the mode it was traced with; set the knob before building steps."""
    mode = get_matmul_precision()
    if mode in ("fast", "default"):
        return "fast"
    return mode


def _concat_saves_chunks(k: int) -> bool:
    """The MXU consumes the contraction axis in 128-deep passes, so a
    dot costs ceil(K/128) passes per output tile. The three 'high'
    hi/lo-split terms can be fused into ONE dot with a 3K contraction
    ([a_hi | a_hi | a_lo] @ [b_hi ; b_lo ; b_hi]) — same three partial
    products, accumulated inside the MXU instead of by two f32 adds.
    Worth it exactly when it drops whole 128-chunks: k=3 -> 1 pass
    instead of 3, k=74 (f2 at flagship) -> 2 instead of 3; k >= 128
    multiples save nothing and pay the operand concat."""
    return -(-3 * k // 128) < 3 * -(-k // 128)


def _concat6_saves_chunks(k: int) -> bool:
    """Same chunk arithmetic for the SIX 'highest' split terms: fuse
    when ceil(6K/128) beats the 6 passes of the Mosaic HIGHEST lowering.
    k=3 -> 1 instead of 6, k=74 -> 4 instead of 6; k a 128-multiple (the
    lane-contracting gradient dots) saves nothing -> native lowering."""
    return -(-6 * k // 128) < 6 * -(-k // 128)


def _split3(x):
    """Exact 3-term bf16 decomposition x = x0 + x1 + x2 (each rounding
    of the f32 residual): together the parts carry >= 24 mantissa bits,
    so the 6 cross products below reconstruct the f32 product to
    roundoff — the same decomposition the Mosaic HIGHEST lowering
    computes per dot; here it is done ONCE per operand."""
    x0 = x.astype(jnp.bfloat16)
    r = x - x0.astype(jnp.float32)
    x1 = r.astype(jnp.bfloat16)
    x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1, x2


def _dot6(a, b):
    """'highest' as an explicit split-once schedule: the six significant
    split products (a0b0, a0b1, a1b0, a0b2, a2b0, a1b1) concatenated
    into ONE 6K-contraction dot, accumulated in f32 inside the MXU. The
    dropped a1b2/a2b1 terms are ~2^-24 relative (each part carries ~8
    mantissa bits) — AT the f32 accumulation roundoff, not below it —
    so the schedule matches the native HIGHEST lowering to a few ulps
    (asserted vs an f64 oracle in
    test_coupling_kernel.py::test_dot_schedules_vs_f64_oracle) while
    costing ceil(6K/128) MXU chunk sweeps instead of 6 passes:
    4 instead of 6 at the flagship f2=74, 1 instead of 6 at K=3/6."""
    a0, a1, a2 = _split3(a)
    b0, b1, b2 = _split3(b)
    A = jnp.concatenate([a0, a0, a1, a0, a2, a1], axis=1)
    Bm = jnp.concatenate([b0, b1, b0, b2, b0, b1], axis=0)
    return jnp.dot(A, Bm, preferred_element_type=jnp.float32)


def _mxdot(a, b, mode: str):
    """Mode-aware matmul. Mosaic lowers only DEFAULT and HIGHEST dot
    precisions, so 'high' (3 bf16 passes, ~f32 accuracy — the drift
    audit measured tpu-high tensor drift equal to tpu-highest) is
    emulated with an explicit bf16 hi/lo split:
    a*b ~ hi(a)hi(b) + hi(a)lo(b) + lo(a)hi(b).
    For the small contraction dims of this model the three terms fuse
    into one tripled-contraction dot (see _concat_saves_chunks), cutting
    the MXU passes ~12 -> 7 per coupling at flagship f2=74.

    'fast' casts both operands to bf16 explicitly — numerically what
    DEFAULT precision does inside the MXU anyway, but the explicit cast
    lets callers STORE activations bf16 (half the VMEM footprint →
    wider cloud tiles per program; ROADMAP item 5). Accumulation stays
    f32 via preferred_element_type."""
    if mode == "high":
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32)

        if _concat_saves_chunks(a.shape[1]):
            return d(
                jnp.concatenate([a_hi, a_hi, a_lo], axis=1),
                jnp.concatenate([b_hi, b_lo, b_hi], axis=0),
            )
        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    if mode == "fast":
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    # 'highest': split-once 6-term schedule when it drops MXU chunks
    # (ROADMAP item: the Mosaic HIGHEST lowering re-splits per dot and
    # always sweeps 6 passes); identical partial products, f32-roundoff
    # agreement, fewer sweeps at this model's small contraction dims
    if _concat6_saves_chunks(a.shape[1]):
        return _dot6(a, b)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)



def film_alpha_beta(packed: Dict, g: jax.Array) -> jax.Array:
    """Per-cloud fused conditioner affines.

    alpha = (eps + exp(film_w(g))) * BN1_scale
    beta  = (eps + exp(film_w(g))) * BN1_shift + film_b(g)
    Returns one (B, C, 2, f2) array: [:, :, 0] = alpha, [:, :, 1] = beta.
    """
    h = jnp.einsum("bg,chgf->bchf", g, packed["film_k0"], precision=_HP)
    h = jax.nn.silu(h * packed["film_a0"] + packed["film_b0"])
    out = jnp.einsum(
        "bchf,chfe->bche", h, packed["film_k1"], precision=_HP
    ) + packed["film_b1"]  # (B, C, 4, f) in (lv_w, lv_b, mu_w, mu_b)
    F = _EPS + jnp.exp(out[:, :, 0::2])     # (B, C, 2, f): lv, mu scales
    film_b = out[:, :, 1::2]                # (B, C, 2, f): lv, mu shifts
    B, C = F.shape[:2]
    F = F.reshape(B, C, -1)                 # (B, C, 2f) head-stacked
    film_b = film_b.reshape(B, C, -1)
    a1 = packed["a1"][:, 0, :]              # (C, 2f)
    b1 = packed["b1"][:, 0, :]
    alpha = F * a1
    beta = F * b1 + film_b
    # packed as one (B, C, 2, f2) array — rows on the LANE dim: a
    # (f2, 1)-shaped layout would pad its 1-wide lane dim to 128 and
    # blow the VMEM budget (2.7 MB/block); the kernel transposes the
    # (1, f2) row it reads per coupling instead
    return jnp.stack([alpha, beta], axis=2)


def _decode_kernel(n_couplings, tb, n_pad, prec, inverse, x_ref,
                   w0_ref, b0_ref, w1_ref, w2_ref, b2_ref,
                   ab_ref, out_ref, lv_ref):
    x = x_ref[0, 0]  # (3, tb * N)
    # bf16 activation STORAGE in fast mode: the MXU truncates DEFAULT-
    # precision inputs to bf16 anyway, so storing h bf16 between dots
    # loses nothing numerically while halving the live VMEM footprint
    # (admits tb twice as wide). The carried state x and the logvar
    # accumulator stay f32 — they thread 3*n_flows couplings.
    store = jnp.bfloat16 if prec == "fast" else jnp.float32

    def coupling(i, carry):
        # inverse runs the exact reverse coupling order
        # (reference decoders.py:61-79)
        c = (n_couplings - 1 - i) if inverse else i
        x, lv = carry
        w0 = w0_ref[0, pl.ds(c, 1)][0]       # (2f, 3)
        b0 = b0_ref[0, pl.ds(c, 1)][0]       # (2f, 1)
        h = jnp.maximum(_mxdot(w0, x, prec) + b0, 0.0).astype(store)
        h = _mxdot(w1_ref[0, pl.ds(c, 1)][0], h, prec)
        # per-cloud FiLM affine on static 128-aligned lane segments
        segs = []
        for t in range(tb):
            alpha = ab_ref[0, 0, t, pl.ds(c, 1), 0].T  # (f2, 1)
            beta = ab_ref[0, 0, t, pl.ds(c, 1), 1].T
            segs.append(jnp.maximum(
                alpha * h[:, t * n_pad:(t + 1) * n_pad] + beta, 0.0
            ).astype(store))
        h = segs[0] if tb == 1 else jnp.concatenate(segs, axis=1)
        # one stacked head dot: rows 0-2 = y_lv, rows 3-5 = y_mu (same
        # per-row arithmetic as two separate dots, half the MXU sweeps)
        y = _mxdot(w2_ref[0, pl.ds(c, 1)][0], h, prec)
        y = y + b2_ref[0, pl.ds(c, 1)][0]
        y_lv = y[0:3, :]
        y_mu = y[3:6, :]
        logvar = jax.nn.soft_sign(y_lv)      # (3, tb*N); 0 on kept chans
        scale = jnp.sqrt(_EPS + jnp.exp(logvar))
        # the conditioner reads only KEPT channels, which the affine
        # leaves semantically unchanged, so mu/logvar are identical in
        # both directions (reference flows.py:112-115)
        x = (x - y_mu) / scale if inverse else scale * x + y_mu
        return x, lv + logvar

    x, lv = jax.lax.fori_loop(
        0, n_couplings, coupling, (x, jnp.zeros_like(x))
    )
    out_ref[0, 0] = x
    lv_ref[0, 0] = lv


def fused_point_decode(
    packed: Dict, ab: jax.Array, p: jax.Array,
    interpret: bool = False, inverse: bool = False,
):
    """Eval pass of the full coupling stack, direct or inverse.

    packed: pack_point_decoder output, optionally with a leading
    component axis K on every leaf (the film_alpha_beta output `ab` then
    carries it too).
    p: (B, 3, N) points — or (K, B, 3, N) with per-component weights.
    Returns (p_out, logvar_sum) with p's shape.
    """
    mode = _kernel_precision_mode()
    if p.ndim == 3:
        out, lv = _fused_point_decode_impl(
            jax.tree.map(lambda x: x[None], packed),
            ab[None], p[None], interpret, mode, inverse,
        )
        return out[0], lv[0]
    return _fused_point_decode_impl(packed, ab, p, interpret, mode,
                                    inverse)


def _lane_cap(precision_mode: str, inverse: bool) -> int:
    """Clouds-per-program lane budget. Wider segments widen the dots
    (one-cloud programs are MXU-latency-bound) at ~3.5 live (2f->80,
    lanes) activation buffers (h scratch + W1 dot output + pipeline
    blocks) of VMEM — bf16 storage (fast mode) halves them, HIGHEST dots
    lower to 6 MXU passes with hi/lo temporaries (and the inverse update
    adds a reciprocal buffer), costing extra headroom. Caps swept on a
    real v5e under the raised (100 MB) vmem limit."""
    if precision_mode == "fast":
        return 32768
    if precision_mode == "highest" and inverse:
        return 8192
    return 16384


@functools.partial(
    jax.jit, static_argnames=("interpret", "precision_mode", "inverse")
)
def _fused_point_decode_impl(packed, ab, p, interpret, precision_mode,
                             inverse=False):
    prec = precision_mode
    K, B, _, N = p.shape
    C = packed["w1"].shape[1]
    f2 = packed["w1"].shape[2]
    n_pad = -(-N // 128) * 128  # aligned lane segments per cloud
    x = p.astype(jnp.float32)
    if n_pad != N:
        x = jnp.concatenate(
            [x, jnp.zeros((K, B, 3, n_pad - N), jnp.float32)], axis=3
        )
    lane_cap = _lane_cap(precision_mode, inverse)
    tb = 1
    for cand in (16, 8, 4, 2):
        if B % cand == 0 and cand * n_pad <= lane_cap:
            tb = cand
            break
    x = x.reshape(K, B // tb, tb, 3, n_pad)
    x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(
        K, B // tb, 3, tb * n_pad
    )

    def wspec(arr):
        # per-component weight block, full C axis (shared over b)
        s = arr.shape[1:]
        return pl.BlockSpec((1,) + s, lambda k, b: (k,) + (0,) * len(s))

    out, lv = pl.pallas_call(
        functools.partial(_decode_kernel, C, tb, n_pad, prec, inverse),
        grid=(K, B // tb),
        in_specs=[
            pl.BlockSpec((1, 1, 3, tb * n_pad),
                         lambda k, b: (k, b, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(packed["w0"]),
            wspec(packed["b0"]),
            wspec(packed["w1"]),
            wspec(packed["w2"]),
            wspec(packed["b2"]),
            pl.BlockSpec((1, 1, tb, C, 2, f2),
                         lambda k, b: (k, b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 3, tb * n_pad),
                         lambda k, b: (k, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, tb * n_pad),
                         lambda k, b: (k, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, B // tb, 3, tb * n_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, B // tb, 3, tb * n_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(
        x,
        packed["w0"], packed["b0"], packed["w1"],
        packed["w2"], packed["b2"],
        # (K, B//tb, tb, C, 2, f2)
        ab.reshape(K, B // tb, tb, C, 2, f2),
    )

    def unpack(z):
        z = z.reshape(K, B // tb, 3, tb, n_pad)
        z = jnp.transpose(z, (0, 1, 3, 2, 4)).reshape(K, B, 3, n_pad)
        return z[:, :, :, :N]

    return unpack(out), unpack(lv)
