"""Loop-for-loop numpy transliteration oracle for the approxmatch kernel.

`ops/emd.py::approx_match` is a re-DERIVATION of the reference's
ApproxMatch CUDA kernel; the protocol-parity suite documents EMD as the
one metric it cannot run through the reference's own code (CUDA-only,
tests/test_protocol_parity.py). This file closes that caveat: a literal,
serial numpy port of the kernel's arithmetic — following the reference's
own serial version left in comments (approxmatch.cu:64-78, 111-128,
164-179) with the same level schedule, epsilons, clamps, capacity
arithmetic, and update ORDER as the live device code
(approxmatch.cu:3-182) — asserted equal to approx_match/match_cost, so
"EMD is non-comparable" becomes "EMD is proven-identical semantics".

Transliterated facts worth naming:
  * capacities: multiL=1, multiR=n/m for n>=m else multiL=m/n, multiR=1
    with C INTEGER division (approxmatch.cu:4-12);
  * the level loop is `for (j=7; j>-2; j--)` — j runs 7..-1, NINE
    levels; the `if (j==-2) level=0` branch (approxmatch.cu:24-28) is
    DEAD code (the commented-out `j>=-2` bound would have reached it);
  * suml seeds at 1e-9 BEFORE the row sum (approxmatch.cu:37);
  * sumr multiplies remainR AFTER the column sum, consumption clamps at
    1, ratioR uses the PRE-update remainR, and remainR clamps at 0
    (approxmatch.cu:107-113);
  * match accumulates exp(level*D)*ratioL_k*ratioR_l and remainL then
    clamps at 0 (approxmatch.cu:130-163);
  * match memory layout is [l*n+k] (transposed vs ours' (N, M) — the
    oracle uses (N, M) and the layout only matters to the cost sum);
  * cost = sum match * EUCLIDEAN distance (approxmatch.cu:184-224).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from go_with_the_flows_tpu.ops.emd import approx_match, match_cost


def approx_match_oracle(xyz1: np.ndarray, xyz2: np.ndarray) -> np.ndarray:
    """Serial transliteration for ONE pair (n,3)/(m,3) -> match (n, m)."""
    n, m = xyz1.shape[0], xyz2.shape[0]
    xyz1 = xyz1.astype(np.float32)
    xyz2 = xyz2.astype(np.float32)
    # approxmatch.cu:6-12 (C integer division of ints n, m)
    if n >= m:
        multiL, multiR = 1.0, float(n // m)
    else:
        multiL, multiR = float(m // n), 1.0
    match = np.zeros((n, m), np.float32)
    remainL = np.full(n, multiL, np.float32)
    remainR = np.full(m, multiR, np.float32)
    for j in range(7, -2, -1):  # approxmatch.cu:24 `for (j=7;j>-2;j--)`
        level = -(4.0 ** j)
        if j == -2:  # pragma: no cover — dead branch, kept literally
            level = 0.0
        # phase 1: ratioL (serial reference approxmatch.cu:64-78)
        ratioL = np.zeros(n, np.float32)
        for k in range(n):
            suml = np.float32(1e-9)
            for l in range(m):
                d = ((xyz2[l] - xyz1[k]) ** 2).sum()
                suml += np.exp(np.float32(level * d)) * remainR[l]
            ratioL[k] = remainL[k] / suml
        # phase 2: ratioR / remainR (approxmatch.cu:111-128)
        ratioR = np.zeros(m, np.float32)
        for l in range(m):
            sumr = np.float32(0.0)
            for k in range(n):
                d = ((xyz2[l] - xyz1[k]) ** 2).sum()
                sumr += np.exp(np.float32(level * d)) * ratioL[k]
            sumr *= remainR[l]
            consumption = min(remainR[l] / (sumr + np.float32(1e-9)), 1.0)
            ratioR[l] = consumption * remainR[l]
            remainR[l] = max(np.float32(0.0), remainR[l] - sumr)
        # phase 3: match accumulation / remainL (approxmatch.cu:164-179)
        for k in range(n):
            suml = np.float32(0.0)
            for l in range(m):
                d = ((xyz2[l] - xyz1[k]) ** 2).sum()
                w = np.exp(np.float32(level * d)) * ratioL[k] * ratioR[l]
                match[k, l] += w
                suml += w
            remainL[k] = max(np.float32(0.0), remainL[k] - suml)
    return match


def match_cost_oracle(xyz1, xyz2, match) -> float:
    """matchcostkernel (approxmatch.cu:184-224): sum match * ||x - y||."""
    n, m = xyz1.shape[0], xyz2.shape[0]
    total = np.float32(0.0)
    for k in range(n):
        for l in range(m):
            d = np.sqrt(((xyz2[l] - xyz1[k]) ** 2).sum())
            total += match[k, l] * np.float32(d)
    return float(total)


@pytest.mark.parametrize("n,m", [(24, 24), (32, 8), (8, 20)])
def test_approx_match_equals_cuda_transliteration(n, m):
    rng = np.random.RandomState(3 * n + m)
    B = 2
    a = (rng.randn(B, n, 3) * 0.4).astype(np.float32)
    b = (rng.randn(B, m, 3) * 0.4).astype(np.float32)

    got = np.asarray(approx_match(jnp.asarray(a), jnp.asarray(b)))
    for i in range(B):
        want = approx_match_oracle(a[i], b[i])
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=1e-6)
        # every level conserved mass: total match approaches min-side
        # capacity x points (sanity that the schedule really converged)
        assert abs(want.sum() - min(n * (m // n if m > n else 1),
                                    m * (n // m if n >= m else 1))
                   ) / want.sum() < 0.05

    got_cost = np.asarray(match_cost(jnp.asarray(a), jnp.asarray(b)))
    for i in range(B):
        want = match_cost_oracle(
            a[i], b[i], approx_match_oracle(a[i], b[i])
        )
        np.testing.assert_allclose(got_cost[i], want, rtol=2e-4)
