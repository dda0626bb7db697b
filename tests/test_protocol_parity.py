"""Cross-framework metric-protocol parity: identical cloud buffers through
the reference's OWN torch metric code and through ours, asserting every
reported table number agrees to float tolerance.

The reference metric stack is CPU-runnable except the CUDA EMD:
  - pure-torch Chamfer fallback  (reference evaluation_metrics.py:34-44)
  - EMD_CD_F1                    (reference evaluation_metrics.py:46-100)
  - _pairwise_EMD_CD_F1_SCORE / knn / lgan_mmd_cov / compute_all_metrics
                                 (reference evaluation_metrics.py:103-309)
  - occupancy-grid JSD           (reference evaluation_metrics.py:315-430)
  - voxel JSD                    (reference lib/networks/utils.py:45-87)

EMD cannot run through the reference's own code here (CUDA-only,
approxmatch.cu) — but it is PROVEN-IDENTICAL SEMANTICS by a literal
loop-for-loop numpy transliteration of that kernel asserted equal to
ops/emd.py::approx_match/match_cost (tests/test_emd_oracle.py), plus a
scipy Hungarian oracle and a f64 re-derivation (tests/test_metrics.py,
tests/test_pallas_kernels.py). THIS file proves that every reduction,
threshold, scale and protocol decision AROUND the per-pair distances
matches the reference bit-for-bit semantics, so the acceptance run on
real data cannot drift on protocol.

Import trick: `lib.metrics.evaluation_metrics` imports the built CUDA
package at module top (evaluation_metrics.py:9-10); we pre-register stub
modules whose functions raise, and only exercise the accelerated_cd=False
paths (the reference's own CPU fallback pattern).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REFERENCE, "lib"))
try:
    import torch

    HAVE_TORCH = True
except Exception:
    HAVE_TORCH = False

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not (HAVE_REF and HAVE_TORCH),
    reason="reference repo or torch unavailable",
)]

if HAVE_REF:
    sys.path.insert(0, REFERENCE)


def _cuda_unavailable(*a, **k):  # pragma: no cover - must never be hit
    raise RuntimeError("CUDA StructuralLosses stub called: a parity test "
                       "followed an accelerated_cd path by mistake")


@pytest.fixture(scope="module")
def ref_metrics():
    """Reference evaluation_metrics with the CUDA extension stubbed."""
    for name in ("lib.metrics.StructuralLosses",
                 "lib.metrics.StructuralLosses.match_cost",
                 "lib.metrics.StructuralLosses.nn_distance"):
        mod = types.ModuleType(name)
        mod.match_cost = _cuda_unavailable
        mod.nn_distance = _cuda_unavailable
        sys.modules.setdefault(name, mod)
    import lib.metrics.evaluation_metrics as ref_em

    return ref_em


@pytest.fixture(scope="module")
def ref_utils(ref_metrics):
    import lib.networks.utils as ref_utils

    return ref_utils


def _mixture_clouds(n_clouds, n_pts, seed, jitter=0.0):
    """Blob-mixture clouds inside the unit sphere — structured enough that
    COV < 1 and 1-NNA is non-trivial, scaled like the eval protocol
    (cloud/2 frame, |x| <= 0.5) so the JSD grids see in-bound points."""
    rng = np.random.RandomState(seed)
    centers = np.array([[-0.25, 0.0, 0.0], [0.25, 0.0, 0.0],
                        [0.0, 0.3, 0.0], [0.0, 0.0, -0.3]])
    which = rng.randint(0, len(centers), size=(n_clouds, n_pts))
    scale = 0.05 + 0.05 * rng.rand(n_clouds, 1, 1)
    pts = centers[which] + rng.randn(n_clouds, n_pts, 3) * scale
    pts = pts + jitter * rng.randn(*pts.shape)
    return np.clip(pts, -0.49, 0.49).astype(np.float32)


S, N = 14, 160  # small enough for the torch O(N^2) loops, non-square-safe


@pytest.fixture(scope="module")
def clouds():
    sample = _mixture_clouds(S, N, seed=0, jitter=0.01)
    ref = _mixture_clouds(S, N, seed=1)
    return sample, ref


def _ours():
    from go_with_the_flows_tpu.metrics import evaluation

    return evaluation


# --------------------------------------------------------------------- #
# paired metrics (AE protocol): EMD_CD_F1                                #
# --------------------------------------------------------------------- #
#
# NOTE on CDL/CDR order: the reference's pure-torch fallback
# (evaluation_metrics.py:34-44) returns (min-over-sample per REF point,
# min-over-ref per SAMPLE point) — the REVERSE of its own CUDA path
# (nn_distance returns per-x then per-y, nndistance.cu:125-128), which the
# published protocol uses (evaluating.py:173,214 pass accelerated_cd=True).
# CD (the sum) and F1 (harmonic mean, symmetric under the precision/recall
# swap) are invariant, so the protocol numbers are unaffected; CDL/CDR /
# one_part_of_cd differ between the reference's own two paths and are never
# reported. We follow the CUDA semantics, so torch-fallback CDL == our CDR.

@pytest.mark.parametrize("threshold", [1e-4, 1e-3])
def test_paired_emd_cd_f1_matches_reference(ref_metrics, clouds, threshold):
    sample, ref = clouds
    ours = _ours()

    res_t = ref_metrics.EMD_CD_F1(
        torch.from_numpy(sample), torch.from_numpy(ref), batch_size=5,
        accelerated_cd=False, reduced=True, cd_option=True,
        one_part_of_cd=True, f1_option=True, f1_threshold=threshold,
    )
    res_j = ours.EMD_CD_F1(
        sample, ref, batch_size=5, reduced=True, cd_option=True,
        one_part_of_cd=True, f1_option=True, f1_threshold=threshold,
    )
    # torch fallback's (CDL, CDR) == our (CDR, CDL); see note above
    for key_t, key_j in (("CD", "CD"), ("F1", "F1"),
                         ("CDL", "CDR"), ("CDR", "CDL")):
        t = float(res_t[key_t])
        j = float(res_j[key_j])
        assert j == pytest.approx(t, rel=2e-5, abs=2e-7), (key_t, t, j)


def test_paired_unreduced_vectors_match(ref_metrics, clouds):
    sample, ref = clouds
    ours = _ours()
    res_t = ref_metrics.EMD_CD_F1(
        torch.from_numpy(sample), torch.from_numpy(ref), batch_size=4,
        accelerated_cd=False, reduced=False, cd_option=True, f1_option=True,
    )
    res_j = ours.EMD_CD_F1(
        sample, ref, batch_size=4, reduced=False, cd_option=True,
        f1_option=True,
    )
    np.testing.assert_allclose(
        np.asarray(res_j["CD"]), res_t["CD"].numpy(), rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(
        np.asarray(res_j["F1"]), res_t["F1"].numpy(), rtol=2e-5, atol=2e-5)


# --------------------------------------------------------------------- #
# pairwise matrices + MMD/COV + 1-NNA (generative protocol)              #
# --------------------------------------------------------------------- #

def test_pairwise_matrices_match_reference(ref_metrics, clouds):
    sample, ref = clouds
    ours = _ours()
    cd_t, _, f1_t, cdl_t, cdr_t = ref_metrics._pairwise_EMD_CD_F1_SCORE(
        torch.from_numpy(sample), torch.from_numpy(ref), batch_size=6,
        f1_threshold=1e-3, accelerated_cd=False, cd_option=True,
        one_part_of_cd=True, f1_option=True,
    )
    cd_j, _, f1_j, cdl_j, cdr_j = ours.pairwise_EMD_CD_F1(
        sample, ref, batch_size=6, f1_threshold=1e-3, cd_option=True,
        one_part_of_cd=True, f1_option=True, use_pallas=False,
    )
    np.testing.assert_allclose(cd_j, cd_t.numpy(), rtol=3e-5, atol=3e-7)
    # torch fallback swaps dl/dr vs the protocol's CUDA order (note above)
    np.testing.assert_allclose(cdr_j, cdl_t.numpy(), rtol=3e-5, atol=3e-7)
    np.testing.assert_allclose(cdl_j, cdr_t.numpy(), rtol=3e-5, atol=3e-7)
    np.testing.assert_allclose(f1_j, f1_t.numpy(), rtol=3e-5, atol=3e-4)


def test_pairwise_pallas_grid_matches_reference(ref_metrics, clouds):
    """The fused Pallas grid path (interpret mode off-TPU) must agree with
    the reference matrices too — this is the path the real protocol runs."""
    sample, ref = clouds
    ours = _ours()
    cd_t, _, f1_t, _, _ = ref_metrics._pairwise_EMD_CD_F1_SCORE(
        torch.from_numpy(sample), torch.from_numpy(ref), batch_size=6,
        f1_threshold=1e-3, accelerated_cd=False, cd_option=True,
        f1_option=True,
    )
    cd_j, _, f1_j, _, _ = ours.pairwise_EMD_CD_F1(
        sample, ref, batch_size=6, f1_threshold=1e-3, cd_option=True,
        f1_option=True, use_pallas=True,
    )
    np.testing.assert_allclose(cd_j, cd_t.numpy(), rtol=3e-5, atol=3e-7)
    np.testing.assert_allclose(f1_j, f1_t.numpy(), rtol=3e-5, atol=3e-4)


def test_knn_and_mmd_cov_match_reference(ref_metrics, clouds):
    """knn / lgan_mmd_cov on the SAME matrix must agree exactly (these are
    pure reductions; feeding both the same input isolates them from any
    distance-kernel float noise)."""
    sample, ref = clouds
    rng = np.random.RandomState(3)
    M_rs = rng.rand(S, S).astype(np.float32)
    M_rr = rng.rand(S, S).astype(np.float32)
    M_rr = (M_rr + M_rr.T) / 2
    M_ss = rng.rand(S, S).astype(np.float32)
    M_ss = (M_ss + M_ss.T) / 2
    ours = _ours()

    res_t = ref_metrics.knn(torch.from_numpy(M_ss), torch.from_numpy(M_rs),
                            torch.from_numpy(M_rr), 1, sqrt=False)
    res_j = ours.knn_two_sample(M_ss, M_rs, M_rr, k=1)
    for key in ("acc", "acc_t", "acc_f", "precision", "recall"):
        assert float(res_j[key]) == pytest.approx(float(res_t[key]),
                                                  abs=1e-6), key

    for mode in ("min", "max"):
        mmd_t = ref_metrics.lgan_mmd_cov(torch.from_numpy(M_rs), mode)
        mmd_j = ours.lgan_mmd_cov(M_rs, mode)
        for key in ("lgan_mmd", "lgan_cov", "lgan_mmd_smp"):
            assert float(mmd_j[key]) == pytest.approx(
                float(mmd_t[key]), abs=1e-6), (mode, key)


def test_compute_all_metrics_table_matches_reference(ref_metrics, clouds):
    """The end-to-end generative table (MMD/COV over CD and F1 + all three
    1-NNA accuracies) from compute_all_metrics — the numbers the paper
    reports (x1e4 / x1e2 scaling is applied downstream identically,
    eval/evaluating.py vs reference evaluating.py:219-236). Protocol
    settings: one_part_of_cd=False as in evaluating.py:215."""
    sample, ref = clouds
    ours = _ours()
    res_t = ref_metrics.compute_all_metrics(
        torch.from_numpy(sample), torch.from_numpy(ref), batch_size=6,
        accelerated_cd=False, cd_option=True, f1_option=True,
    )
    res_j = ours.compute_all_metrics(
        sample, ref, batch_size=6, cd_option=True, f1_option=True,
    )
    # key sets must line up (reference keys are '<stat>-<metric>')
    keys_t = {k for k, v in res_t.items()
              if hasattr(v, "numel") and v.numel() == 1}
    keys_j = {k for k, v in res_j.items() if np.size(v) == 1}
    assert keys_t <= keys_j, keys_t - keys_j
    for key in sorted(keys_t):
        t = float(res_t[key])
        j = float(res_j[key])
        assert j == pytest.approx(t, rel=3e-5, abs=3e-6), (key, t, j)


# --------------------------------------------------------------------- #
# JSD (both reference variants)                                          #
# --------------------------------------------------------------------- #

def test_grid_jsd_matches_reference(ref_metrics, clouds):
    """Occupancy-grid JSD (latent_3d_points protocol,
    reference evaluation_metrics.py:336-430)."""
    sample, ref = clouds
    ours = _ours()
    t = float(ref_metrics.jsd_between_point_cloud_sets(sample, ref,
                                                       resolution=28))
    j = float(ours.jsd_between_point_cloud_sets(sample, ref, resolution=28))
    assert j == pytest.approx(t, rel=1e-6, abs=1e-9)


def test_voxel_jsd_matches_reference(ref_utils, clouds):
    """Voxel-histogram JSD (reference lib/networks/utils.py:45-87) — the
    variant the eval driver actually reports (evaluating.py:205-210)."""
    sample, ref = clouds
    ours = _ours()
    t = float(ref_utils.JSD(sample, ref, warning=False))
    j = float(ours.voxel_jsd(sample, ref, warn=False))
    assert j == pytest.approx(t, rel=1e-6, abs=1e-12)


def test_voxel_jsd_out_of_bound_points_match(ref_utils):
    """Out-of-cube points must be dropped identically (the reference's
    interval test leaves them out of the histogram)."""
    rng = np.random.RandomState(11)
    a = (rng.rand(6, 200, 3) * 1.4 - 0.7).astype(np.float32)  # some outside
    b = (rng.rand(6, 200, 3) * 1.4 - 0.7).astype(np.float32)
    ours = _ours()
    t = float(ref_utils.JSD(a, b, warning=False))
    j = float(ours.voxel_jsd(a, b, warn=False))
    assert j == pytest.approx(t, rel=1e-6, abs=1e-12)


# --------------------------------------------------------------------- #
# f_score (SVR protocol)                                                 #
# --------------------------------------------------------------------- #

def test_f_score_matches_reference_formula(ref_metrics, clouds):
    """Our f_score vs the reference F1 computed through EMD_CD_F1 with the
    SVR threshold 1e-3 (reference utils.py:38-42 uses the same formula on
    the CUDA Chamfer; EMD_CD_F1's fallback branch is its CPU equivalent)."""
    sample, ref = clouds
    ours = _ours()
    res_t = ref_metrics.EMD_CD_F1(
        torch.from_numpy(sample), torch.from_numpy(ref),
        batch_size=S, accelerated_cd=False, reduced=False,
        f1_option=True, f1_threshold=1e-3,
    )
    f1_j = np.asarray(ours.f_score(sample, ref, threshold=1e-3))
    np.testing.assert_allclose(f1_j, res_t["F1"].numpy(),
                               rtol=2e-5, atol=2e-5)
