"""Dry-run of the one-command real-data acceptance wrapper
(scripts/acceptance_airplane.sh --synthetic): synthetic category ->
staged 4-invocation training with resume -> generating protocol eval,
all through the script's own retry/fail-fast plumbing (forced onto CPU
via the GWTF_ACCEPT_* overrides)."""

import os
import subprocess

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_acceptance_dry_run(tmp_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.update(
        JAX_PLATFORMS="cpu",
        GWTF_ACCEPT_BACKEND="cpu",
        GWTF_ACCEPT_JAX_PLATFORMS="cpu",
        GWTF_ACCEPT_MAX_TRIES="1",
    )
    res = subprocess.run(
        ["bash", "scripts/acceptance_airplane.sh", "--synthetic",
         str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert res.returncode == 0, (
        f"STDOUT:\n{res.stdout[-4000:]}\nSTDERR:\n{res.stderr[-4000:]}"
    )
    table = (tmp_path / "acceptance_table.txt").read_text()
    assert "MMD-CD" in table
    assert "JSD" in table
    assert "mean ± std" in table
    # all four staged invocations ran (stages 2-4 resume from the prior)
    assert res.stdout.count("Resumed from epoch") >= 3, res.stdout[-4000:]
    exp = tmp_path / "results" / "airplane_gen_model_acceptance"
    assert (exp / "config.yaml").exists()
    ckpts = os.listdir(exp)
    assert any(c.startswith("airplane_gen_model") for c in ckpts), ckpts
