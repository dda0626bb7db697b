"""End-to-end CLI smoke: synthetic ShapeNet h5 -> train_ae.py (2 epochs,
tiny model) -> checkpoint -> evaluate_ae.py generating mode. This is the
1-epoch-smoke-train test SURVEY.md §4 prescribes."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import yaml

from go_with_the_flows_tpu.data.synthetic import write_synthetic_meshes_h5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CONFIG = dict(
    batch_size=4, beta1=0.9, chosen_label=None, cloud_center=False,
    cloud_noise=False, cloud_noise_scale=0.002, cloud_random_rotate=False,
    cloud_recenter2orig=False, cloud_rescale2orig=False, cloud_scale=True,
    cloud_scale_scale=2.0, cloud_size=32, cloud_translate=False,
    cloud_translate_shift=[0.0, 0.0, 0.0], cycle_length=4,
    deterministic=False, g_latent_space_size=8, g_posterior_n_layers=1,
    g_prior_n_features=8, g_prior_n_flows=2, gent_weight=1.0,
    gnll_weight=1.0, logging=True, logging_img=False,
    logging_img_frequency=1, max_beta2=0.99, max_lr=1e-3,
    meshes_fname="meshes.h5", min_beta2=0.99, min_lr=1e-3,
    n_components=2, n_epochs=2, num_workers=0, p_decoder_base_type="free",
    p_decoder_base_var=-3.9551, p_decoder_n_features=8,
    p_decoder_n_flows=2, p_latent_space_size=3, p_prior_n_layers=1,
    params_reduce_mode="none", pc_enc_init_n_channels=3,
    pc_enc_init_n_features=8, pc_enc_n_features=[8, 16], pnll_weight=1.0,
    resume=False, resume_optimizer=False, saving_mode=True, shuffle=True,
    train_mode="p_rnvp_mc_g_rnvp_vae", util_mode="training", wd=1e-6,
    weights_type="learned_weights",
)


def _run(cmd, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    res = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=900
    )
    if res.returncode != 0:
        raise AssertionError(
            f"cmd {cmd} failed:\nSTDOUT:\n{res.stdout}\nSTDERR:\n{res.stderr}"
        )
    return res.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    write_synthetic_meshes_h5(str(d / "meshes.h5"), n_shapes=8)
    cfg = dict(TINY_CONFIG)
    cfg["path2data"] = str(d)
    cfg["path2save"] = str(d / "results")
    with open(d / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    out = _run([
        sys.executable, "train_ae.py", str(d / "config.yaml"),
        "smoke", "2", "0.001", "--weights_type", "learned_weights",
        "--warmup_epoch", "1", "--jobid", "t1",
    ])
    (d / "train_stdout.txt").write_text(out)
    return d


def test_train_and_evaluate_cli(workdir):
    out = (workdir / "train_stdout.txt").read_text()
    assert "Size of training data: 8" in out
    assert "eval loss" in out

    exp_dir = str(workdir / "results" / "smoke_t1")
    assert os.path.isdir(exp_dir)
    assert os.path.exists(os.path.join(exp_dir, "config.yaml"))
    # checkpoint + best model exist
    ckpts = os.listdir(exp_dir)
    assert any(c.startswith("smoke") for c in ckpts), ckpts
    assert any(c.startswith("best_model_") for c in ckpts), ckpts

    # evaluation in generating mode, 2 reps, CD only (fast)
    out = _run([
        sys.executable, "evaluate_ae.py", exp_dir, "smoke.ckpt",
        "test", "32", "32", "generating", "--batch_size", "4",
        "--reps", "2", "--cd", "--jsd", "--unit_scale_evaluation",
    ])
    assert "MMD-CD" in out
    assert "JSD" in out
    assert "mean ± std" in out

    # autoencoding eval incl. the h5 dump path (--save)
    out = _run([
        sys.executable, "evaluate_ae.py", exp_dir, "smoke.ckpt",
        "test", "32", "32", "autoencoding", "--batch_size", "4",
        "--cd", "--f1", "--save",
    ])
    assert "CD:" in out
    import glob

    dumps = glob.glob(os.path.join(exp_dir, "*_clouds_autoencoding.h5"))
    assert dumps, os.listdir(exp_dir)


def test_interpolation_cli(workdir):
    """`interpolation` eval mode: latent interpolation between shape
    pairs, h5 dump in the reference's intended layout (the utility the
    reference ships commented out, evaluating.py:268-382)."""
    exp_dir = str(workdir / "results" / "smoke_t1")
    out = _run([
        sys.executable, "evaluate_ae.py", exp_dir, "smoke.ckpt",
        "test", "32", "32", "interpolation", "--batch_size", "4",
        "--interpolation_steps", "3", "--interpolation_batches", "1",
    ])
    assert "Saved interpolations" in out
    import h5py

    path = os.path.join(exp_dir, "interpolations_test.h5")
    with h5py.File(path, "r") as f:
        assert set(f.keys()) == {
            "clouds1", "clouds2", "interpolations", "labels"
        }, set(f.keys())
        b, three, n, s = f["interpolations"].shape
        assert (three, n, s) == (3, 32, 3)
        assert f["clouds1"].shape == (b, 3, 32)
        assert f["clouds2"].shape == (b, 3, 32)
        assert f["labels"].shape == (b, 32, 3)
        labels = f["labels"][...]
        assert labels.min() >= 1 and labels.max() <= 2
        assert np.isfinite(f["interpolations"][...]).all()


def test_resume_cli(workdir):
    """Staged-training resume: run 2 more epochs from the checkpoint
    (the reference's multi-stage recipe, scripts/train_airplane_gen.sh)."""
    cfg_path = str(workdir / "config_resume.yaml")
    cfg = yaml.safe_load(open(workdir / "config.yaml"))
    cfg["logging_path"] = str(workdir / "results" / "smoke_t1")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = _run([
        sys.executable, "train_ae.py", cfg_path, "smoke", "4", "0.0005",
        "--resume", "--resume_optimizer", "--warmup_epoch", "0",
        "--jobid", "t1",
    ])
    assert "Resumed from epoch 2" in out
    assert "Epoch: [3]" in out or "eval loss" in out


def test_require_backend_guard(monkeypatch):
    """GWTF_REQUIRE_BACKEND mismatch exits; match and unset pass."""
    from go_with_the_flows_tpu.utils.compile_cache import require_backend

    monkeypatch.delenv("GWTF_REQUIRE_BACKEND", raising=False)
    require_backend()  # unset: no-op
    import jax

    monkeypatch.setenv("GWTF_REQUIRE_BACKEND", jax.default_backend())
    require_backend()  # match: no-op
    monkeypatch.setenv("GWTF_REQUIRE_BACKEND", "nonexistent-backend")
    with pytest.raises(SystemExit):
        require_backend()
