"""End-to-end SVR CLI smoke: synthetic meshes + renderings ->
train_svr.py -> evaluate_ae.py reconstruction mode."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow
import yaml

from go_with_the_flows_tpu.data.synthetic import (
    write_synthetic_meshes_h5,
    write_synthetic_images_h5,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_SVR = dict(
    batch_size=4, beta1=0.9, chosen_label=None, cloud_center=False,
    cloud_noise=False, cloud_noise_scale=0.002, cloud_recenter2orig=False,
    cloud_rescale2orig=False, cloud_scale=True, cloud_scale_scale=2.0,
    cloud_size=32, cloud_translate=False,
    cloud_translate_shift=[0.0, 0.0, 0.0], cycle_length=4,
    deterministic=False, g_latent_space_size=8, g_posterior_n_layers=1,
    g_prior_n_features=8, g_prior_n_flows=2, g_prior_n_layers=1,
    gent_weight=1.0, gnll_weight=1.0,
    image_add_grayscale=True,
    image_means=[0.03, 0.03, 0.03, 0.04],
    image_noise=False, image_noise_scale=0.02,
    image_normalize=True, image_pad=False, image_pad_size=[0, 0],
    image_remove_alpha=True, image_resize=True, image_size=[32, 32],
    image_stds=[0.11, 0.11, 0.11, 0.12],
    images_fname="images.h5",
    logging=True, logging_img=True, logging_img_frequency=1,
    logging_img_steps=4,
    max_beta2=0.99, max_lr=1e-3, meshes_fname="meshes.h5",
    min_beta2=0.99, min_lr=1e-3, n_components=2, n_epochs=1,
    num_workers=0, p_decoder_base_type="freevar", p_decoder_base_var=0.0,
    p_decoder_n_features=8, p_decoder_n_flows=2, p_latent_space_size=3,
    p_prior_n_layers=1, params_reduce_mode="none",
    pc_enc_init_n_channels=3, pc_enc_init_n_features=8,
    pc_enc_n_features=[8, 16], pnll_weight=1.0, resume=False,
    resume_optimizer=False, shuffle=True,
    train_mode="p_rnvp_mc_g_rnvp_vae_ic", util_mode="training", wd=1e-6,
    weights_type="learned_weights",
)


def _run(cmd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    res = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=1200,
    )
    if res.returncode != 0:
        raise AssertionError(
            f"cmd {cmd} failed:\nSTDOUT:\n{res.stdout}\nSTDERR:\n{res.stderr}"
        )
    return res.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("svr")
    # only 2 shapes: SVR dataset length is 24 * n_shapes
    write_synthetic_meshes_h5(str(d / "meshes.h5"), n_shapes=2,
                              parts=("train", "test"))
    write_synthetic_images_h5(str(d / "images.h5"), n_shapes=2, hw=33,
                              parts=("train", "test"))
    cfg = dict(TINY_SVR)
    cfg["path2data"] = str(d)
    cfg["path2save"] = str(d / "results")
    with open(d / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    out = _run([
        sys.executable, "train_svr.py", str(d / "config.yaml"),
        "svr_smoke", "1", "0.001", "--weights_type", "learned_weights",
        "--warmup_epoch", "0", "--jobid", "s1",
    ])
    (d / "train_stdout.txt").write_text(out)
    return d


def test_train_svr_cli(workdir):
    out = (workdir / "train_stdout.txt").read_text()
    assert "Size of training data: 48" in out  # 24 views x 2 shapes
    exp_dir = str(workdir / "results" / "svr_smoke_s1")
    assert os.path.isdir(exp_dir)
    ckpts = os.listdir(exp_dir)
    assert any(c.startswith("svr_smoke") for c in ckpts), ckpts


def test_train_svr_instrumentation(workdir):
    """In-training SVR observability (reference training.py:248-254,
    269-291): per-step scalars AND periodic reconstruction figures must
    land in the TB event files."""
    log_dir = str(workdir / "results" / "svr_smoke_s1" / "log")
    assert os.path.isdir(log_dir)
    blob = b""
    for root, _, files in os.walk(log_dir):
        for f in files:
            if "tfevents" in f:
                with open(os.path.join(root, f), "rb") as fh:
                    blob += fh.read()
    assert b"train/loss" in blob
    assert b"train/PNLL" in blob
    assert b"svr_reconstruction" in blob


def test_evaluate_svr_reconstruction(workdir):
    exp_dir = str(workdir / "results" / "svr_smoke_s1")
    out = _run([
        sys.executable, "evaluate_ae.py", exp_dir, "svr_smoke.ckpt",
        "test", "32", "32", "reconstruction", "--batch_size", "4",
        "--cd", "--f1", "--f1_threshold_lst", "0.001",
        "--unit_scale_evaluation",
    ])
    assert "CD:" in out
    assert "F1-0.0010" in out
    assert "Inference time" in out
