"""Multi-host CLI integration: TWO real `train_ae.py --distributed`
processes (the reference's multi-node launch, train_ae.py:183-193)
through train -> checkpoint -> exit, then BOTH resume from the
checkpoint — driving the round-5 multi-host checkpoint path at the
actual CLI layer where the round-4 deadlock lived (rank-0 `logging`
gating vs the collective save/restore in train/loops.py +
train/checkpoints.py).
"""

import os
import socket
import subprocess
import sys

import pytest
import yaml

pytestmark = pytest.mark.slow

from go_with_the_flows_tpu.data.synthetic import write_synthetic_meshes_h5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = dict(
    batch_size=4, beta1=0.9, chosen_label=None, cloud_center=False,
    cloud_noise=False, cloud_noise_scale=0.002, cloud_random_rotate=False,
    cloud_recenter2orig=False, cloud_rescale2orig=False, cloud_scale=True,
    cloud_scale_scale=2.0, cloud_size=16, cloud_translate=False,
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
    # bound host compile cost on the 1-core box
    matmul_precision="highest",
)


def _launch_pair(cfg_path, epochs, extra):
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    # PYTHONPATH makes the TPU plugin back off so JAX_PLATFORMS=cpu
    # actually takes effect in the children (verify-skill gotcha)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "train_ae.py", cfg_path, "mh_cli", epochs,
             "0.001", "--weights_type", "learned_weights",
             "--warmup_epoch", "1", "--jobid", "mh",
             "--distributed", "-n", "2", "-nr", str(r),
             "--coordinator", f"127.0.0.1:{port}"] + extra,
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out}"
    return outs


def test_two_process_train_checkpoint_resume_cli(tmp_path):
    write_synthetic_meshes_h5(str(tmp_path / "meshes.h5"), n_shapes=8)
    cfg = dict(TINY)
    cfg["path2data"] = str(tmp_path)
    cfg["path2save"] = str(tmp_path / "results")
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    # fresh 2-epoch distributed run: every epoch end saves a checkpoint
    # (round 4 this deadlocked: rank 0 in orbax's collective, rank 1
    # past it)
    _launch_pair(cfg_path, "2", [])
    exp = [
        os.path.join(root, d)
        for root, dirs, _ in os.walk(tmp_path / "results")
        for d in dirs if d.endswith(".ckpt")
    ]
    assert exp, "no checkpoint directory written"

    # resume on BOTH ranks for 2 more epochs (rank-0 read + broadcast)
    outs = _launch_pair(cfg_path, "4", ["--resume", "--resume_optimizer"])
    assert any("Resumed from epoch 2" in o for o in outs), outs[0][-2000:]
