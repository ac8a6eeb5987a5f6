"""End-to-end smoke: synthetic PNG dataset -> train.py (few iters, ckpt)
-> test_rescaling.py (loads ckpt, metric log lines)."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_dataset(root, n_vids=3, n_frames=7, hw=48):
    rng = np.random.default_rng(0)
    names = []
    for v in range(n_vids):
        d = os.path.join(root, f"vid{v:03d}")
        os.makedirs(d, exist_ok=True)
        base = rng.integers(0, 255, (hw, hw, 3), np.uint8)
        for i in range(1, n_frames + 1):
            shift = np.roll(base, i, axis=1)
            cv2.imwrite(os.path.join(d, f"im{i}.png"), shift)
        names.append(f"vid{v:03d}")
    with open(os.path.join(root, "list.txt"), "w") as f:
        f.write("\n".join(names))


CFG = """
name: smoke_debug
use_tb_logger: false
model: SelfC_GMM
distortion: sr_bd
scale: 4
datasets:
  train:
    name: synth
    mode: LQGTVID
    dataroot_GT: {root}
    dataroot_list: {root}/list.txt
    video_len: 3
    use_shuffle: true
    n_workers: 1
    batch_size: 2
    GT_size: 32
    use_flip: true
    use_rot: true
    color: RGB
  val1:
    name: synthval
    batch_size: 1
    mode: LQGTVID
    dataroot_GT: {root}
    dataroot_list: {root}/list.txt
    video_len: 3
network_G:
  which_model_G:
      subnet_type: D2DTNet
  in_nc: 3
  out_nc: 3
  block_num: [1, 1]
  scale: 4
  init: xavier
  global_module: nonlocal
  stp_blk_num: 2
  fh_loss: gmm
  gmm_k: 2
path:
  pretrain_model_G:
train:
  lr_G: !!float 1e-4
  beta1: 0.9
  beta2: 0.999
  niter: 4
  warmup_iter: -1
  lr_scheme: MultiStepLR
  lr_steps: [2]
  lr_gamma: 0.5
  pixel_criterion_forw: l2
  pixel_criterion_back: l1
  lambda_cond_prob: 0
  manual_seed: 10
  val_freq: 100
  lambda_fit_forw: 1
  lambda_rec_back: 1
  weight_decay_G: !!float 1e-14
  gradient_clipping: 10
logger:
  print_freq: 1
  save_checkpoint_freq: 100
"""

TEST_CFG = """
name: smoke_eval
model: SelfC_GMM
distortion: sr_bd
scale: 4
datasets:
  test_1:
    name: synthtest
    mode: LQGTVID
    dataroot_GT: {root}
    dataroot_list: {root}/list.txt
    video_len: 3
    batch_size: 1
network_G:
  which_model_G:
      subnet_type: D2DTNet
  in_nc: 3
  out_nc: 3
  block_num: [1, 1]
  scale: 4
  init: xavier
  global_module: nonlocal
  stp_blk_num: 2
  fh_loss: gmm
  gmm_k: 2
path:
  pretrain_model_G: {ckpt}
  strict_load: true
"""


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 2 virtual devices -> real dp=2 sharding with the batch-size-2 config
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1500,
    )


@pytest.mark.slow
def test_train_then_eval(tmp_path):
    data_root = tmp_path / "data"
    _make_dataset(str(data_root))
    cfg = tmp_path / "train.yml"
    cfg.write_text(CFG.format(root=str(data_root)))

    r = _run([os.path.join(REPO, "train.py"), "-opt", str(cfg)], str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    assert "End of training." in r.stderr + r.stdout
    ckpt = tmp_path / "experiments" / "smoke_debug" / "models" / "latest_G.msgpack"
    assert ckpt.exists(), "final checkpoint missing"

    tcfg = tmp_path / "test.yml"
    tcfg.write_text(TEST_CFG.format(root=str(data_root), ckpt=str(ckpt)))
    r2 = _run(
        [os.path.join(REPO, "test_rescaling.py"), "-opt", str(tcfg), "--no-images"],
        str(tmp_path),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    out = r2.stderr + r2.stdout
    assert "Averaged HR results for all datasets" in out
    assert "Averaged LR results for all datasets" in out
