"""Full-system eval parity: the reference's torch eval pipeline vs our
test_rescaling.py CLI, same .pth weights, same PNG clips, compared at the
final averaged PSNR.

This exercises EVERYTHING at once: PNG reading (BGR->RGB), the BD
degradation target, the .pth importer, the full INN forward/quantize/
prior/inverse, and the YCbCr metric protocol. fh_loss='l2' makes the
prior sample deterministic so the two stacks must agree to float noise.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/codes"

CFG = """
name: parity_eval
model: SelfC_GMM
distortion: sr_bd
scale: 4
datasets:
  test_1:
    name: parityset
    mode: LQGTVID
    dataroot_GT: {root}
    dataroot_list: {root}/list.txt
    video_len: 7
    batch_size: 1
network_G:
  which_model_G:
      subnet_type: D2DTNet
  in_nc: 3
  out_nc: 3
  block_num: [4, 4]
  scale: 4
  init: xavier
  global_module: nonlocal
  stp_blk_num: 6
  fh_loss: l2
  gmm_k: 5
path:
  pretrain_model_G: {ckpt}
  strict_load: true
"""


def _make_clips(root, n=2, frames=7, hw=64):
    rng = np.random.default_rng(11)
    names = []
    for v in range(n):
        d = os.path.join(root, f"clip{v}")
        os.makedirs(d, exist_ok=True)
        base = rng.integers(0, 255, (hw, hw, 3), np.uint8)
        for i in range(1, frames + 1):
            cv2.imwrite(os.path.join(d, f"im{i}.png"), np.roll(base, 2 * i, 1))
        names.append(f"clip{v}")
    with open(os.path.join(root, "list.txt"), "w") as f:
        f.write("\n".join(names))


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")
def test_cli_eval_matches_reference_pipeline(tmp_path):
    from conftest import install_reference_stubs

    install_reference_stubs()
    import global_var

    global_var.GlobalVar.set_Temporal_LEN(7)
    global_var.GlobalVar.set_Istrain(False)
    from models.modules.SelfC_GMM_arch_inv import SelfCInvNet

    data_root = tmp_path / "clips"
    _make_clips(str(data_root))

    # --- reference side: build net, save .pth, run its eval protocol ----
    opt = {"global_module": "nonlocal", "stp_blk_num": 6, "fh_loss": "l2",
           "scale": 4, "gmm_k": 5}
    torch.manual_seed(21)
    tnet = SelfCInvNet(opt, 3, 3, "D2DTNet", [4, 4], 2).eval()
    ckpt = tmp_path / "parity_G.pth"
    torch.save(tnet.state_dict(), str(ckpt))

    sys.path.insert(0, REF)
    from data.util import read_img1  # reference image reading

    def ref_eval_clip(clip_dir):
        frames = []
        for i in range(1, 8):
            img = read_img1(None, os.path.join(clip_dir, f"im{i}.png"))
            img = img[:, :, [2, 1, 0]]  # BGR->RGB as the dataset does
            frames.append(torch.from_numpy(
                np.ascontiguousarray(img.transpose(2, 0, 1))).float())
        x = torch.stack(frames, 0)  # (7, 3, H, W)
        with torch.no_grad():
            y, _ = tnet(x, rev=False)
            lr = torch.clamp(y[:, :3], 0, 1)
            lr = torch.round(lr * 255.0) / 255.0  # reference Quantization
            sr, _ = tnet(lr, rev=True)
            sr = sr[:, :3]
        # reference Y-metric: full YCbCr tensor PSNR per frame
        def ycbcr(t):
            r, g, b = t[:, 0], t[:, 1], t[:, 2]
            yy = .299 * r + .587 * g + .114 * b
            cb = (b - yy) * .564 + .5
            cr = (r - yy) * .713 + .5
            return torch.stack((yy, cb, cr), 1)
        a, b = ycbcr(sr), ycbcr(x)
        psnrs = []
        for i in range(7):
            mse = torch.mean((a[i] - b[i]) ** 2)
            psnrs.append(float(20.0 * torch.log10(1.0 / torch.sqrt(mse))))
        return sum(psnrs) / len(psnrs)

    ref_psnrs = [ref_eval_clip(str(data_root / f"clip{v}")) for v in range(2)]
    ref_avg = sum(ref_psnrs) / len(ref_psnrs)

    # --- our side: the actual CLI ---------------------------------------
    cfg = tmp_path / "eval.yml"
    cfg.write_text(CFG.format(root=str(data_root), ckpt=str(ckpt)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "test_rescaling.py"),
         "-opt", str(cfg), "--no-images"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(
        r"Averaged HR results for all datasets, PSNR ([\d.]+)dB",
        r.stderr + r.stdout,
    )
    assert m, (r.stderr + r.stdout)[-2000:]
    ours = float(m.group(1))

    assert abs(ours - ref_avg) < 0.05, (
        f"CLI PSNR {ours:.4f} vs reference pipeline {ref_avg:.4f}"
    )
