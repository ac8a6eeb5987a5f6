#!/usr/bin/env python
"""PARITY_r02 §2 — trained-model rescaling eval through BOTH stacks.

Takes a trained checkpoint from OUR trainer (.msgpack), exports the
weights to a reference-layout .pth, then:
  (a) evaluates the .pth through the REFERENCE torch pipeline (its own
      arch code from /root/reference, its read_img/BGR order, its
      Quantization round, its YCbCr PSNR protocol), and
  (b) evaluates the SAME weights through OUR test_rescaling.py CLI,
on the SAME clips, printing the final averaged HR PSNR side by side.

The flagship prior is a GMM, so the reverse pass SAMPLES high-frequency
latents — both stacks are stochastic at eval (reference draws CUDA-global
noise, SelfC_GMM_arch_inv.py:412-417). We report our CLI twice with
different seeds to bound that noise alongside the cross-stack delta.

Usage:
  python tools/parity_rescaling.py \
      --ckpt experiments/SelfC_synth_GMM_STP6/models/best_G.msgpack \
      --root /tmp/synth_test [--gmm-k 5] [--frames 7]
"""

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


CFG = """
name: parity_r02_eval
model: SelfC_GMM
distortion: sr_bd
scale: 4
datasets:
  test_1:
    name: synth
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
  fh_loss: gmm
  gmm_k: {gmm_k}
path:
  pretrain_model_G: {ckpt}
  strict_load: true
"""


def export_pth(msgpack_path, pth_path, gmm_k, stp_blk_num=6):
    """Our trained params -> reference-layout .pth (reference net is the
    key template; weights replaced by export_state_dict)."""
    import torch

    from conftest import install_reference_stubs

    install_reference_stubs()
    import global_var

    global_var.GlobalVar.set_Temporal_LEN(7)
    global_var.GlobalVar.set_Istrain(False)
    from models.modules.SelfC_GMM_arch_inv import SelfCInvNet

    from flax import serialization

    from selfc_tpu.utils.torch_import import export_state_dict

    with open(msgpack_path, "rb") as f:
        params = serialization.msgpack_restore(f.read())

    opt = {"global_module": "nonlocal", "stp_blk_num": stp_blk_num,
           "fh_loss": "gmm", "scale": 4, "gmm_k": gmm_k}
    tnet = SelfCInvNet(opt, 3, 3, "D2DTNet", [4, 4], 2).eval()
    sd = tnet.state_dict()
    new_sd = export_state_dict(params, sd, "gmm", (4, 4))
    tnet.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in new_sd.items()}
    )
    torch.save(tnet.state_dict(), pth_path)
    return tnet


def ref_eval(tnet, root, frames):
    """Reference-protocol eval: per-clip mean YCbCr PSNR of HR and LR."""
    import torch

    sys.path.insert(0, "/root/reference/codes")
    from data.util import read_img1

    def ycbcr(t):
        r, g, b = t[:, 0], t[:, 1], t[:, 2]
        yy = .299 * r + .587 * g + .114 * b
        cb = (b - yy) * .564 + .5
        cr = (r - yy) * .713 + .5
        return torch.stack((yy, cb, cr), 1)

    def psnr(a, b):
        out = []
        for i in range(a.shape[0]):
            mse = torch.mean((a[i] - b[i]) ** 2)
            out.append(float(20.0 * torch.log10(1.0 / torch.sqrt(mse))))
        return sum(out) / len(out)

    clips = sorted(
        line.strip() for line in open(os.path.join(root, "list.txt"))
        if line.strip()
    )
    hr_psnrs, lr_psnrs = [], []
    for clip in clips:
        d = os.path.join(root, clip)
        ims = []
        for i in range(1, frames + 1):
            img = read_img1(None, os.path.join(d, f"im{i}.png"))
            img = img[:, :, [2, 1, 0]]
            ims.append(torch.from_numpy(
                np.ascontiguousarray(img.transpose(2, 0, 1))).float())
        x = torch.stack(ims, 0)
        # reference BD degradation target for the LR metric
        from models.Guassian import Guassian_downsample

        ref_l = Guassian_downsample(x.permute(1, 0, 2, 3), 4).permute(1, 0, 2, 3)
        with torch.no_grad():
            y, _ = tnet(x, rev=False)
            lr = torch.clamp(y[:, :3], 0, 1)
            lr_q = torch.round(lr * 255.0) / 255.0
            sr, _ = tnet(lr_q, rev=True)
            sr = torch.clamp(sr[:, :3], 0, 1)
        hr_psnrs.append(psnr(ycbcr(sr), ycbcr(x)))
        lr_psnrs.append(psnr(ycbcr(lr_q), ycbcr(ref_l)))
        print(f"  ref {clip}: HR {hr_psnrs[-1]:.4f} dB  LR {lr_psnrs[-1]:.4f} dB",
              flush=True)
    return (sum(hr_psnrs) / len(hr_psnrs), sum(lr_psnrs) / len(lr_psnrs))


def our_eval(ckpt, root, gmm_k, seed, on_tpu):
    cfg_path = "/tmp/parity_r02_eval.yml"
    with open(cfg_path, "w") as f:
        f.write(CFG.format(root=root, ckpt=ckpt, gmm_k=gmm_k))
    env = dict(os.environ)
    if on_tpu:
        env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
        env.pop("JAX_PLATFORMS", None)
    else:
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
    env["SELFC_TPU_EVAL_SEED"] = str(seed)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "test_rescaling.py"),
         "-opt", cfg_path, "--no-images"],
        cwd="/tmp", env=env, capture_output=True, text=True, timeout=3600,
    )
    text = r.stderr + r.stdout
    if r.returncode != 0:
        raise RuntimeError(text[-3000:])
    hr = re.search(r"Averaged HR results for all datasets, PSNR ([\d.]+)dB", text)
    lr = re.search(r"Averaged LR results for all datasets, PSNR ([\d.]+)dB", text)
    return float(hr.group(1)), (float(lr.group(1)) if lr else float("nan"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--root", default="/tmp/synth_test")
    ap.add_argument("--gmm-k", type=int, default=5)
    ap.add_argument("--frames", type=int, default=7)
    ap.add_argument("--tpu", action="store_true",
                    help="run our CLI on the TPU (default CPU for parity)")
    args = ap.parse_args()
    # The our-CLI subprocess runs with cwd=/tmp, so relative paths from the
    # caller's cwd (the round-3 FileNotFoundError at exactly this spot) must
    # be absolutized before they are baked into the eval yml.
    args.ckpt = os.path.abspath(args.ckpt)
    args.root = os.path.abspath(args.root)

    pth = "/tmp/parity_r02_G.pth"
    tnet = export_pth(args.ckpt, pth, args.gmm_k)
    print(f"exported {args.ckpt} -> {pth}")

    ours1 = our_eval(args.ckpt, args.root, args.gmm_k, seed=0, on_tpu=args.tpu)
    print(f"ours (seed 0):  HR {ours1[0]:.4f} dB  LR {ours1[1]:.4f} dB")
    ours2 = our_eval(args.ckpt, args.root, args.gmm_k, seed=1, on_tpu=args.tpu)
    print(f"ours (seed 1):  HR {ours2[0]:.4f} dB  LR {ours2[1]:.4f} dB")

    ref = ref_eval(tnet, args.root, args.frames)
    print(f"reference:      HR {ref[0]:.4f} dB  LR {ref[1]:.4f} dB")
    print(
        f"cross-stack HR delta {abs(ours1[0] - ref[0]):.4f} dB "
        f"(sampling-noise bound {abs(ours1[0] - ours2[0]):.4f} dB)"
    )


if __name__ == "__main__":
    main()
