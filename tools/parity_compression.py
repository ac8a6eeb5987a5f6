#!/usr/bin/env python
"""Full compression-path parity: reference torch-CPU forward_test vs our
streaming pipeline, SAME weights, SAME T=100 clip, stand-in codec on both
sides.

The reference's acceptance protocol runs test_compression.py through a
real x265 (README.md:61-78); no ffmpeg binary exists in this image, so
both stacks get a bit-identical 8-bit-quantization stand-in codec. That
still exercises everything else end to end on both sides: GOP
segmentation (Seg_Len=3, pad-by-second-to-last), width-halved encode
tiling, live-stream write/read ordering, 2x2 decode tiling, the full INN
fwd/rev, and the STP prior (fh_loss=l2 -> deterministic sample).

Weights: a reference net is constructed (torch init), its state_dict is
imported into our param tree — shared weights, both directions verified
by tests/test_round2.py::TestTorchExport.

Writes PARITY artifacts to stdout (markdown table rows).
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Default mode: both stacks run the bit-identical NullCodec twin below —
# force our side off the real x265 backend and onto the 'null' stand-in.
# --x265 mode: BOTH stacks run REAL libx265 through the same
# selfc_tpu.codec.h265.H265Stream bridge (the codec is external to both
# networks, so sharing the implementation is exact methodology); rate
# numbers are then real file-size bpp instead of the formula.
X265_MODE = "--x265" in sys.argv
if not X265_MODE:
    os.environ["SELFC_TPU_DISABLE_X265"] = "1"
    os.environ["SELFC_TPU_STANDIN_CODEC"] = "null"

T_LEN = 100
HW = 128
SCALE = 2
Q = 9

NET_OPT = {
    "global_module": "nonlocal", "stp_blk_num": 4, "fh_loss": "l2",
    "scale": SCALE, "stp_hidden_c": 24, "stp_denseblock_innerc": 12,
    "h265_q": Q, "h265_keyint": -1, "h265_all_default": False,
    "deart_net": False, "h265_deart": False, "gmm_k": 5,
}


class StandInStream:
    """Bit-identical twin of selfc_tpu.codec.h265.NullCodec for the torch
    side (torch (N,3,h,w) tensors in, same 8-bit rounding, same synthetic
    bpp formula)."""

    def __init__(self, q, scale_times):
        self.q = q
        self.scale_times = scale_times
        self._frames = []

    def open_writer(self, device, w, h):
        self._frames = []

    def write_multi_frames(self, frames):
        import torch

        x = frames.detach().cpu().clamp(0, 1).numpy()
        u8 = np.round(x * 255.0).astype(np.uint8)
        self._frames.append(u8)

    def close_writer(self):
        return 8.0 / (self.scale_times ** 2) / max(1.0, self.q / 4.0)

    def open_reader(self):
        self._all = np.concatenate(self._frames, axis=0)
        self._pos = 0

    def read_multi_frames(self, num):
        import torch

        out = self._all[self._pos: self._pos + num]
        self._pos += num
        return torch.from_numpy(out.astype(np.float32) / 255.0)

    def close_reader(self):
        pass


class X265TorchStream:
    """--x265 mode: the torch side streams through the SAME real-libx265
    bridge (selfc_tpu.codec.h265.H265Stream) our stack uses, adapting the
    reference's (N,3,h,w) torch tensor interface
    (Quantization_h265_rgb_stream.py:97-162)."""

    def __init__(self, q, scale_times):
        from selfc_tpu.codec.h265 import H265Stream

        self._s = H265Stream(q=q, keyint=-1, scale_times=scale_times)

    def open_writer(self, device, w, h):
        self._s.open_writer(w, h)

    def write_multi_frames(self, frames):
        x = frames.detach().cpu().clamp(0, 1).numpy().transpose(0, 2, 3, 1)
        self._s.write_multi_frames(x)

    def close_writer(self):
        return self._s.close_writer()

    def open_reader(self):
        self._s.open_reader()

    def read_multi_frames(self, num):
        import torch

        out = self._s.read_multi_frames(num)  # (N, h, w, 3) float [0,1]
        return torch.from_numpy(out.transpose(0, 3, 1, 2).copy())

    def close_reader(self):
        self._s.close_reader()


def run_reference(x_video):
    """x_video: (T,3,H,W) float32. Returns (lr_dec, hr, bpp, state_dict)."""
    import torch

    from conftest import install_reference_stubs

    install_reference_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only run
    import global_var

    global_var.GlobalVar.set_Temporal_LEN(T_LEN)
    global_var.GlobalVar.set_Istrain(False)
    import models.modules.SelfC_Codec_arch_inv as codec_arch
    import utils.util as ref_util

    ref_util.save_img = lambda *a, **k: None  # forward_test debug dump
    torch.manual_seed(7)
    all_opt = {
        "scale": SCALE, "train": None,
        "network_G": NET_OPT,
        "datasets": {},
    }
    net = codec_arch.SelfCInvNet(
        NET_OPT, 3, 3, "D2DTNet", [4], 1, all_opt
    ).eval()
    net.Quantization_H265_Stream = (
        X265TorchStream(Q, SCALE) if X265_MODE else StandInStream(Q, SCALE)
    )

    x = torch.from_numpy(x_video)
    with torch.no_grad():
        t0 = time.time()
        lr, _, _, _, _, _, bpp = net.forward_test(x, rev=False)
        hr = net.forward_test(lr, rev=True)
        dt = time.time() - t0
    print(f"reference torch-CPU streaming roundtrip: {dt:.1f}s "
          f"({T_LEN / dt:.3f} frames/s)", file=sys.stderr)
    return (
        lr.numpy(), hr.reshape(T_LEN, 3, HW, HW).numpy(), float(bpp),
        net.state_dict(),
    )


def run_ours(x_video, state_dict):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/selfc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from selfc_tpu.config import dict_to_nonedict
    from selfc_tpu.train.codec_model import CodecModel
    from selfc_tpu.utils.torch_import import import_state_dict

    opt = dict_to_nonedict({
        "is_train": False, "model": "SelfC_GMM_Codec", "distortion": "sr_bd",
        "scale": SCALE,
        "datasets": {},
        "network_G": dict(
            which_model_G={"subnet_type": "D2DTNet"},
            in_nc=3, out_nc=3, block_num=[4], init="xavier",
            **NET_OPT,
        ),
        "path": {},
        "train": None,
    })
    model = CodecModel(opt)
    model.params = {"net": import_state_dict(state_dict, "codec", (4,))}
    # (T,3,H,W) -> (1,T,H,W,3)
    clip = x_video.transpose(0, 2, 3, 1)[None]
    model.feed_data({"GT": clip})
    t0 = time.time()
    model.test()
    dt = time.time() - t0
    print(f"ours (jax, {jax.default_backend()}) streaming roundtrip: "
          f"{dt:.1f}s ({T_LEN / dt:.3f} frames/s)", file=sys.stderr)
    vis = model.get_current_visuals()
    return (
        np.asarray(model.forw_L)[0].transpose(0, 3, 1, 2),
        np.asarray(vis["SR"])[0].transpose(0, 3, 1, 2),
        model.video_bpp,
    )


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    rng = np.random.default_rng(0)
    # smooth-ish synthetic video: moving gradients + low-pass noise
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_synth_data import render_clip

    frames = render_clip(rng, T_LEN, HW, HW)
    x = np.stack([f.transpose(2, 0, 1) for f in frames]).astype(np.float32)

    ref_lr, ref_hr, ref_bpp, sd = run_reference(x)
    our_lr, our_hr, our_bpp = run_ours(x, sd)

    rows = [
        ("LR (decoded) PSNR vs GT-LF", "-", "-"),
        ("HR PSNR vs GT", psnr(ref_hr, x), psnr(our_hr, x)),
        ("bpp", ref_bpp, our_bpp),
    ]
    codec_desc = "REAL libx265 (both stacks)" if X265_MODE else "stand-in codec"
    print(f"\nT={T_LEN}, {HW}x{HW}, scale {SCALE}, q {Q}, {codec_desc}")
    print("| metric | reference (torch CPU) | ours (JAX) |")
    print("|---|---|---|")
    for name, a, b in rows[1:]:
        print(f"| {name} | {a:.4f} | {b:.4f} |")
    print(f"| LR cross-stack max abs diff | "
          f"{np.abs(ref_lr - our_lr).max():.3e} | |")
    print(f"| HR cross-stack max abs diff | "
          f"{np.abs(ref_hr - our_hr).max():.3e} | |")
    print(f"| HR cross-stack PSNR | {psnr(ref_hr, our_hr):.2f} dB | |")


if __name__ == "__main__":
    main()
