#!/usr/bin/env python
"""Compression evaluation CLI — mirrors reference codes/test_compression.py.

Per clip: stream through the (real or stand-in) H.265 codec, report HR
PSNR + MS-SSIM, LR PSNR/SSIM and bpp in the reference's log formats
(the formats captured by test_logs/VUG_compression_bf/*.log).
"""

import argparse
import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

from selfc_tpu import config as option
from selfc_tpu.codec.h265 import ffmpeg_available
from selfc_tpu.data import create_dataloader, create_dataset
from selfc_tpu.train.codec_model import CodecModel
from selfc_tpu.utils.logger import save_img, setup_logger, tensor2img
from selfc_tpu.utils.metrics import ms_ssim, psnr, ssim


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument("--no-images", action="store_true")
    args = parser.parse_args()
    jax.config.update("jax_default_matmul_precision", "highest")

    opt = option.parse(args.opt, is_train=False)
    os.makedirs(opt["path"]["results_root"] or ".", exist_ok=True)
    setup_logger("base", opt["path"]["log"], "test_" + opt["name"],
                 level=logging.INFO, screen=True, tofile=True)
    logger = logging.getLogger("base")
    from selfc_tpu.codec.h265 import codec_backend, rate_source

    standin = (opt["val"] or {}).get("standin_codec")
    src = rate_source(standin)
    if src == "x265":
        logger.info("rate source: REAL x265 (backend: %s)", codec_backend())
    elif src == "zlib":
        logger.warning(
            "no x265 backend — using the ZlibCodec stand-in: bpp IS a "
            "measured bitstream rate (codec/standin.py) but is an upper "
            "bound vs x265; numbers are NOT comparable to the golden logs."
        )
    else:
        logger.warning(
            "no x265 backend and val.standin_codec: null — bpp is a "
            "content-independent FORMULA (not a measured rate) and "
            "numbers are NOT comparable to the golden logs."
        )

    test_loaders = []
    for phase, dataset_opt in sorted((opt["datasets"] or {}).items()):
        test_set = create_dataset(dataset_opt)
        loader = create_dataloader(test_set, dataset_opt)
        logger.info("Number of test images in [%s]: %d",
                    dataset_opt["name"], len(test_set))
        test_loaders.append((dataset_opt["name"], loader))

    model = CodecModel(opt)

    all_psnr, all_ssim, all_psnr_lr, all_ssim_lr = [], [], [], []
    all_vd, all_vbpp, all_id, all_ibpp = [], [], [], []
    for name, loader in test_loaders:
        dataset_dir = os.path.join(opt["path"]["results_root"] or ".", name)
        os.makedirs(dataset_dir, exist_ok=True)
        rs = {"psnr": [], "ssim": [], "psnr_lr": [], "ssim_lr": []}
        ms = {"video_distor_loss": [], "video_bpp": [], "mimick_loss": [],
              "img_bpp": []}
        for data in loader:
            model.feed_data(data)
            img_path = str(data["GT_path"][0])
            parts = img_path.split("/")
            img_name = "_".join(parts[-3:])
            model.test()
            vis = model.get_current_visuals()
            met = model.get_current_metrics()
            for k in ms:
                ms[k].append(float(met[k]))
            logger.info(
                "{:20s} - video_distor_loss: {:.6f}; video_bpp: {:.6f} dB; "
                "mimick_loss: {:.6f}; img_bpp: {:.6f} dB. [rate: {}]".format(
                    img_name, met["video_distor_loss"], met["video_bpp"],
                    met["mimick_loss"], met["img_bpp"], model.rate_source,
                )
            )
            sr, gt = vis["SR"], vis["GT"]
            lr, lrgt = vis["LR"], vis["LR_ref"]

            def fl(a):
                return jnp.asarray(a.reshape(-1, *a.shape[2:]))

            rs["psnr"] += np.asarray(psnr(fl(sr), fl(gt))).tolist()
            rs["ssim"] += [float(np.mean(np.asarray(ms_ssim(fl(sr), fl(gt)))))]
            rs["psnr_lr"] += np.asarray(psnr(fl(lr), fl(lrgt))).tolist()
            rs["ssim_lr"] += np.asarray(ssim(fl(lr), fl(lrgt))).tolist()
            if not args.no_images:
                save_img(tensor2img(sr[0, 0]), os.path.join(dataset_dir, img_name + ".jpg"))
                save_img(tensor2img(gt[0, 0]), os.path.join(dataset_dir, img_name + "_GT.jpg"))
                save_img(tensor2img(lr[0, 0]), os.path.join(dataset_dir, img_name + "_LR.jpg"))
                save_img(tensor2img(lrgt[0, 0]), os.path.join(dataset_dir, img_name + "_LR_ref.jpg"))

        ave = {k: (sum(v) / len(v) if v else 0.0) for k, v in rs.items()}
        logger.info(
            "----Average PSNR/SSIM results for {}----\n\tpsnr: {:.6f} db; "
            "ssim: {:.6f}. LR psnr: {:.6f} db; ssim: {:.6f}.\n".format(
                name, ave["psnr"], ave["ssim"], ave["psnr_lr"], ave["ssim_lr"]
            )
        )
        mave = {k: (sum(v) / len(v) if v else 0.0) for k, v in ms.items()}
        logger.info(
            "----Average Compression results for {}----\n\t "
            "ave_video_distor_loss: {:.6f}; ave_video_bpp: {:.6f}dB. "
            "ave_img_distor_loss: {:.6f}; ave_img_bpp: {:.6f}dB. "
            "[rate: {}]\n".format(
                name, mave["video_distor_loss"], mave["video_bpp"],
                mave["mimick_loss"], mave["img_bpp"], model.rate_source,
            )
        )
        all_psnr.append(ave["psnr"])
        all_ssim.append(ave["ssim"])
        all_psnr_lr.append(ave["psnr_lr"])
        all_ssim_lr.append(ave["ssim_lr"])
        all_vd.append(mave["video_distor_loss"])
        all_vbpp.append(mave["video_bpp"])
        all_id.append(mave["mimick_loss"])
        all_ibpp.append(mave["img_bpp"])

    def _a(v):
        return sum(v) / len(v) if v else 0.0

    logger.info(
        "----Average PSNR/SSIM results for All dataset----\n\tpsnr: {:.6f} db; "
        "ssim: {:.6f}. LR psnr: {:.6f} db; ssim: {:.6f}.\n".format(
            _a(all_psnr), _a(all_ssim), _a(all_psnr_lr), _a(all_ssim_lr)
        )
    )
    logger.info(
        "----Average Compression results for All dataset----\n\t "
        "ave_video_distor_loss: {:.6f}; ave_video_bpp: {:.6f}dB. "
        "ave_img_distor_loss: {:.6f}; ave_img_bpp: {:.6f}dB. "
        "[rate: {}]\n".format(
            _a(all_vd), _a(all_vbpp), _a(all_id), _a(all_ibpp),
            model.rate_source,
        )
    )


if __name__ == "__main__":
    main()
