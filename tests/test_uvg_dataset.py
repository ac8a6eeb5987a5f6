"""UVG GOP dataset on a synthetic directory tree."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from selfc_tpu.config import dict_to_nonedict
from selfc_tpu.data.uvg_dataset import UVGDataset


def _make_uvg_tree(root, n_seq=2, frames=24, hw=192):
    rng = np.random.default_rng(0)
    names = []
    for s in range(n_seq):
        seq = f"seq{s}"
        d = os.path.join(root, seq)
        os.makedirs(os.path.join(d, "H265L20"), exist_ok=True)
        for i in range(1, frames + 1):
            img = rng.integers(0, 255, (hw, hw, 3), np.uint8)
            cv2.imwrite(os.path.join(d, f"im{i:03d}.png"), img)
        # intra reference frames at GOP starts (im0001/im0013 for gop 12)
        for g in range(frames // 12):
            src = os.path.join(d, f"im{g * 12 + 1:03d}.png")
            dst = os.path.join(d, "H265L20", f"im{g * 12 + 1:04d}.png")
            cv2.imwrite(dst, cv2.imread(src))
        names.append(seq)
    with open(os.path.join(root, "originalv.txt"), "w") as f:
        f.write("\n".join(names))


def test_uvg_dataset_gops(tmp_path):
    _make_uvg_tree(str(tmp_path))
    ds = UVGDataset(dict_to_nonedict({
        "dataroot_GT": str(tmp_path),
        "dataroot_list": str(tmp_path / "originalv.txt"),
        "ref_dir": "H265L20",
        "gop": 12,
        "testfull": True,
    }))
    assert len(ds) == 4  # 2 sequences x 2 GOPs
    item = ds[0]
    assert item["GT"].shape == (11, 192, 192, 3)  # gop-1 inter frames
    assert item["ref"].shape == (192, 192, 3)
    assert item["ref_bpp"] > 0
    # the ref frame here IS the first frame -> perfect metrics
    assert item["ref_psnr"] > 50 or np.isinf(item["ref_psnr"])
    assert item["ref_msssim"] > 0.99


def test_uvg_dataset_requires_bpp_table(tmp_path):
    _make_uvg_tree(str(tmp_path))
    with pytest.raises(ValueError):
        UVGDataset(dict_to_nonedict({
            "dataroot_GT": str(tmp_path),
            "dataroot_list": str(tmp_path / "originalv.txt"),
            "ref_dir": "H265L99",
        }))
