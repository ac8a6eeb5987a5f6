"""Legacy single-image dataset coverage."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from selfc_tpu.config import dict_to_nonedict
from selfc_tpu.data import create_dataset


def _write_images(d, n=3, hw=64):
    rng = np.random.default_rng(0)
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        cv2.imwrite(str(d / f"img{i}.png"),
                    rng.integers(0, 255, (hw, hw, 3), np.uint8))


def test_lqgt_train_with_onthefly_lq(tmp_path):
    _write_images(tmp_path / "gt")
    ds = create_dataset(dict_to_nonedict({
        "mode": "LQGT", "phase": "train", "dataroot_GT": str(tmp_path / "gt"),
        "dataroot_LQ": None, "scale": 4, "GT_size": 32, "use_flip": True,
        "use_rot": True,
    }))
    item = ds[0]
    assert item["GT"].shape == (32, 32, 3)
    assert item["LQ"].shape == (8, 8, 3)
    assert item["GT"].dtype == np.float32


def test_lqgt_eval_paired(tmp_path):
    _write_images(tmp_path / "gt", hw=64)
    _write_images(tmp_path / "lq", hw=16)
    ds = create_dataset(dict_to_nonedict({
        "mode": "LQGT", "phase": "val", "dataroot_GT": str(tmp_path / "gt"),
        "dataroot_LQ": str(tmp_path / "lq"), "scale": 4,
    }))
    item = ds[1]
    assert item["GT"].shape == (64, 64, 3)
    assert item["LQ"].shape == (16, 16, 3)


def test_lq_only(tmp_path):
    _write_images(tmp_path / "lq", hw=24)
    ds = create_dataset(dict_to_nonedict({
        "mode": "LQ", "phase": "test", "dataroot_LQ": str(tmp_path / "lq"),
    }))
    assert len(ds) == 3
    assert ds[0]["LQ"].shape == (24, 24, 3)


def test_progress_bar(capsys):
    from selfc_tpu.utils.logger import ProgressBar

    pb = ProgressBar(task_num=3)
    for _ in range(3):
        pb.update("step")
    out = capsys.readouterr().out
    assert "3/3" in out
