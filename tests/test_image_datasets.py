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


def test_lrhr_seg_bg_train(tmp_path):
    # HR tree with /img/ + /bicseg/ seg maps; plus a background pool
    img_d = tmp_path / "ost" / "img" / "water"
    _write_images(img_d, n=2, hw=96)
    seg_d = tmp_path / "ost" / "bicseg" / "water"
    seg_d.mkdir(parents=True)
    for i in range(2):
        seg = np.zeros((8, 96, 96), np.float32)
        seg[4] = 1.0
        np.save(str(seg_d / f"img{i}.npy"), seg)
    _write_images(tmp_path / "bg", n=2, hw=96)

    ds = create_dataset(dict_to_nonedict({
        "mode": "LRHR_seg_bg", "phase": "train",
        "dataroot_GT": str(tmp_path / "ost" / "img"),
        "dataroot_LR": None,
        "dataroot_GT_bg": str(tmp_path / "bg"),
        "scale": 4, "HR_size": 64, "use_flip": True, "use_rot": True,
    }))
    assert len(ds) == 2
    ds.rng.seed(3)
    item = ds[0]
    assert item["HR"].shape == (64, 64, 3)
    assert item["LR"].shape == (16, 16, 3)
    assert item["seg"].shape == (64, 64, 8)
    if "water" in item["HR_path"]:
        assert item["category"] == 4  # 'water' (ref LRHR_seg_bg:114-115)
        assert item["seg"][..., 4].max() == 1.0
    else:  # background draw
        assert item["category"] == 0


def test_lrhr_seg_bg_val_modcrop(tmp_path):
    img_d = tmp_path / "img"
    _write_images(img_d, n=1, hw=67)  # not a multiple of 8 -> modcrop
    ds = create_dataset(dict_to_nonedict({
        "mode": "LRHR_seg_bg", "phase": "val",
        "dataroot_GT": str(img_d), "dataroot_LR": None,
        "dataroot_GT_bg": None, "scale": 4,
    }))
    item = ds[0]
    assert item["HR"].shape == (64, 64, 3)
    assert item["seg"].shape == (64, 64, 8)
    assert item["seg"][..., 0].min() == 1.0  # missing map -> background
    assert item["category"] == -1


def test_lmdb_meta_and_gate(tmp_path):
    import pickle

    from selfc_tpu.data import util as dutil

    with open(tmp_path / "meta_info.pkl", "wb") as f:
        pickle.dump({"keys": ["a", "b"], "resolution": ["3_64_64"]}, f)
    paths, sizes = dutil.get_paths_from_lmdb(str(tmp_path))
    assert paths == ["a", "b"]
    assert sizes == ["3_64_64", "3_64_64"]  # broadcast rule (util.py:39-40)

    try:
        import lmdb  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="data_type 'lmdb'"):
            dutil.open_lmdb(str(tmp_path))


def test_progress_bar(capsys):
    from selfc_tpu.utils.logger import ProgressBar

    pb = ProgressBar(task_num=3)
    for _ in range(3):
        pb.update("step")
    out = capsys.readouterr().out
    assert "3/3" in out
