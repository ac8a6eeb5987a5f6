"""Packed (decode-free mmap) dataset: bit-exact vs the PNG path.

The packed format (selfc_tpu/data/packed.py) is the TPU-rate replacement
for per-read PNG decode — the reference's lmdb branch redesigned as a flat
uint8 mmap. These tests pin that packing and reading reproduce the PNG
pipeline exactly (same temporal rules, same shared-per-clip augmentation,
identical pixels), and that the dataset rides the process loader.
"""

from __future__ import annotations

import numpy as np
import pytest

from selfc_tpu.config import dict_to_nonedict


def _make_vids(root, n_vids=3, n_frames=8, hw=56):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    names = []
    for v in range(n_vids):
        d = root / f"vid{v:03d}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(1, n_frames + 1):
            img = rng.integers(0, 255, (hw, hw, 3), np.uint8)
            cv2.imwrite(str(d / f"im{i}.png"), img)
        names.append(f"vid{v:03d}")
    (root / "list.txt").write_text("\n".join(names))


def _pack(src, dst):
    from selfc_tpu.data.packed import pack_lqgtvid

    return pack_lqgtvid(str(src), str(src / "list.txt"), str(dst))


def _opt(root, phase="train", **kw):
    base = {
        "phase": phase, "dataroot_GT": str(root),
        "dataroot_list": str(root / "list.txt"),
        "video_len": 5, "GT_size": 32, "use_flip": True, "use_rot": True,
        "color": "RGB", "scale": 4,
    }
    base.update(kw)
    return dict_to_nonedict(base)


def test_pack_roundtrips_pixels(tmp_path):
    src, dst = tmp_path / "png", tmp_path / "packed"
    _make_vids(src)
    index = _pack(src, dst)
    assert len(index["clips"]) == 3
    assert index["total_bytes"] == 3 * 8 * 56 * 56 * 3

    from selfc_tpu.data import util
    from selfc_tpu.data.packed import LQGTVIDPackedDataset

    ds = LQGTVIDPackedDataset(_opt(dst, phase="val"))
    png = util.read_img(str(src / "vid001" / "im3.png"))  # BGR [0,1]
    packed = ds._frame_u8((1, 2)).astype(np.float32) / 255.0  # RGB
    np.testing.assert_array_equal(packed, util.bgr2rgb(png))


def test_train_items_match_png_dataset_exactly(tmp_path):
    src, dst = tmp_path / "png", tmp_path / "packed"
    _make_vids(src)
    _pack(src, dst)

    from selfc_tpu.data.datasets import LQGTVIDDataset
    from selfc_tpu.data.packed import LQGTVIDPackedDataset

    ds_png = LQGTVIDDataset(_opt(src))
    ds_pk = LQGTVIDPackedDataset(_opt(dst))
    assert len(ds_png) == len(ds_pk)
    for idx in range(len(ds_png)):
        for seed in (0, 1):
            ds_png.rng.seed(seed)
            ds_pk.rng.seed(seed)
            a, b = ds_png[idx], ds_pk[idx]
            np.testing.assert_array_equal(a["GT"], b["GT"])
            assert a["GT"].dtype == b["GT"].dtype == np.float32


def test_eval_and_multiscale_match(tmp_path):
    src, dst = tmp_path / "png", tmp_path / "packed"
    _make_vids(src, n_vids=1)
    _pack(src, dst)

    from selfc_tpu.data.datasets import LQGTVIDDataset
    from selfc_tpu.data.packed import LQGTVIDPackedDataset

    for ms in (None, True):
        a = LQGTVIDDataset(_opt(src, phase="val", use_multi_scale=ms))[0]
        b = LQGTVIDPackedDataset(_opt(dst, phase="val", use_multi_scale=ms))[0]
        np.testing.assert_allclose(a["GT"], b["GT"], atol=1e-7)


def test_uint8_mode_same_pixels_and_device_cast(tmp_path):
    src, dst = tmp_path / "png", tmp_path / "packed"
    _make_vids(src, n_vids=2)
    _pack(src, dst)

    from selfc_tpu.data.packed import LQGTVIDPackedDataset

    ds_f = LQGTVIDPackedDataset(_opt(dst))
    ds_u = LQGTVIDPackedDataset(_opt(dst, output_uint8=True))
    for seed in (0, 3):
        ds_f.rng.seed(seed)
        ds_u.rng.seed(seed)
        a, b = ds_f[0], ds_u[0]
        assert b["GT"].dtype == np.uint8
        np.testing.assert_array_equal(a["GT"],
                                      b["GT"].astype(np.float32) / 255.0)

    # feed_data's on-device cast gives the same float batch
    import jax

    from selfc_tpu.parallel.mesh import make_mesh, put_frames, replicated

    mesh = make_mesh()
    ds_u.rng.seed(0)
    u8 = np.stack([ds_u[0]["GT"], ds_u[1]["GT"]])
    dev = put_frames(u8, replicated(mesh))
    assert dev.dtype == jax.numpy.float32
    # XLA's constant-divide is multiply-by-reciprocal: 1 ulp (2^-24)
    np.testing.assert_allclose(np.asarray(dev),
                               u8.astype(np.float32) / 255.0,
                               rtol=0, atol=2.0 ** -24)

    # uint8 train mode refuses clips smaller than GT_size
    with pytest.raises(ValueError):
        LQGTVIDPackedDataset(_opt(dst, output_uint8=True, GT_size=512))


def test_registered_and_rides_process_loader(tmp_path):
    src, dst = tmp_path / "png", tmp_path / "packed"
    _make_vids(src)
    _pack(src, dst)

    from selfc_tpu.data.loader import create_dataloader, create_dataset

    ds = create_dataset(_opt(dst, mode="LQGTVID_packed", batch_size=2,
                             n_workers=1, use_shuffle=True,
                             use_process_loader=True, gpu_ids=[0]))
    loader = create_dataloader(ds, ds.opt, {"world_size": 1}, None)
    batch = next(iter(loader))
    assert batch["GT"].shape == (2, 5, 32, 32, 3)
    assert batch["GT"].dtype == np.float32


def test_epoch_ratio_inflates_epoch(tmp_path):
    """datasets.train.epoch_ratio virtually repeats the dataset (the
    reference dataset_ratio=200 idea, train.py:171-182) so the loader's
    per-epoch producer restart is rare; items index modulo the real
    length and still sample fresh augmentations."""
    src, dst = tmp_path / "png", tmp_path / "packed"
    _make_vids(src)
    _pack(src, dst)
    from selfc_tpu.data.loader import create_dataset

    base = create_dataset(_opt(dst, mode="LQGTVID_packed"))
    ds = create_dataset(_opt(dst, mode="LQGTVID_packed", epoch_ratio=10))
    assert len(ds) == 10 * len(base)
    a = ds[0]["GT"]
    b = ds[len(base) * 3]["GT"]  # same underlying clip, later "epoch"
    assert a.shape == b.shape
    # val phase ignores the ratio
    val = create_dataset(_opt(dst, mode="LQGTVID_packed", phase="val",
                              epoch_ratio=10))
    assert len(val) == len(base)
