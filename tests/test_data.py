"""Data pipeline tests: multi-scale loader, source loaders, cls augs."""

from pathlib import Path

import numpy as np
import pytest

from tests.test_e2e import make_synthetic_obb_dataset


@pytest.fixture(scope="module")
def obb_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds2")
    return make_synthetic_obb_dataset(root, n_images=8, imgsz=96, nc=3)


def test_multi_scale_loader(obb_data):
    from quan_ultralytics_tpu.data.build import build_dataloader
    from quan_ultralytics_tpu.data.dataset import YOLODataset

    ds = YOLODataset(obb_data, split="train", task="obb")
    sizes = set()
    for _ in range(3):
        for b in build_dataloader(ds, 4, imgsz=128, hyp=None, augment=False,
                                  multi_scale=True, seed=np.random.randint(1 << 30)):
            s = b["img"].shape[1]
            sizes.add(s)
            assert s % 32 == 0 and 64 <= s <= 192
    assert len(sizes) >= 2, f"multi-scale produced only {sizes}"


def test_load_source_dir_and_video(obb_data, tmp_path):
    import cv2
    from quan_ultralytics_tpu.data.loaders import load_source

    img_dir = Path(obb_data).parent / "images" / "val"
    frames = list(load_source(img_dir))
    assert len(frames) == 8 and frames[0].ndim == 3

    # tiny video
    vid = str(tmp_path / "t.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 64))
    for _ in range(4):
        w.write(np.zeros((64, 64, 3), np.uint8))
    w.release()
    if Path(vid).stat().st_size > 0:
        frames = list(load_source(vid))
        assert len(frames) == 4


def test_mixup_and_copypaste():
    from quan_ultralytics_tpu.data.augment import copy_paste, mixup

    rng = np.random.default_rng(0)
    im1 = np.full((64, 64, 3), 100, np.uint8)
    im2 = np.full((64, 64, 3), 200, np.uint8)
    c1 = np.array([[[10, 10], [20, 10], [20, 20], [10, 20]]], np.float32)
    k1 = np.array([0], np.int32)
    im, c, k = mixup(im1, c1, k1, im2, c1.copy(), k1.copy(), rng)
    assert 100 < im.mean() < 200
    assert len(c) == 2 and len(k) == 2

    im, c, k = copy_paste(im1, c1, k1, rng, p=1.0)
    assert len(c) == 2
    # pasted label mirrored about the vertical axis
    np.testing.assert_allclose(sorted(c[1][:, 0]), sorted(64 - c1[0][:, 0]))


def test_copypaste_ioa_occlusion_and_pixels():
    """Reference CopyPaste semantics (augment.py:1634-1733): a flipped
    instance overlapping an existing one with IoA >= 0.30 is NOT pasted;
    pasted pixels come from the flipped image inside the polygon."""
    from quan_ultralytics_tpu.data.augment import bbox_ioa, copy_paste

    rng = np.random.default_rng(0)
    im = np.zeros((64, 64, 3), np.uint8)
    im[:, :32] = 50   # left half dark
    im[:, 32:] = 200  # right half bright
    # instance A at x 4..14 mirrors to x 50..60 (free) -> paste candidate;
    # instance B centered at x=32 mirrors onto itself (IoA 1.0) -> blocked
    cA = np.array([[[4, 10], [14, 10], [14, 20], [4, 20]]], np.float32)
    cB = np.array([[[27, 40], [37, 40], [37, 50], [27, 50]]], np.float32)
    corners = np.concatenate([cA, cB])
    cls = np.array([0, 1], np.int32)
    out, c, k = copy_paste(im, corners, cls, rng, p=1.0)
    assert len(c) == 3 and list(k) == [0, 1, 0]  # only A pasted
    # pasted pixels at the mirror location = flipped image there = dark half
    assert (out[12:18, 52:58] == 50).all()
    # pixels outside pasted polygons untouched
    assert (out[:, 32:50] == 200).all()

    # IoA is intersection over box2 area
    b1 = np.array([[0, 0, 10, 10]], np.float32)
    b2 = np.array([[5, 0, 15, 10], [20, 20, 30, 30]], np.float32)
    ioa = bbox_ioa(b1, b2)
    np.testing.assert_allclose(ioa, [[0.5, 0.0]], atol=1e-5)


def test_photometric_augment_branches():
    """Native Blur/MedianBlur/ToGray/CLAHE equivalents of the reference's
    Albumentations defaults (augment.py:1847-1850)."""
    from quan_ultralytics_tpu.data.augment import photometric_augment

    class ScriptedRng:
        """Deterministic stand-in: random() pops scripted values."""

        def __init__(self, vals):
            self.vals = list(vals)

        def random(self):
            return self.vals.pop(0)

        def integers(self, lo, hi):
            return 2  # kernel 5

        def uniform(self, lo, hi):
            return 2.0

    im = (np.random.default_rng(3).random((32, 32, 3)) * 255).astype(np.uint8)
    # gate passes, all four branches fire
    rng = ScriptedRng([0.0, 0.0, 0.0, 0.0, 0.0])
    out = photometric_augment(im, rng)
    assert out.shape == im.shape and out.dtype == np.uint8
    assert not np.array_equal(out, im)
    # ToGray only -> all channels equal
    rng = ScriptedRng([0.0, 0.5, 0.5, 0.0, 0.5])
    g = photometric_augment(im, rng)
    assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()
    # nothing fires -> identity
    rng = ScriptedRng([0.0, 0.5, 0.5, 0.5, 0.5])
    np.testing.assert_array_equal(photometric_augment(im, rng), im)


def test_cls_autoaugment_and_multiaugment():
    from quan_ultralytics_tpu.classification.data import autoaugment, batches, mixup_batch

    rng = np.random.default_rng(0)
    im = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    out = autoaugment(im, rng)
    assert out.shape == im.shape

    x = (rng.random((10, 32, 32, 3)) * 255).astype(np.uint8)
    y = rng.integers(0, 3, 10).astype(np.int32)
    bs = list(batches(x, y, 5, train=True, num_augments=2, auto_augment=True))
    assert len(bs) == 4  # 20 samples / 5

    b, yb, lam = mixup_batch(bs[0], alpha=0.2, rng=rng)
    assert 0 <= lam <= 1 and yb.shape == bs[0]["label"].shape
