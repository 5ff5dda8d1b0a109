"""Data-layer tests: MATLAB bicubic parity vs the reference, datasets, loader, metrics."""

import os
import sys
import types

import numpy as np
import pytest

from hcflow_tpu.data import DataLoader, EnlargedSampler, create_dataset
from hcflow_tpu.data.imresize import imresize, resize_matrix
from hcflow_tpu.utils.metrics import calculate_psnr_ssim, diversity

REF_FACE = "/root/reference/datasets/example_face_8X"


def test_bicubic_matches_reference_torch_impl():
    """imresize must match /root/reference's MATLAB-faithful torch implementation."""
    torch = pytest.importorskip("torch")
    if "/root/reference/codes" not in sys.path:
        for m, stub in (("natsort", {"natsorted": sorted}),):
            if m not in sys.modules:
                mod = types.ModuleType(m)
                [setattr(mod, k, v) for k, v in stub.items()]
                sys.modules[m] = mod
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tvu = types.ModuleType("torchvision.utils")
            tvu.make_grid = lambda *a, **k: None
            tv.utils = tvu
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.utils"] = tvu
        sys.path.insert(0, "/root/reference/codes")
    from data.util import imresize_np

    rng = np.random.default_rng(0)
    img = rng.random((37, 53, 3)).astype(np.float32)
    for scale in (0.25, 0.125, 0.5):
        want = imresize_np(img, scale)  # reference HWC numpy variant
        got = imresize(img, scale)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
    # upscale path too
    up_want = imresize_np(img[:8, :8], 4.0)
    up_got = imresize(img[:8, :8], 4.0)
    np.testing.assert_allclose(up_got, up_want, rtol=1e-4, atol=2e-5)


def test_resize_matrix_rows_sum_to_one():
    m = resize_matrix(40, 10, 0.25)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    m = resize_matrix(10, 40, 4.0)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_gtlq_dataset_and_loader():
    opt = {
        "mode": "GTLQ",
        "phase": "val",
        "scale": 8,
        "dataroot_GT": f"{REF_FACE}/HR",
        "dataroot_LQ": f"{REF_FACE}/LR",
    }
    ds = create_dataset(opt)
    assert len(ds) == 6
    item = ds[0]
    assert item["GT"].shape == (160, 160, 3)
    assert item["LQ"].shape == (20, 20, 3)
    assert item["GT"].dtype == np.float32
    assert 0.0 <= item["GT"].min() and item["GT"].max() <= 1.0

    loader = DataLoader(ds, batch_size=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["GT"].shape == (2, 160, 160, 3)


def test_gt_dataset_generates_lr():
    opt = {
        "mode": "GT",
        "phase": "train",
        "scale": 8,
        "GT_size": 64,
        "use_flip": True,
        "use_rot": True,
        "dataroot_GT": f"{REF_FACE}/HR",
    }
    ds = create_dataset(opt)
    item = ds[1]
    assert item["GT"].shape == (64, 64, 3)
    assert item["LQ"].shape == (8, 8, 3)
    # deterministic per (seed, epoch, index)
    item2 = ds[1]
    np.testing.assert_array_equal(item["GT"], item2["GT"])
    ds.set_epoch(1)
    item3 = ds[1]
    assert not np.array_equal(item["GT"], item3["GT"])


def test_enlarged_sampler_determinism_and_sharding():
    s0 = EnlargedSampler(10, ratio=20, num_replicas=2, rank=0)
    s1 = EnlargedSampler(10, ratio=20, num_replicas=2, rank=1)
    i0a, i0b = s0.indices(3), s0.indices(3)
    np.testing.assert_array_equal(i0a, i0b)
    i1 = s1.indices(3)
    assert len(i0a) == len(i1) == 100
    assert not np.array_equal(i0a, i1)
    assert set(i0a) <= set(range(10))


def test_metrics_sanity():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    noisy = np.clip(img + rng.normal(0, 0.01, img.shape).astype(np.float32), 0, 1)
    psnr, ssim, psnr_y, ssim_y = calculate_psnr_ssim(noisy, img, crop_border=4)
    assert 35 < psnr < 50
    assert 0.8 < ssim <= 1.0
    assert psnr_y > psnr  # Y-channel metrics are typically higher
    p2, s2, _, _ = calculate_psnr_ssim(img, img)
    assert p2 == float("inf") and s2 == pytest.approx(1.0)
    d = diversity([img, noisy])
    assert 0 < d < 5


def test_prepare_pkl_roundtrip(tmp_path):
    """prepare_data pkl output must feed the LRHR_PKL training dataset."""
    from hcflow_tpu.cli.prepare_data import prepare_pkl

    out = prepare_pkl(
        f"{REF_FACE}/HR", str(tmp_path), crops_per_image=2, crop_size=32,
        scales=(4,), subset_frac=0.5,
    )
    assert out["tr.pklv4"] == 12  # 6 images x 2 crops
    ds = create_dataset({
        "mode": "LRHR_PKL", "phase": "train", "scale": 4, "GT_size": 32,
        "use_flip": True,
        "dataroot_GT": str(tmp_path / "tr.pklv4"),
        "dataroot_LQ": str(tmp_path / "tr_X4.pklv4"),
    })
    item = ds[0]
    assert item["GT"].shape == (32, 32, 3)
    assert item["LQ"].shape == (8, 8, 3)
    assert item["GT"].dtype == np.float32 and item["GT"].max() <= 1.0
