"""Data-layer tests: MATLAB bicubic parity vs the reference, datasets, loader, metrics."""

import pytest as _pytest

pytestmark = _pytest.mark.smoke

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


# ------------------------------------------------------------------ LMDB backend
def _mk_lmdb(tmp_path, name, images):
    """images: dict key -> HWC uint8 array (stored flat, BGR per reference)."""
    from hcflow_tpu.data.lmdb_backend import write_lmdb

    root = str(tmp_path / name)
    items = {k: v.tobytes() for k, v in images.items()}
    # write_lmdb sorts keys; keep resolutions aligned with sorted key order
    res = [f"{images[k].shape[2]}_{images[k].shape[0]}_{images[k].shape[1]}"
           for k in sorted(images)]
    write_lmdb(root, items, resolutions=res)
    return root


def test_lmdb_roundtrip_inline_and_overflow(tmp_path):
    """Small values stay inline; >1/4-page values go to overflow pages; both read
    back exactly through the pure-Python format parser."""
    from hcflow_tpu.data.lmdb_backend import PureLmdbReader

    rng = np.random.default_rng(0)
    images = {
        "small": rng.integers(0, 255, (8, 8, 3), dtype=np.uint8),      # 192 B inline
        "big": rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),      # 12 KB overflow
    }
    root = _mk_lmdb(tmp_path, "toy.lmdb", images)
    r = PureLmdbReader(root)
    assert len(r) == 2
    for k, v in images.items():
        got = np.frombuffer(r.get(k.encode()), np.uint8).reshape(v.shape)
        np.testing.assert_array_equal(got, v)
    assert r.get(b"absent") is None
    assert sorted(k.decode() for k, _ in r.items()) == ["big", "small"]
    r.close()


def test_lmdb_multipage_branch_walk(tmp_path):
    """Enough entries to force multiple leaf pages + a branch root; every key
    resolves through the B-tree descent."""
    from hcflow_tpu.data.lmdb_backend import PureLmdbReader

    rng = np.random.default_rng(1)
    images = {
        f"img_{i:04d}": rng.integers(0, 255, (16, 12, 3), dtype=np.uint8)
        for i in range(64)
    }
    root = _mk_lmdb(tmp_path, "many.lmdb", images)
    r = PureLmdbReader(root)
    assert r._db["depth"] == 2  # really exercises branch pages
    assert len(r) == 64
    for k, v in images.items():
        got = np.frombuffer(r.get(k.encode()), np.uint8).reshape(v.shape)
        np.testing.assert_array_equal(got, v)
    keys_in_order = [k for k, _ in r.items()]
    assert keys_in_order == sorted(keys_in_order)
    r.close()


def test_lmdb_crosscheck_real_package(tmp_path):
    """When the real lmdb package exists, our written env must open with it and
    our parser must read envs it writes (format conformance both ways)."""
    lmdb = pytest.importorskip("lmdb")
    from hcflow_tpu.data.lmdb_backend import PureLmdbReader, write_lmdb

    rng = np.random.default_rng(2)
    data = {f"k{i}": rng.integers(0, 255, (32, 32, 3), dtype=np.uint8).tobytes()
            for i in range(8)}
    ours = str(tmp_path / "ours.lmdb")
    write_lmdb(ours, data)
    env = lmdb.open(ours, readonly=True, lock=False)
    with env.begin() as txn:
        for k, v in data.items():
            assert txn.get(k.encode()) == v

    theirs = str(tmp_path / "theirs.lmdb")
    env2 = lmdb.open(theirs, map_size=1 << 24)
    with env2.begin(write=True) as txn:
        for k, v in data.items():
            txn.put(k.encode(), v)
    env2.sync()
    r = PureLmdbReader(theirs)
    for k, v in data.items():
        assert r.get(k.encode()) == v


def test_gtlq_dataset_lmdb_mode(tmp_path):
    """data_type: lmdb routes GT/LQ reads through the LMDB backend and converts
    the reference's flat BGR buffers to RGB float (GTLQ_dataset.py:59-80)."""
    from hcflow_tpu.data.datasets import create_dataset

    rng = np.random.default_rng(3)
    # store BGR the way the reference's create-lmdb scripts do (cv2 buffers)
    hr_rgb = {f"face_{i}": rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
              for i in range(3)}
    lr_rgb = {k: v[::4, ::4] for k, v in hr_rgb.items()}
    gt_root = _mk_lmdb(tmp_path, "gt.lmdb", {k: v[:, :, ::-1] for k, v in hr_rgb.items()})
    lq_root = _mk_lmdb(tmp_path, "lq.lmdb", {k: v[:, :, ::-1] for k, v in lr_rgb.items()})

    ds = create_dataset({
        "mode": "GTLQ", "phase": "val", "data_type": "lmdb", "scale": 4,
        "dataroot_GT": gt_root, "dataroot_LQ": lq_root,
    })
    assert len(ds) == 3
    item = ds[0]
    key0 = sorted(hr_rgb)[0]
    np.testing.assert_allclose(item["GT"], hr_rgb[key0].astype(np.float32) / 255.0)
    np.testing.assert_allclose(item["LQ"], lr_rgb[key0].astype(np.float32) / 255.0)
    assert item["GT_path"] == key0


# ----------------------------------------------------------- multiprocess decode
def test_pool_loader_matches_sync_stream():
    """The fork-pool loader must yield the exact same batch stream as the
    synchronous path (round-robin + in-order reassembly; per-item RNG is
    index-seeded so worker placement cannot alter augmentation)."""
    from hcflow_tpu.data.datasets import create_dataset
    from hcflow_tpu.data.loader import DataLoader

    opt = {
        "mode": "GT", "phase": "train", "scale": 4, "GT_size": 32,
        "use_flip": True, "use_rot": True,
        "dataroot_GT": "/root/reference/datasets/example_face_8X/HR",
    }
    ds = create_dataset(opt)
    sync = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, num_workers=0)
    pool = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, num_workers=3)
    sync.set_epoch(1), pool.set_epoch(1)
    got_s = list(sync)
    got_p = list(pool)
    assert len(got_s) == len(got_p) == 3
    for bs, bp in zip(got_s, got_p):
        np.testing.assert_array_equal(bs["GT"], bp["GT"])
        np.testing.assert_array_equal(bs["LQ"], bp["LQ"])
        assert bs["GT_path"] == bp["GT_path"]


def test_pool_loader_early_close_cleans_up():
    """Closing the iterator mid-epoch terminates the worker processes."""
    import multiprocessing as mp

    from hcflow_tpu.data.datasets import create_dataset
    from hcflow_tpu.data.loader import DataLoader

    ds = create_dataset({
        "mode": "GT", "phase": "train", "scale": 4, "GT_size": 32,
        "dataroot_GT": "/root/reference/datasets/example_face_8X/HR",
    })
    dl = DataLoader(ds, batch_size=1, num_workers=2)
    it = iter(dl)
    next(it)
    it.close()
    assert len(mp.active_children()) == 0


def test_pool_loader_cleans_up_under_foreign_sigterm_handler():
    """Workers forked while a flag-setting SIGTERM handler is installed (e.g.
    the train CLI's preemption hook ran earlier in this process) must still die
    on close: they reset SIGTERM to SIG_DFL post-fork, and the parent escalates
    to kill() if terminate() has no effect.  Regression: a leaked worker here
    hangs interpreter exit in multiprocessing's atexit join."""
    import multiprocessing as mp
    import signal

    from hcflow_tpu.data.datasets import create_dataset
    from hcflow_tpu.data.loader import DataLoader

    prev = signal.getsignal(signal.SIGTERM)
    signal.signal(signal.SIGTERM, lambda s, f: None)
    try:
        ds = create_dataset({
            "mode": "GT", "phase": "train", "scale": 4, "GT_size": 32,
            "dataroot_GT": "/root/reference/datasets/example_face_8X/HR",
        })
        dl = DataLoader(ds, batch_size=1, num_workers=2)
        it = iter(dl)
        next(it)
        it.close()
        assert len(mp.active_children()) == 0
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_channel_convert_color_option_parity():
    """``color:`` dataset option (reference GT_dataset.py:100-103 via
    codes/data/util.py:171-182): y/gray produce 1-channel outputs matching the
    reference's BGR-side conversions on the same image."""
    import sys

    import numpy as np

    from hcflow_tpu.data import create_dataset
    from hcflow_tpu.data.util import channel_convert

    root = "/root/reference/datasets/example_face_8X/HR"
    for color in ("y", "gray"):
        ds = create_dataset({"mode": "GT", "phase": "val", "scale": 4, "n_max": 1,
                             "color": color, "dataroot_GT": root})
        item = ds[0]
        assert item["GT"].shape[2] == 1 and item["LQ"].shape[2] == 1
        assert item["GT"].dtype == np.float32

    # parity vs the reference implementation (ours is RGB-side, theirs BGR-side)
    ref = "/root/reference/codes"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    from data.util import channel_convert as ref_channel_convert

    rng = np.random.default_rng(0)
    rgb = rng.random((16, 16, 3)).astype(np.float32)
    bgr = rgb[:, :, ::-1].copy()
    for color in ("y", "gray"):
        ours = channel_convert(3, color, [rgb.copy()])[0]
        # fresh copy per call: the reference's bgr2ycbcr mutates its input
        # in place (codes/data/util.py:219 ``img *= 255.``)
        theirs = ref_channel_convert(3, color, [bgr.copy()])[0]
        np.testing.assert_allclose(np.squeeze(ours), np.squeeze(theirs), atol=2e-5)
    # gray -> RGB replication path
    g = rng.random((8, 8, 1)).astype(np.float32)
    up = channel_convert(1, "RGB", [g])[0]
    assert up.shape == (8, 8, 3)
    np.testing.assert_allclose(up, ref_channel_convert(1, "RGB", [g[..., 0]])[0],
                               atol=1e-6)
