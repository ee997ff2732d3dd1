"""Native (C++) runtime components: batch loader and mmap store.

The native library is optional at runtime (pure-numpy fallbacks exist); these
tests build it with g++ and verify exact agreement with the Python paths.
Reference parity: the loader replaces the torch DataLoader worker pipeline
feeding ``tasks/radnerfs/dataset_utils.py:169-206``; the store mirrors
``utils/commons/indexed_datasets.py:27-98`` record access.
"""

import os
import pickle

import numpy as np
import pytest

from geneface_tpu import native
from geneface_tpu.utils.indexed_dataset import (
    IndexedDataset,
    IndexedDatasetBuilder,
)


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("g++ / native build unavailable")
    return lib


def test_loader_gather_matches_numpy(lib):
    rng = np.random.RandomState(0)
    T, H, W = 3, 32, 48
    HW = H * W
    gt = rng.randint(0, 256, (T, HW, 3), dtype=np.uint8)
    torso = rng.randint(0, 256, (T, HW, 4), dtype=np.uint8)
    bg = rng.randint(0, 256, (HW, 3), dtype=np.uint8)
    L = native.NativeBatchLoader(gt, torso, bg, n_threads=2)
    try:
        inds = rng.randint(0, HW, 257).astype(np.int32)
        g, b, bt = L.gather(1, inds)
        np.testing.assert_array_equal(g, gt[1][inds])
        np.testing.assert_array_equal(b, bg[inds])
        # straight-alpha composite vs float reference, round-to-nearest
        a = torso[1][inds, 3:4].astype(np.float64) / 255.0
        ref = torso[1][inds, :3] * a + bg[inds] * (1.0 - a)
        assert np.abs(ref - bt.astype(np.float64)).max() <= 0.5 + 1e-6
    finally:
        L.close()


def test_loader_fifo_and_rect(lib):
    rng = np.random.RandomState(1)
    T, H, W = 4, 16, 16
    HW = H * W
    gt = rng.randint(0, 256, (T, HW, 3), dtype=np.uint8)
    torso = rng.randint(0, 256, (T, HW, 3), dtype=np.uint8)  # no alpha
    bg = rng.randint(0, 256, (HW, 3), dtype=np.uint8)
    L = native.NativeBatchLoader(gt, torso, bg, n_threads=3)
    try:
        for f in range(T):
            L.submit(f, 64, seed=100 + f)
        for f in range(T):
            inds, g, b, bt = L.wait()
            # FIFO: results must match the f-th submitted frame
            np.testing.assert_array_equal(g, gt[f][inds])
            np.testing.assert_array_equal(bt, torso[f][inds])  # 3ch passthrough
            assert inds.min() >= 0 and inds.max() < HW
        # same seed -> same indices (deterministic sampling)
        L.submit(0, 64, seed=7)
        L.submit(0, 64, seed=7)
        i1 = L.wait()[0]
        i2 = L.wait()[0]
        np.testing.assert_array_equal(i1, i2)
        # rect mode emits the row-major grid
        L.submit(2, 0, seed=0, rect=(3, 5, 2, 4), W=W)
        inds, *_ = L.wait()
        exp = np.array([x * W + y for x in range(3, 5) for y in range(5, 9)],
                       np.int32)
        np.testing.assert_array_equal(inds, exp)
    finally:
        L.close()


def test_native_store_roundtrip(lib, tmp_path):
    path = os.path.join(tmp_path, "store")
    builder = IndexedDatasetBuilder(path, header_size=8192)
    items = [{"i": i, "x": np.arange(i * 3 + 1, dtype=np.float32)} for i in range(25)]
    for it in items:
        builder.add_item(it)
    builder.finalize()

    ds = IndexedDataset(path)
    st = native.NativeStore([f"{path}.data"], [0])
    try:
        for i in (0, 1, 13, 24):
            st.prefetch(ds.offsets[i], ds.offsets[i + 1] - ds.offsets[i])
            raw = st.read(ds.offsets[i], ds.offsets[i + 1] - ds.offsets[i])
            got = pickle.loads(raw)
            assert got["i"] == items[i]["i"]
            np.testing.assert_array_equal(got["x"], items[i]["x"])
        with pytest.raises(IOError):
            st.read(ds.offsets[-1] + 10**9, 4)
    finally:
        st.close()


def test_indexed_dataset_uses_native_backend(lib, tmp_path):
    """IndexedDataset transparently reads through the native store."""
    path = os.path.join(tmp_path, "store2")
    builder = IndexedDatasetBuilder(path, header_size=8192)
    for i in range(10):
        builder.add_item([i, "abc" * i])
    builder.finalize()
    ds = IndexedDataset(path)
    if ds.native is None:
        pytest.skip("native backend not wired")
    for i in range(10):
        assert ds[i] == [i, "abc" * i]


def test_radnerf_dataset_native_parity(lib, tmp_path):
    """Native batch path agrees with the numpy path to <=1 quantization LSB."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.make_synthetic_dataset import make_dataset

    from geneface_tpu.config import Config
    from geneface_tpu.data.radnerf_dataset import RADNeRFDataset

    make_dataset(str(tmp_path), n_frames=3, hw=32)
    base = dict(
        data_dir=str(tmp_path), cond_type="idexp_lm3d_normalized",
        cond_win_size=1, smo_win_size=5, n_rays=128, seed=3,
    )
    ds_nat = RADNeRFDataset("train", str(tmp_path), Config(**base), training=True)
    ds_py = RADNeRFDataset(
        "train", str(tmp_path), Config(**base, native_loader=False), training=True
    )
    assert ds_nat.native_loader is not None
    assert ds_py.native_loader is None
    # same seed -> same sampled indices; pixels agree to 1 LSB (fixed-point
    # composite vs float round)
    a, b = ds_nat[1], ds_py[1]
    np.testing.assert_array_equal(a["inds"], b["inds"])
    for k in ("gt_img_u8", "bg_img_u8", "bg_torso_img_u8"):
        diff = np.abs(a[k].astype(np.int16) - b[k].astype(np.int16)).max()
        assert diff <= 1, (k, diff)
    # prefetching iterator yields the same stream as the synchronous one
    # (fresh datasets: the draws above advanced ds_nat's RNG)
    ds_nat = RADNeRFDataset("train", str(tmp_path), Config(**base), training=True)
    it_pre = ds_nat.iter_epochs(prefetch=True)
    got = [next(it_pre) for _ in range(4)]
    ds_nat2 = RADNeRFDataset("train", str(tmp_path), Config(**base), training=True)
    it_sync = ds_nat2.iter_epochs(prefetch=False)
    want = [next(it_sync) for _ in range(4)]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["inds"], w["inds"])
        np.testing.assert_array_equal(g["gt_img_u8"], w["gt_img_u8"])
