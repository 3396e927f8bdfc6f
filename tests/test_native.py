"""Native gather engine: correctness vs numpy, fallback behavior."""

import numpy as np
import pytest

from ugaitnet_tpu.data.native import gather_rows, native_available


def test_gather_matches_numpy():
    rng = np.random.RandomState(0)
    src = rng.randint(-3000, 3000, (200, 50, 60, 60)).astype(np.int16)
    idx = rng.randint(0, 200, 64).astype(np.int64)
    out = gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_uint8_and_memmap(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 255, (100, 25, 60, 60)).astype(np.uint8)
    path = tmp_path / "vols.npy"
    np.save(path, arr)
    mm = np.load(path, mmap_mode="r")
    idx = rng.randint(0, 100, 32).astype(np.int64)
    out = gather_rows(mm, idx)
    np.testing.assert_array_equal(out, arr[idx])


def test_gather_repeated_and_empty():
    src = np.arange(10 * 4, dtype=np.int16).reshape(10, 4)
    out = gather_rows(src, np.array([3, 3, 3], dtype=np.int64))
    np.testing.assert_array_equal(out, src[[3, 3, 3]])
    out = gather_rows(src, np.array([], dtype=np.int64))
    assert out.shape == (0, 4)


def test_fallback_without_native(monkeypatch):
    import ugaitnet_tpu.data.native as native
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    src = np.arange(20, dtype=np.float32).reshape(5, 4)
    out = native.gather_rows(src, np.array([4, 0], dtype=np.int64))
    np.testing.assert_array_equal(out, src[[4, 0]])


def test_native_gather_bounds_checked():
    """Regression: the native path used to memcpy out-of-bounds where the
    numpy fallback raised; it must now reject bad indices up front."""
    import pytest

    from ugaitnet_tpu.data.native import gather_rows, native_available
    if not native_available():
        pytest.skip("native lib unavailable")
    src = np.arange(20, dtype=np.int16).reshape(5, 4)
    for bad in ([5], [-1]):
        with pytest.raises(IndexError):
            gather_rows(src, np.asarray(bad, np.int64))
    np.testing.assert_array_equal(
        gather_rows(src, np.asarray([4, 0], np.int64)), src[[4, 0]])


def test_gather_rejects_negative_idx_on_both_paths(monkeypatch):
    """Negative indices would silently WRAP in np.take but OOB-error in the
    native memcpy — both paths must refuse them identically so a run's
    results never depend on whether the host built the native lib."""
    import ugaitnet_tpu.data.native as native
    src = np.arange(20, dtype=np.float32).reshape(5, 4)
    with pytest.raises(IndexError, match="negative"):
        gather_rows(src, np.asarray([-1], np.int64))
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    with pytest.raises(IndexError, match="negative"):
        native.gather_rows(src, np.asarray([-1], np.int64))


def test_gather_validates_out_buffer():
    """A caller-supplied out of the wrong shape/dtype must raise — the
    native path memcpys into it blindly (heap overrun, not an error)."""
    src = np.arange(20, dtype=np.int16).reshape(5, 4)
    idx = np.asarray([0, 1, 2], np.int64)
    with pytest.raises(ValueError, match="out has"):
        gather_rows(src, idx, out=np.empty((2, 4), np.int16))
    with pytest.raises(ValueError, match="out has"):
        gather_rows(src, idx, out=np.empty((3, 4), np.int8))
    ok = np.empty((3, 4), np.int16)
    np.testing.assert_array_equal(gather_rows(src, idx, out=ok), src[idx])
