"""Native parallel .npy shard loader (skipped when the extension isn't built)."""
import numpy as np
import pytest

native = pytest.importorskip("shadowing_tpu.native")


def test_parallel_read_matches_numpy(tmp_path, rng):
    parts = [rng.standard_normal((16, 1, 64)).astype(np.float32)
             for _ in range(6)]
    paths = []
    for i, p in enumerate(parts):
        f = tmp_path / f"s{i:03d}.npy"
        np.save(f, p)
        paths.append(str(f))
    arrs = native.load_npy_batch(paths)
    assert len(arrs) == 6
    for a, p in zip(arrs, parts):
        np.testing.assert_array_equal(a, p)


def test_r_limit_stops_reading(tmp_path, rng):
    for i in range(5):
        np.save(tmp_path / f"s{i}.npy", rng.standard_normal((10, 4)))
    paths = sorted(str(p) for p in tmp_path.glob("*.npy"))
    arrs = native.load_npy_batch(paths, R=25)
    assert len(arrs) == 3  # 10 + 10 + 10 >= 25


def test_missing_file_raises(tmp_path):
    with pytest.raises(OSError):
        native.load_npy_batch([str(tmp_path / "nope.npy")])


def test_fortran_order_roundtrip(tmp_path, rng):
    a = np.asfortranarray(rng.standard_normal((8, 8)))
    np.save(tmp_path / "f.npy", a)
    (got,) = native.load_npy_batch([str(tmp_path / "f.npy")])
    np.testing.assert_array_equal(got, a)
