"""Data layer: PriceData conversions, windows, datasets, bundled SPDaily."""
import numpy as np
import pytest

from shadowing_tpu import (
    PriceData,
    SPDaily,
    TimeSeriesDataset,
    batch_npy_files,
    windows,
)


class TestPriceData:
    def test_from_dlnx_anchors_first_price(self, rng):
        dlnx = rng.normal(0, 0.02, size=(4, 100))
        pd_ = PriceData(dlnx=dlnx, x_init=100.0)
        assert pd_.x.shape == (4, 101)
        np.testing.assert_allclose(pd_.x[:, 0], 100.0)
        np.testing.assert_allclose(pd_.dlnx, dlnx, rtol=1e-9)

    def test_lnx_rescaled(self, rng):
        lnx = np.cumsum(rng.normal(0, 0.02, size=(3, 50)), axis=-1) + 5.0
        pd_ = PriceData(lnx=lnx, x_init=100.0)
        np.testing.assert_allclose(pd_.x[:, 0], 100.0)
        np.testing.assert_allclose(np.diff(lnx, axis=-1), pd_.dlnx, rtol=1e-9)

    def test_representations_consistent(self, rng):
        x = np.exp(np.cumsum(rng.normal(0, 0.01, size=80))) * 50
        pd_ = PriceData(x=x)
        np.testing.assert_allclose(pd_.dx, np.diff(x), rtol=1e-9)
        np.testing.assert_allclose(pd_.lnx, np.log(x), rtol=1e-9)
        np.testing.assert_allclose(np.exp(pd_.lnx), pd_.x, rtol=1e-9)

    def test_exactly_one_representation(self):
        with pytest.raises(ValueError):
            PriceData(x=np.ones(5), dlnx=np.zeros(4))
        with pytest.raises(ValueError):
            PriceData()


class TestWindows:
    def test_shape_and_content(self, rng):
        x = rng.normal(size=(2, 3, 50))
        w = windows(x, w=10, s=5)
        assert w.shape == (2, 3, 9, 10)
        np.testing.assert_array_equal(w[..., 0, :], x[..., 0:10])
        np.testing.assert_array_equal(w[..., 1, :], x[..., 5:15])

    def test_offset(self):
        x = np.arange(20)
        w = windows(x, w=4, s=4, offset=2)
        np.testing.assert_array_equal(w[0], [2, 3, 4, 5])

    def test_jax_matches_numpy(self, rng):
        import jax.numpy as jnp

        x = rng.normal(size=(2, 31))
        a = windows(x, w=7, s=3)
        b = np.asarray(windows(jnp.asarray(x), w=7, s=3))
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestDataset:
    def test_shard_roundtrip(self, tmp_path, rng):
        parts = [rng.normal(size=(8, 1, 32)).astype(np.float32) for _ in range(3)]
        for i, p in enumerate(parts):
            np.save(tmp_path / f"shard{i}.npy", p)
        ds = TimeSeriesDataset(tmp_path, R=20).load()
        assert ds.shape == (20, 1, 32)
        np.testing.assert_array_equal(ds[:8], parts[0])

    def test_2d_shards_get_channel_axis(self, tmp_path, rng):
        np.save(tmp_path / "a.npy", rng.normal(size=(4, 16)).astype(np.float32))
        ds = TimeSeriesDataset(tmp_path).load()
        assert ds.shape == (4, 1, 16)

    def test_batching(self, tmp_path, rng):
        src = tmp_path / "src"
        src.mkdir()
        for i in range(5):
            np.save(src / f"t{i:03d}.npy", rng.normal(size=(1, 1, 8)))
        out = batch_npy_files(src, 2, tmp_path / "dst")
        assert [p.name for p in out] == ["batch0001.npy", "batch0002.npy", "batch0003.npy"]
        assert np.load(out[0]).shape == (2, 1, 8)
        assert np.load(out[2]).shape == (1, 1, 8)


class TestSPDaily:
    def test_loads_and_filters(self):
        snp = SPDaily()
        assert snp.dlnx.shape[0] == 1 and snp.dlnx.shape[1] == 1
        assert snp.dlnx.shape[-1] > 5000
        assert len(snp.dts) == snp.dlnx.shape[-1]

        sub = SPDaily(start="03-01-2000", end="31-12-2014")
        assert sub.dts[0].year == 2000
        assert sub.dts[-1].year == 2014
        # day-first parsing: 03-01-2000 is January 3rd
        assert sub.dts[0].month == 1

    def test_realistic_scale(self):
        snp = SPDaily()
        ann_vol = snp.dlnx.std() * np.sqrt(252)
        assert 0.1 < ann_vol < 0.4
