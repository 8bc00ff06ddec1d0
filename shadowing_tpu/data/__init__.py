"""Data layer: price containers, windows, shard datasets, bundled series."""
from shadowing_tpu.data.dataset import TimeSeriesDataset, batch_npy_files
from shadowing_tpu.data.price_data import PriceData
from shadowing_tpu.data.snp import SPDaily
from shadowing_tpu.data.windows import windows
