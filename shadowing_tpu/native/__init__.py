"""Native (C) runtime components.

Currently: a parallel ``.npy`` shard loader (``load_npy_batch``) used by
:class:`shadowing_tpu.data.dataset.TimeSeriesDataset` when built. Importing
this package raises ``ImportError`` when the extension is absent; callers
fall back to pure numpy.
"""
from shadowing_tpu.native._npyloader import load_npy_batch  # noqa: F401
