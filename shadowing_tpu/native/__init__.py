"""Native (C) runtime components.

Currently: a parallel ``.npy`` shard loader used by
:class:`shadowing_tpu.data.dataset.TimeSeriesDataset` when the extension is
built (``pip install -e .`` / ``python setup.py build_ext --inplace``).
Importing this package raises ``ImportError`` when the extension is absent;
callers fall back to pure numpy.

The C side (`_npyloader.read_files_parallel`) does the concurrent I/O with
the GIL released; the Python side parses the npy headers with numpy's own
format utilities and wraps the buffers zero-copy.
"""
from __future__ import annotations

import io
from typing import Optional, Sequence

import numpy as np

from shadowing_tpu.native._npyloader import read_files_parallel  # noqa: F401


def _read_header(fobj):
    """(shape, fortran, dtype) of an open .npy stream via numpy's public
    format API (``read_array_header_1_0/2_0`` keyed on the magic version)."""
    version = np.lib.format.read_magic(fobj)
    if version == (1, 0):
        return np.lib.format.read_array_header_1_0(fobj)
    if version == (2, 0):
        return np.lib.format.read_array_header_2_0(fobj)
    raise ValueError(f"unsupported .npy format version {version}")


def _parse_npy(buf: bytearray) -> np.ndarray:
    """Zero-copy ndarray view over a raw .npy file buffer."""
    bio = io.BytesIO(buf)
    shape, fortran, dtype = _read_header(bio)
    offset = bio.tell()
    arr = np.frombuffer(buf, dtype=dtype, offset=offset)
    arr = arr.reshape(shape, order="F" if fortran else "C")
    return arr


def load_npy_batch(
    paths: Sequence[str], R: Optional[int] = None, n_threads: int = 8
) -> list[np.ndarray]:
    """Load .npy shards in parallel until ``R`` rows are available.

    Returns a list of arrays (one per shard read, in input order).
    """
    paths = list(paths)
    if R is not None:
        # size shards cheaply from headers to know how many files we need
        needed, rows = [], 0
        for p in paths:
            with open(p, "rb") as f:
                shape, _, _ = _read_header(f)
            needed.append(p)
            rows += shape[0]
            if rows >= R:
                break
        paths = needed
    bufs = read_files_parallel(paths, n_threads)
    return [_parse_npy(b) for b in bufs]
