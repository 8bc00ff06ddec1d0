"""Regroup per-task generation files into large shards for fast loading.

Rebuild of ``/root/reference/scripts/batch_generations.py`` on top of
:func:`shadowing_tpu.data.dataset.batch_npy_files` (same ``batch%04d.npy``
naming, 256 trajectories per shard by default).
"""
from __future__ import annotations

import argparse
from pathlib import Path

from shadowing_tpu.data.dataset import batch_npy_files


def main():
    root = Path(__file__).parents[2] / "_cache"
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, default=root / "snp_generation")
    parser.add_argument("--output", type=Path,
                        default=root / "snp_generation_batched")
    parser.add_argument("--batch-size", type=int, default=256)
    args = parser.parse_args()

    written = batch_npy_files(args.input, args.batch_size, args.output)
    print(f"wrote {len(written)} shards under {args.output}")
    print("FINISHED")


if __name__ == "__main__":
    main()
