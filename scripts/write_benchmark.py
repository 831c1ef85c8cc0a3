"""Streaming OME-Zarr writer benchmark.

The counterpart of the reference's writer demo
(``scripts/shrimpy_writer_acquire-zarr.py:25-133``): stream a
plate-shaped acquisition through the engine's writer path (tensorstore,
blosc-zstd), zero-pad preset skipped (t, p) indices to simulate
autofocus failure, and report wall-clock write throughput.

Usage: python scripts/write_benchmark.py [--wells 4] [--timepoints 3]
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np

from shrimpy_tpu.io import ngff


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--wells", type=int, default=4)
    parser.add_argument("--timepoints", type=int, default=3)
    parser.add_argument("--shape-zyx", default="64,256,256")
    parser.add_argument("--skip", default="", help="flat t*wells+p indices to zero-pad")
    parser.add_argument("--out", default=None, help="output dir (default: temp)")
    args = parser.parse_args()

    zyx = tuple(int(v) for v in args.shape_zyx.split(","))
    skip = {int(v) for v in args.skip.split(",") if v}
    out_dir = Path(args.out) if args.out else Path(tempfile.mkdtemp())
    store_path = out_dir / "write_bench.zarr"
    if store_path.exists():
        shutil.rmtree(store_path)

    rng = np.random.default_rng(0)
    frame = (rng.random((args.timepoints, *zyx)) * 1000).astype(np.uint16)

    store = ngff.create_hcs(store_path, channel_names=["BF"])
    positions = []
    for p in range(args.wells):
        pos = store.create_position("0", str(p), "000", channel_names=["BF"])
        pos.create_array((args.timepoints, 1, *zyx), dtype="uint16")
        positions.append(pos)

    total_bytes = 0
    t0 = time.monotonic()
    futures = []
    for t in range(args.timepoints):
        for p, pos in enumerate(positions):
            flat = t * args.wells + p
            vol = (
                np.zeros(zyx, np.uint16) if flat in skip else frame[t]
            )
            futures.append(pos.write_async((t, 0), vol))
            total_bytes += vol.nbytes
    for f in futures:
        f.result()
    dt = time.monotonic() - t0

    print(
        json.dumps(
            {
                "volumes": args.timepoints * args.wells,
                "bytes": total_bytes,
                "seconds": round(dt, 3),
                "GiB_per_s": round(total_bytes / dt / 2**30, 3),
                "store": str(store_path),
                "skipped": sorted(skip),
            }
        )
    )


if __name__ == "__main__":
    main()
