#!/usr/bin/env python
"""Sweep solver configs for the headline bench in ONE process (the first
device->host fetch pays a 30-500s tunnel warmup; per-process sweeps would
pay it per point)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def run(tag, over_str, recycle="16"):
    os.environ["BENCH_OVER"] = over_str
    os.environ["BENCH_RECYCLE"] = recycle
    nl = bench.build(2, "BRM2", ls="iterative", block_size=32)
    _, _, _, step = bench.picard_ir(nl, max_steps=2)   # warmup/compile
    t0 = time.perf_counter()
    w, iters, res, _ = bench.picard_ir(nl, step=step)
    wall = time.perf_counter() - t0
    total = sum(iters)
    print(json.dumps({"tag": tag, "over": over_str, "recycle": recycle,
                      "wall_s": round(wall, 3), "total_iters": total,
                      "vs_baseline": round(271 / max(total, 1), 4),
                      "iters": iters}), flush=True)


if __name__ == "__main__":
    for tag, over, rec in [
        ("baseline", "", "16"),
        ("vcyc3", "velocity.cycles=3", "16"),
        ("vsmooth4", "velocity.smooth_iters=4", "16"),
        ("apcyc2", "pcd.ap.cycles=2", "16"),
        ("rec24", "", "24"),
        ("rec32", "", "32"),
        ("vcyc3+rec24", "velocity.cycles=3", "24"),
    ]:
        try:
            run(tag, over, rec)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": str(e)}), flush=True)
