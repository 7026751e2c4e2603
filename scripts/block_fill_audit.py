#!/usr/bin/env python
"""Host-only audit of block-tile HBM fill vs tile size for the 3D patterns.

The config-4 backlog question (SURVEY.md round-2 list): the P2 block-32
fill at RCM is 2.55 GB at 761k dofs / 6.9 GB at 2M — would b=8/b=16 tiles
ride in HBM cheaper?  Tile bytes scale as nb*m(b)*b^2: halving b halves
the per-slot area 4x but raises the neighbor-block count m, so the answer
is empirical per pattern.  This builds ONLY dofmaps + patterns (no device
work, no element tables) and prints per-pattern tile bytes at each b.

    python scripts/block_fill_audit.py -l 3 --blocks 8 16 32
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FENAPACK_PLATFORM", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", "--level", type=int, default=3)
    ap.add_argument("--length", type=float, default=3.0)
    ap.add_argument("--blocks", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--dtype-bytes", type=int, default=4,
                    help="tile element size (4 = f32 production path)")
    args = ap.parse_args()

    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup()
    from fenapack_tpu.fem import mesh3d
    from fenapack_tpu.fem.dofmap import TaylorHood
    from fenapack_tpu.ops.sparse import pattern_from_dofmaps

    t0 = time.time()
    mesh = mesh3d.backward_step_mesh3d(args.level, length=args.length)
    W = TaylorHood(mesh, reorder=True)
    cd2 = W.V.cell_dofs.astype(np.int32)
    cd1 = W.Q.cell_dofs.astype(np.int32)
    n2, n1 = W.V.dim, W.Q.dim
    d = mesh.vertices.shape[1]
    print(f"level {args.level}: {mesh.cells.shape[0]} cells, "
          f"n2={n2} n1={n1} total={d * n2 + n1} dofs "
          f"(setup {time.time() - t0:.1f} s)", flush=True)

    pats = (("P2xP2", cd2, cd2, n2, n2),
            ("P1xP1", cd1, cd1, n1, n1),
            ("div  ", cd1, cd2, n1, n2),
            ("divT ", cd2, cd1, n2, n1))
    for b in args.blocks:
        total = 0.0
        print(f"--- block {b}")
        for name, cr, cc, nr, ncol in pats:
            t1 = time.time()
            pat = pattern_from_dofmaps(cr, cc, nr, ncol, block=b)
            nb, m = pat.nb, pat.m
            bytes_ = nb * m * b * b * args.dtype_bytes
            total += bytes_
            print(f"  {name}  nb={nb:7d} m={m:4d} fill={pat.fill_ratio:6.1f}"
                  f"  tiles {bytes_ / 1e9:7.3f} GB  ({time.time()-t1:.1f} s)",
                  flush=True)
        print(f"  TOTAL one operator set: {total / 1e9:.3f} GB", flush=True)


if __name__ == "__main__":
    main()
