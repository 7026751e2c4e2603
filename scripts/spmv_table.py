#!/usr/bin/env python
"""SpMV layout table on hardware (VERDICT round-1 item 3).

Measures the scalar P2 velocity-block SpMV — the unit every hot loop is
built from (d applies per system matvec, smoother sweeps, GMG levels;
reference equivalent: PETSc MatMult, SURVEY.md §2.2 #1) — across storage
layouts and scales, reporting µs/apply, effective GB/s, and % of the HBM
roofline.  Values are synthetic (SpMV cost is values-independent); the
pattern/RCM layout is the production one (TaylorHood(reorder=True)).

Variants per scale:
  gather       ELL + XLA gather (the non-block fallback path)
  xla_bN       BlockELL b=N, XLA batched-GEMV einsum
  pallas_bN    PallasBSRSpMV b=N (scratch variant, rows_per_step=8)
  df32_bN      DF32BlockSpMV b=N (compensated hi-precision path;
               bytes = 3 f32 planes)

    python scripts/spmv_table.py --cases 2d-l2,2d-l3,3d-l2,3d-l3 \
        --blocks 8 32 [--md doc/spmv_table.md]

Skips any variant whose tile bytes exceed --max-gb (HBM guard).  The
roofline BW defaults to 819 GB/s (v5e); override with SPMV_BW_GBS.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_chain(jfn, args_, n, reps=3):
    import jax
    jax.block_until_ready(jfn(*args_))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*args_))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="2d-l2,2d-l3,3d-l2,3d-l3")
    ap.add_argument("--blocks", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--max-gb", type=float, default=8.0)
    ap.add_argument("--length", type=float, default=3.0)
    ap.add_argument("--md", default=None,
                    help="also write a markdown table to this path")
    args = ap.parse_args()

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup()
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh as meshmod, mesh3d
    from fenapack_tpu.fem.dofmap import TaylorHood
    from fenapack_tpu.ops.sparse import pattern_from_dofmaps
    from fenapack_tpu.ops.pallas_spmv import PallasBSRSpMV, DF32BlockSpMV
    from fenapack_tpu.runtime import lift_jit

    bw = float(os.environ.get("SPMV_BW_GBS", "819")) * 1e9
    backend = jax.default_backend()
    print(f"backend: {backend}  roofline {bw/1e9:.0f} GB/s", flush=True)
    rng = np.random.default_rng(0)
    rows = []

    def measure(tag, case, n2, nnz, jfn, call_args, bytes_per_apply):
        # one variant failing to compile must not lose the rest of the
        # table (2026-08-19: pallas_b8 SMEM overflow killed the 3d rows)
        try:
            us = time_chain(jfn, call_args, args.chain) * 1e6
        except Exception as e:                          # noqa: BLE001
            row = {"case": case, "variant": tag, "error": str(e)[:200]}
            rows.append(row)
            print(json.dumps(row), flush=True)
            return
        gbs = bytes_per_apply / (us * 1e-6) / 1e9
        row = {"case": case, "variant": tag, "n_rows": n2, "nnz": int(nnz),
               "us_per_apply": round(us, 1), "gb_per_apply":
               round(bytes_per_apply / 1e9, 4), "gbs": round(gbs, 1),
               "pct_roofline": round(100 * gbs * 1e9 / bw, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    for case in args.cases.split(","):
        dim, lev = case.split("-")
        level = int(lev[1:])
        t0 = time.time()
        if dim == "3d":
            mesh = mesh3d.backward_step_mesh3d(level, length=args.length)
        else:
            mesh = meshmod.backward_step_mesh(level)
        W = TaylorHood(mesh, reorder=True)
        cd = np.asarray(W.V.cell_dofs)
        n2 = W.V.dim
        x32 = jnp.asarray(rng.standard_normal(n2).astype(np.float32))
        x64 = x32.astype(jnp.float64)

        # ---- gather ELL --------------------------------------------- #
        pat = pattern_from_dofmaps(cd, cd, n2, n2)
        nnz = pat.nnz
        vals = jnp.asarray(
            rng.standard_normal(pat.value_shape).astype(np.float32))
        print(f"{case}: n2={n2} nnz={nnz} K={pat.value_shape[1]} "
              f"setup {time.time()-t0:.0f}s", flush=True)

        def chain_of(apply_fn):
            def chain(vals, x):
                def body(v, _):
                    y = apply_fn(vals, v)
                    return y / (jnp.linalg.norm(y) + 1e-30), None
                return jax.lax.scan(body, x, None, length=args.chain)[0]
            return chain

        # vals + cols stream per row; x is gathered (count once) + y
        g_bytes = 2 * vals.nbytes + 2 * n2 * 4
        jfn = lift_jit(chain_of(lambda v, x: pat.matrix(v).mv(x)), [pat])
        measure("gather", case, n2, nnz, jfn, (vals, x32), g_bytes)

        # ---- block layouts ------------------------------------------ #
        for b in args.blocks:
            bpat = pattern_from_dofmaps(cd, cd, n2, n2, block=b)
            nb, _, mb = bpat.value_shape
            tile_gb = nb * b * mb * 4 / 1e9
            print(f"{case} b={b}: nb={nb} m={mb//b} "
                  f"fill={bpat.fill_ratio:.1f} tiles={tile_gb:.2f} GB",
                  flush=True)
            if tile_gb > args.max_gb:
                print(f"  skip (tiles > {args.max_gb} GB)", flush=True)
                continue
            tiles = jnp.asarray(
                rng.standard_normal(bpat.value_shape).astype(np.float32))
            bell = bpat.matrix(tiles)
            b_bytes = tiles.nbytes + bpat.nbr.size * 4 + 2 * n2 * 4

            ncb = -(-n2 // b) * b

            def xla_mv(tiles, x, bpat=bpat, ncb=ncb, b=b):
                nb, _, mb = tiles.shape
                xb = jnp.pad(x, (0, ncb - bpat.n_cols)).reshape(ncb // b, b)
                g = xb[bpat.nbr].reshape(nb, mb)
                y = jnp.einsum("bik,bk->bi", tiles, g)
                return y.reshape(-1)[:bpat.n_rows]

            jfn = lift_jit(chain_of(xla_mv), [bpat])
            measure(f"xla_b{b}", case, n2, nnz, jfn, (tiles, x32), b_bytes)

            if backend != "cpu":        # Mosaic kernels: compiled TPU only
                def pl_mv(tiles, x, bell=bell):
                    return PallasBSRSpMV(bell.with_vals(tiles),
                                         rows_per_step=8,
                                         variant="scratch")(x)

                jfn = lift_jit(chain_of(pl_mv), [bpat])
                measure(f"pallas_b{b}", case, n2, nnz, jfn, (tiles, x32),
                        b_bytes)

                dop = DF32BlockSpMV.from_pattern(bpat, rows_per_step=8)
                tiles64 = tiles.astype(jnp.float64)
                from fenapack_tpu.runtime import Holder
                hold = Holder(planes=dop.split_tiles(tiles64))
                d_bytes = (3 * tiles.nbytes + bpat.nbr.size * 4
                           + 3 * 2 * n2 * 4)

                def df_mv(planes, x, dop=dop):
                    return dop(planes, x)

                jfn = lift_jit(chain_of(df_mv), [bpat, hold])
                measure(f"df32_b{b}", case, n2, nnz, jfn,
                        (hold.planes, x64), d_bytes)

    if args.md:
        lines = [
            "# SpMV layout table (measured)",
            "",
            f"Scalar P2 velocity-block SpMV, backend **{backend}**, "
            f"roofline {bw/1e9:.0f} GB/s.",
            "Generated by `scripts/spmv_table.py`.",
            "",
            "| case | variant | rows | nnz | µs/apply | GB moved | GB/s "
            "| % roofline |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            if "error" in r:
                lines.append(f"| {r['case']} | {r['variant']} | — | — "
                             f"| failed: {r['error'][:60]} | — | — | — |")
                continue
            lines.append(
                f"| {r['case']} | {r['variant']} | {r['n_rows']} "
                f"| {r['nnz']} | {r['us_per_apply']} | {r['gb_per_apply']} "
                f"| {r['gbs']} | {r['pct_roofline']} |")
        with open(args.md, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.md}", flush=True)


if __name__ == "__main__":
    main()
