#!/usr/bin/env python
"""Offline DFG 2D-2 metrics from a history csv (t, cD, cL, dP).

Computes Strouhal (mean zero-upcrossing period of cL), cDmax, cLmax over a
trailing window, plus a per-period table — used to decide mid-scan whether
the warm-started l2 run has settled into its limit cycle (the published
bands need the ESTABLISHED cycle, not the interpolation transient).

    python scripts/dfg2d2_summary.py results/r5_dfg2d2_l2_hist.csv [t_min]
"""
import sys

import numpy as np

D, UBAR = 0.1, 1.0


def main():
    path = sys.argv[1]
    rows = np.loadtxt(path, delimiter=",", skiprows=1)
    t, cd, cl, dp = rows.T
    t_min = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5 * t[-1]
    print(f"{len(t)} rows, t in [{t[0]:.4g}, {t[-1]:.4g}]; "
          f"window t > {t_min:.4g}")
    m = t > t_min
    s = cl[m] - cl[m].mean()
    up = np.where((s[:-1] < 0) & (s[1:] >= 0))[0]
    if up.size >= 2:
        period = (t[m][up[-1]] - t[m][up[0]]) / (up.size - 1)
        print(f"St     = {D / (period * UBAR):.4f}   (ref 0.2950-0.3050), "
              f"{up.size - 1} periods in window")
    print(f"cDmax  = {cd[m].max():.4f}   (ref 3.2200-3.2400)")
    print(f"cLmax  = {cl[m].max():.4f}   (ref 0.9900-1.0100)")
    print(f"dP(t_end) = {dp[-1]:.4f}    (ref 2.46-2.50 at cLmax phase)")
    # per-period maxima: is the cycle still drifting?
    print("\nper-period (zero-upcrossing segmented, full record):")
    up_all = np.where((cl[:-1] < 0) & (cl[1:] >= 0))[0]
    for a, b in zip(up_all[:-1], up_all[1:]):
        if b - a < 5:
            continue
        print(f"  t {t[a]:7.3f} -> {t[b]:7.3f}: period {t[b]-t[a]:.4f} "
              f"(St {D/((t[b]-t[a])*UBAR):.4f})  cDmax {cd[a:b].max():.4f}  "
              f"cLmax {cl[a:b].max():.4f}")


if __name__ == "__main__":
    main()
