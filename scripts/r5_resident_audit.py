#!/usr/bin/env python
"""Dissect the 2.05M-dof solver's device residency (round-5 gate).

TPU attempt 4 measured 14.0 GB resident after setup — the OOM is
residency, not program temps.  This script builds the identical solver on
CPU (free iteration), groups every live jax array by (shape, dtype) with
counts, and walks the GC to name each big array's OWNER (which attribute
of which object holds it), so the eviction fix targets the right buffers.

    JAX_PLATFORMS=cpu python scripts/r5_resident_audit.py -l 3 --length 9 \
        --block 8 --dtype float32 --maxiter 40
"""
import gc
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demos"))


def owners_of(arr, depth=2):
    """Best-effort: (container_type, attribute/key) chains that hold arr."""
    out = []
    for ref in gc.get_referrers(arr):
        if isinstance(ref, dict):
            key = next((k for k, v in ref.items() if v is arr), None)
            # find the object whose __dict__ this is
            for ref2 in gc.get_referrers(ref):
                if hasattr(ref2, "__dict__") and ref2.__dict__ is ref:
                    out.append(f"{type(ref2).__name__}.{key}")
                    break
            else:
                out.append(f"dict[{key!r}]")
        elif isinstance(ref, (list, tuple)):
            out.append(f"{type(ref).__name__}(len={len(ref)})")
        if len(out) >= 4:
            break
    return out


def main():
    import demo_step3d
    ap = demo_step3d.make_parser()
    args = ap.parse_args()
    import jax
    solver = demo_step3d.build(args)

    live = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)
    tot = sum(a.nbytes for a in live)
    print(f"\n[resident] {len(live)} arrays, {tot/1e9:.2f} GB")

    groups = defaultdict(lambda: [0, 0.0])
    for a in live:
        g = groups[(str(a.dtype), a.shape)]
        g[0] += 1
        g[1] += a.nbytes
    print("\n== grouped by (dtype, shape), > 20 MB total ==")
    rows = sorted(groups.items(), key=lambda kv: -kv[1][1])
    acc = 0.0
    for (dt, sh), (n, b) in rows:
        if b < 20e6:
            break
        acc += b
        print(f"  {b/1e6:9.1f} MB  x{n:3d}  {dt:8s} {sh}")
    print(f"  ({acc/1e9:.2f} GB in groups above; "
          f"{(tot-acc)/1e9:.2f} GB in smaller)")

    print("\n== owners of the 25 largest ==")
    seen = set()
    for a in live[:25]:
        key = (a.nbytes, str(a.dtype), a.shape)
        tag = "" if key not in seen else " (dup)"
        seen.add(key)
        print(f"  {a.nbytes/1e6:9.1f} MB {a.dtype} {a.shape}{tag}: "
              f"{owners_of(a)}")


if __name__ == "__main__":
    main()
