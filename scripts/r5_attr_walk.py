#!/usr/bin/env python
"""Name every device array reachable from the 3D solver, grouped by path.

Small-scale companion to r5_resident_audit.py: builds the l=1 config-4
solver on CPU (seconds) and prints attribute PATHS holding f64 arrays (the
residency hogs at 2M are the same attributes at bigger shapes), so the
eviction fix targets named buffers.

    JAX_PLATFORMS=cpu python scripts/r5_attr_walk.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demos"))

import numpy as np


def walk(root, name, out, seen):
    import jax
    if id(root) in seen:
        return
    seen.add(id(root))
    if isinstance(root, jax.Array):
        out.append((name, root))
        return
    if isinstance(root, (list, tuple)):
        for i, v in enumerate(root):
            walk(v, f"{name}[{i}]", out, seen)
        return
    if isinstance(root, dict):
        for k, v in root.items():
            walk(v, f"{name}[{k!r}]", out, seen)
        return
    mod = type(root).__module__ or ""
    if not (mod.startswith("fenapack_tpu") and hasattr(root, "__dict__")):
        return
    for k, v in vars(root).items():
        walk(v, f"{name}.{k}", out, seen)


def main():
    import demo_step3d
    ap = demo_step3d.make_parser()
    args = ap.parse_args(sys.argv[1:] or
                         ["-l", "1", "--length", "9", "--block", "8",
                          "--dtype", "float32", "--maxiter", "40"])
    import jax
    solver = demo_step3d.build(args)
    out, seen = [], set()
    walk(solver, "solver", out, seen)
    named = {id(a) for _, a in out}
    by_id = {}
    for n, a in out:
        by_id.setdefault(id(a), (a, []))[1].append(n)
    rows = sorted(by_id.values(), key=lambda t: -t[0].nbytes)
    print(f"named {len(by_id)} arrays, "
          f"{sum(a.nbytes for a, _ in rows)/1e6:.1f} MB reachable")
    for a, names in rows[:60]:
        print(f"  {a.nbytes/1e6:8.2f} MB {str(a.dtype):8s} {a.shape}  "
              f"{names[0]}" + (f" (+{len(names)-1} aliases)"
                               if len(names) > 1 else ""))
    # anything live but NOT reachable from solver?
    live = [a for a in jax.live_arrays() if a.nbytes > 1e6]
    orphans = [a for a in live if id(a) not in named]
    print(f"\nlive>1MB: {len(live)}; unreachable from solver: "
          f"{len(orphans)} ({sum(a.nbytes for a in orphans)/1e6:.1f} MB)")
    for a in sorted(orphans, key=lambda a: -a.nbytes)[:15]:
        print(f"  orphan {a.nbytes/1e6:8.2f} MB {a.dtype} {a.shape}")


if __name__ == "__main__":
    main()
