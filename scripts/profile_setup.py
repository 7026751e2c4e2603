#!/usr/bin/env python
"""Profile the host-side (NumPy) setup path at 3D scale: mesh refinement,
dofmap/RCM, sparsity patterns, assembler constants.  Identifies what the
native (C++) setup library must accelerate (SURVEY.md round-2 backlog)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVEL = int(os.environ.get("LEVEL", "2"))

from fenapack_tpu.jax_setup import setup
setup(x64=True)
import jax.numpy as jnp
import numpy as np

from fenapack_tpu.fem import mesh3d


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt:8.2f} s")
    return out


mesh = t("base mesh", lambda: mesh3d.backward_step_mesh3d(0))
for l in range(LEVEL):
    mesh = t(f"refine level {l}", lambda: mesh3d.refine_uniform3d(mesh)[0])[0] \
        if False else t(f"refine level {l}",
                        lambda: mesh3d.refine_uniform3d(mesh))[0]
print(f"cells={mesh.num_cells} verts={mesh.num_vertices}")

from fenapack_tpu.fem.dofmap import TaylorHood
W = t("TaylorHood dofmap (incl RCM)", lambda: TaylorHood(mesh, reorder=True))
print(f"n_dof = {W.V.dim * 3 + W.Q.dim}")

from fenapack_tpu.fem.assemble import NSAssembler
asm = t("NSAssembler init (patterns+consts)",
        lambda: NSAssembler(mesh, 0.02, dtype=jnp.float64, block_size=32,
                            reorder=True, block_dtype=jnp.float32))
print("total dofs:", asm.dim * asm.n2 + asm.n1)
