"""Multi-chip domain decomposition via GSPMD sharding.

TPU-native replacement for the reference's MPI layer (SURVEY.md section 2.2
item 8, section 5.8): upstream fenapack inherits distribution from DOLFIN mesh
partitioning + PETSc MPIAIJ row-distributed matrices, where every SpMV does a
VecScatter halo exchange and every dot product is an MPI allreduce.

Here the same domain decomposition is expressed the XLA way: mesh cells and
operator rows are sharded over a 1D ``jax.sharding.Mesh`` axis, dof vectors
are row-sharded, and the *compiler* inserts the collectives (all-gathers for
the ELL column gathers = halo exchange; reduce-scatters for the transpose
scatter-adds; psums inside dot products) over ICI.  One jit program replaces
the whole MPI SPMD process model; there are no host round-trips inside the
solve.

Two levels of fidelity:
  * :class:`ShardedOseen` — GSPMD: annotate shardings, let XLA partition the
    existing single-chip FGMRES/PCD program.  This is the default multi-chip
    path and what ``__graft_entry__.dryrun_multichip`` exercises.
  * a hand-scheduled ``shard_map`` halo-exchange SpMV lives in
    ``fenapack_tpu/parallel/spmd.py`` for when profiling shows GSPMD's
    all-gather is the bottleneck (it rides ICI either way).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers.nonlinear import NonlinearSolver


class ShardedOseen:
    """Shard a :class:`NonlinearSolver`'s arrays over a 1D device mesh and
    expose a jitted full Picard/Newton step.

    The sharding layout (the "parallelism plan"):
      * per-cell assembly batches (geometry ``g2``/``g1``/``wdet``, cell
        dofmaps) — sharded over cells: **data parallelism** over the mesh;
      * ELL operator values and dof vectors — row-sharded: **tensor
        parallelism** over operator rows (the PETSc MPIAIJ layout);
      * small basis tables, Givens scalars, Hessenberg — replicated.

    Mutates the wrapped solver's arrays in place with ``device_put`` (the
    arrays are identical values with a distributed layout).
    """

    def __init__(self, nl: NonlinearSolver, device_mesh: Mesh,
                 axis: str = "dd"):
        self.nl = nl
        self.mesh = device_mesh
        self.axis = axis
        asm = nl.asm
        n_dev = device_mesh.devices.size
        if asm.row_align % n_dev != 0:
            raise ValueError(
                f"assembler row_align={asm.row_align} must be a multiple of "
                f"the device mesh size {n_dev}; build the NSAssembler with "
                f"row_align=<n_devices>")

        rows = NamedSharding(device_mesh, P(axis))          # shard axis 0
        repl = NamedSharding(device_mesh, P())

        def put_rows(x):
            return jax.device_put(x, rows)

        # per-cell batches (cells axis leads)
        for name in ("Jinv", "g1", "adet", "wdet", "cd2", "cd1"):
            setattr(asm, name, put_rows(getattr(asm, name)))
        # small tables + facet batches (boundary ~ sqrt(interior)): replicate
        repl_names = ["qw", "phi2", "phi1", "dphi2"]
        if getattr(asm, "n_inflow_facets", 0):
            repl_names += ["f_phi2", "f_phi1", "f_wlen", "f_normals",
                           "f_cd2", "f_cd1"]
        for name in repl_names:
            setattr(asm, name, jax.device_put(getattr(asm, name), repl))

        # constant operators: row-shard ELL values and column indices
        const = asm.const
        # M2 is None for block-layout assemblers (assembled skip_m2=True)
        ells = [e for e in (const.L, const.Mp, const.Ap, const.M2,
                            *const.D, *const.DT) if e is not None]
        for ell in ells:
            if hasattr(ell, "tiles"):           # BlockELL
                # block rows shard only when divisible by the mesh; else
                # replicate (correct under GSPMD, loses memory scaling —
                # row_align=n_dev*block gives divisible block rows)
                if ell.tiles.shape[0] % n_dev == 0:
                    ell.tiles = put_rows(ell.tiles)
                    ell.nbr = put_rows(ell.nbr)
                else:
                    ell.tiles = jax.device_put(ell.tiles, repl)
                    ell.nbr = jax.device_put(ell.nbr, repl)
            else:                               # ELL
                ell.vals = put_rows(ell.vals)
                ell.cols = put_rows(ell.cols)

        self.vec = rows
        self._step = jax.jit(self._step_impl)

    def _step_impl(self, w):
        nl = self.nl
        w = jax.lax.with_sharding_constraint(w, self.vec)
        F = nl._residual(w)
        F = jax.lax.with_sharding_constraint(F, self.vec)
        res = nl.oseen._solve_impl(w[:nl.n_u], -F)
        dw = jax.lax.with_sharding_constraint(res.x, self.vec)
        return w + dw, res.iters, res.resnorms

    def step(self, w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One nonlinear update ``w <- w + Oseen_solve(w, -F(w))``, fully
        jitted and partitioned over the device mesh."""
        w = jax.device_put(w, self.vec)
        return self._step(w)


def make_device_mesh(n_devices: Optional[int] = None,
                     axis: str = "dd") -> Mesh:
    """1D device mesh over the first ``n_devices`` (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
