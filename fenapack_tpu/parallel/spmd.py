"""Hand-scheduled SPMD building blocks: shard_map row-block SpMV + reductions.

Complement to parallel/sharding.py (GSPMD): where GSPMD lets XLA place the
collectives, this module pins the distribution explicitly — the moral
equivalent of PETSc's MPIAIJ design (SURVEY.md section 5.8):

  * operators are row-block partitioned: device i owns rows
    [i*n_loc, (i+1)*n_loc) of every ELL matrix and vector (alignment padding
    guarantees divisibility — ``NSAssembler(row_align=n_devices)``);
  * SpMV: each device gathers the remote x entries it needs.  The general
    FEM graph makes per-neighbor halos data-dependent, so the portable
    implementation all-gathers x over ICI (jax.lax.all_gather) — on a ring
    this costs the same bandwidth as a halo exchange whenever the stencil
    spans neighbors, and XLA overlaps it with the local compute;
  * dot products / norms: local partial + ``psum`` (the MPI_Allreduce of the
    reference).

These primitives let a whole FGMRES run inside one ``shard_map`` region with
no host round-trips; fenapack_tpu's default multi-chip path remains GSPMD
(same math, compiler-chosen schedule), with this module as the explicit
fallback/optimization surface.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.sparse import ELL


class RowBlockELL:
    """ELL matrix partitioned into contiguous row blocks over a mesh axis.

    Built host-side from a global ELL whose row count is divisible by the
    device count.  Inside a shard_map region, ``mv_local(x_local)`` computes
    the owned rows of ``A @ x`` (all-gathering x over the mesh axis).
    """

    def __init__(self, ell: ELL, axis: str):
        self.axis = axis
        self.ell = ell
        self.n_rows, _ = ell.shape
        self.n_cols = ell.n_cols

    def mv_local(self, vals_loc, cols_loc, x_loc):
        """Owned rows of A @ x from device-local blocks (shard_map body)."""
        x = jax.lax.all_gather(x_loc, self.axis, tiled=True)
        g = x[cols_loc]
        return jnp.sum(vals_loc * g, axis=1)


def pdot(a_loc, b_loc, axis: str):
    """Distributed dot product (allreduce over the mesh axis)."""
    return jax.lax.psum(jnp.vdot(a_loc, b_loc), axis)


def pnorm(a_loc, axis: str):
    return jnp.sqrt(jax.lax.psum(jnp.vdot(a_loc, a_loc), axis))


def make_spmd_spmv(ell: ELL, device_mesh: Mesh, axis: str = "dd"):
    """Return ``f(x) -> A @ x`` running as an explicit shard_map program:
    row-block local SpMV + all-gather of x over ICI.

    ``ell.shape[0]`` and ``ell.n_cols`` must be divisible by the mesh size.
    """
    n_dev = device_mesh.devices.size
    n_rows = ell.shape[0]
    if n_rows % n_dev or ell.n_cols % n_dev:
        raise ValueError(
            f"rows {n_rows} / cols {ell.n_cols} not divisible by {n_dev}; "
            "build the assembler with row_align=n_devices")

    rows = NamedSharding(device_mesh, P(axis))
    vals = jax.device_put(ell.vals, rows)
    cols = jax.device_put(ell.cols, rows)
    rb = RowBlockELL(ell, axis)

    @partial(shard_map, mesh=device_mesh,
             in_specs=(P(axis), P(axis), P(axis)), out_specs=P(axis))
    def spmv(vals_loc, cols_loc, x_loc):
        return rb.mv_local(vals_loc, cols_loc, x_loc)

    return lambda x: spmv(vals, cols, x)


def make_spmd_dot(device_mesh: Mesh, axis: str = "dd"):
    """Distributed dot product as a shard_map program (psum allreduce)."""

    @partial(shard_map, mesh=device_mesh, in_specs=(P(axis), P(axis)),
             out_specs=P())
    def dot(a_loc, b_loc):
        return pdot(a_loc, b_loc, axis)

    return dot
