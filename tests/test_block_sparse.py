"""Block-sparse (BSR-tile) layout: correctness vs the ELL path.

The TPU production SpMV (ops.sparse.BlockSparsityPattern): RCM-reordered
dofs + dense b x b tiles => row gathers of whole blocks + batched MXU tile
contractions instead of XLA's scalar-slow arbitrary gather.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.ops.sparse import (SparsityPattern, BlockSparsityPattern)
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver


def test_block_pattern_spmv_matches():
    rng = np.random.default_rng(0)
    n, nnz = 301, 4000
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = jnp.asarray(rng.standard_normal(nnz))
    ref = SparsityPattern(rows, cols, n, n).assemble(vals)
    x = jnp.asarray(rng.standard_normal(n))
    for b in (8, 32):
        blk = BlockSparsityPattern(rows, cols, n, n, block=b).assemble(vals)
        err = float(jnp.max(jnp.abs(blk.mv(x) - ref.mv(x))))
        assert err < 1e-11, (b, err)
        # row sums + diagonal agree
        assert float(jnp.max(jnp.abs(blk.row_sums() - ref.row_sums()))) < 1e-11


def test_block_to_dense_matches():
    rng = np.random.default_rng(1)
    n, m, nnz = 40, 30, 300
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    vals = jnp.asarray(rng.standard_normal(nnz))
    pe = SparsityPattern(rows, cols, n, m)
    pb = BlockSparsityPattern(rows, cols, n, m, block=8)
    de = pe.to_dense(pe.assemble_values(vals))
    db = pb.to_dense(pb.assemble_values(vals))
    assert float(jnp.max(jnp.abs(de - db))) < 1e-12


def step_inflow(x):
    v = np.zeros((x.shape[0], 2))
    v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
    return v


def _solver(block_size):
    mesh = meshmod.backward_step_mesh(0)
    asm = NSAssembler(mesh, 0.02, block_size=block_size)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], step_inflow)]
    cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2"})
    return NonlinearSolver(asm, bcs, cfg)


def test_block_solver_matches_ell():
    """Full Picard solve in the block layout (incl. RCM reordering) gives
    the same iteration counts and the same physical solution."""
    ref = _solver(None)
    blk = _solver(32)
    r_ref = ref.solve(rtol=1e-4, max_steps=6)
    r_blk = blk.solve(rtol=1e-4, max_steps=6)
    assert r_blk.converged == r_ref.converged
    for a, b in zip(r_blk.linear_iters, r_ref.linear_iters):
        assert abs(a - b) <= 2, (r_blk.linear_iters, r_ref.linear_iters)
    # compare velocity at mesh vertices through the reorder-aware maps
    va = np.asarray(r_ref.w[:ref.asm.n2])[ref.asm.W.V.vertex_dofs()]
    vb = np.asarray(r_blk.w[:blk.asm.n2])[blk.asm.W.V.vertex_dofs()]
    assert np.linalg.norm(va - vb) / max(np.linalg.norm(va), 1e-30) < 1e-8
    # block fill-in stays sane with RCM ordering
    assert blk.asm.pat_p2.fill_ratio < 25, blk.asm.pat_p2.fill_ratio


def test_small_block_sizes_match_ell_3d():
    """b=8/16 tiles (the HBM-friendly sizes for 3D P2 at scale: 2.55 GB
    at b=32 vs ~0.9 GB at b=8 for 761k dofs) produce the same operator."""
    import numpy as np
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh3d
    from fenapack_tpu.fem.dofmap import TaylorHood
    from fenapack_tpu.ops.sparse import pattern_from_dofmaps
    from fenapack_tpu.solvers import gmg

    hier = gmg.build_hierarchy(mesh3d.backward_step_mesh3d(0, length=1.5), 1)
    W = TaylorHood(hier.fine, reorder=True)
    cd2 = W.V.cell_dofs.astype(np.int32)
    pe = pattern_from_dofmaps(cd2, cd2, W.n2, W.n2, block=None)
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(pe.entry_pos.shape[0])
    Ae = pe.assemble(jnp.asarray(vals))
    x = jnp.asarray(rng.standard_normal(W.n2))
    y_ref = Ae.mv(x)
    for b in (8, 16):
        p = pattern_from_dofmaps(cd2, cd2, W.n2, W.n2, block=b)
        Ab = p.assemble(jnp.asarray(vals))
        assert float(jnp.max(jnp.abs(Ab.mv(x) - y_ref))) < 1e-12


def test_block_mv_multi_rhs_matches_ell():
    """BlockELL.mv supports the documented (n_cols, k) multi-RHS interface
    of ELL.mv (used by vmapped/batched callers)."""
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler

    asm_e = NSAssembler(meshmod.backward_step_mesh(0), 0.02)
    asm_b = NSAssembler(meshmod.backward_step_mesh(0), 0.02, block_size=32,
                        reorder=False)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((asm_e.n1, 3))
    y_e = np.asarray(asm_e.const.Ap.mv(jnp.asarray(X)))
    y_b = np.asarray(asm_b.const.Ap.mv(jnp.asarray(X)))
    assert y_e.shape == y_b.shape == (asm_e.n1, 3)
    assert np.allclose(y_e, y_b, atol=1e-8)


def test_distinct_pattern_builds_share_one_jit():
    """Regression: ELL/BlockELL carry their index arrays as pytree METADATA
    (compile-time constants).  Raw arrays there crash jit's treedef equality
    ("arrays cannot be passed as metadata fields") the moment two DIFFERENT
    pattern builds hit the same jit function in one process — which is
    exactly what scripts/sweep_bench.py does (killed 6/8 round-2 sweep
    points).  The identity-keyed _StaticArray wrapper must give distinct
    builds distinct cache entries and with_vals() reuses the same entry."""
    import jax

    rng = np.random.default_rng(1)
    n, nnz = 97, 900
    calls = []

    @jax.jit
    def apply(op, x):
        calls.append(None)          # traces only on cache miss
        return op.mv(x)

    x = jnp.asarray(rng.standard_normal(n))
    for b in (8, 32):
        rows = rng.integers(0, n, nnz)
        cols = rng.integers(0, n, nnz)
        vals = jnp.asarray(rng.standard_normal(nnz))
        pat = BlockSparsityPattern(rows, cols, n, n, block=b)
        op = pat.assemble(vals)
        dense = np.zeros((n, n))
        np.add.at(dense, (rows, cols), np.asarray(vals))
        got = apply(op, x)                       # build 1: fresh trace
        assert np.allclose(np.asarray(got), dense @ np.asarray(x), atol=1e-9)
        n_traces = len(calls)
        got2 = apply(op.with_vals(op.vals * 2.0), x)   # same pattern: cache hit
        assert len(calls) == n_traces, "with_vals() must not retrace"
        assert np.allclose(np.asarray(got2), 2 * dense @ np.asarray(x),
                           atol=1e-9)
