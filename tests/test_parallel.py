"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md section 4
item 4 — the analogue of the reference's ``mpirun -np 3`` CI runs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver
from fenapack_tpu.parallel.sharding import ShardedOseen, make_device_mesh
from fenapack_tpu.parallel import spmd


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def step_inflow(x):
    v = np.zeros((x.shape[0], 2))
    v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
    return v


def build(row_align=1):
    mesh = meshmod.backward_step_mesh(0)
    asm = NSAssembler(mesh, 0.02, row_align=row_align)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], step_inflow)]
    cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2"})
    return NonlinearSolver(asm, bcs, cfg)


@needs_8
def test_sharded_step_matches_single_device():
    """The GSPMD-sharded full Picard step computes the same update as the
    unsharded solver (bitwise-level parity is not required — same math,
    different reduction orders — but agreement to solver tolerance is)."""
    ref = build(row_align=1)
    F0 = ref._residual(ref.initial_state())
    res = ref.oseen.solve(ref.initial_state()[:ref.n_u], -F0)
    w_ref = ref.initial_state() + res.x

    nl = build(row_align=8)
    sharded = ShardedOseen(nl, make_device_mesh(8))
    w1, iters, _ = sharded.step(nl.initial_state())

    # compare on real dofs only (layouts differ by padding)
    def unpack(w, asm):
        n2 = asm.n2
        return np.concatenate([
            np.asarray(w[:n2])[:asm.n2_real],
            np.asarray(w[n2:2 * n2])[:asm.n2_real],
            np.asarray(w[2 * n2:])[:asm.n1_real]])

    a = unpack(w_ref, ref.asm)
    b = unpack(w1, nl.asm)
    err = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert err < 1e-8, err
    assert abs(int(iters) - int(res.iters)) <= 2


@needs_8
def test_spmd_spmv_matches():
    """Explicit shard_map row-block SpMV == single-device SpMV."""
    nl = build(row_align=8)
    ell = nl.asm.const.Ap
    mesh = make_device_mesh(8)
    f = spmd.make_spmd_spmv(ell, mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ell.n_cols))
    err = float(jnp.max(jnp.abs(f(x) - ell.mv(x))))
    assert err < 1e-12, err


@needs_8
def test_spmd_dot_matches():
    nl = build(row_align=8)
    mesh = make_device_mesh(8)
    dot = spmd.make_spmd_dot(mesh)
    rng = np.random.default_rng(1)
    n = nl.asm.n1
    a = jnp.asarray(rng.standard_normal(n))
    b = jnp.asarray(rng.standard_normal(n))
    assert abs(float(dot(a, b)) - float(jnp.vdot(a, b))) < 1e-10


@needs_8
def test_sharded_supg_high_re_step():
    """BASELINE config 5 composition: SUPG-stabilized system at Re=2000 +
    GMG subsolves + mesh-sharded (GSPMD) solve — the sharded step must match
    the single-device solver on the same configuration."""
    from fenapack_tpu.solvers import gmg

    def build_supg(row_align):
        hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), 1)
        mesh = hier.fine
        asm = NSAssembler(mesh, 1e-3, row_align=row_align)
        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                    lambda x: np.zeros((x.shape[0], 2))),
               DirichletBC.velocity(asm.W, [meshmod.INFLOW], step_inflow)]
        cfg = overrides(SolverConfig(), {
            "pcd.variant": "BRM2", "system_supg": True,
            "krylov.maxiter": 400, "krylov.rtol": 1e-6,
            "velocity.method": "gmg", "velocity.smooth_iters": 3,
            "velocity.cycles": 2, "pcd.ap.method": "gmg"})
        ap_h = gmg.PressureHierarchy(hier, jnp.float64,
                                     pcd_markers=[meshmod.OUTFLOW])
        v_h = gmg.VelocityHierarchy(hier, 1e-3, jnp.float64,
                                    bc_markers=[meshmod.WALL,
                                                meshmod.INFLOW],
                                    fine_asm=asm)
        return NonlinearSolver(asm, bcs, cfg, ap_hierarchy=ap_h,
                               velocity_hierarchy=v_h)

    ref = build_supg(1)
    F0 = ref._residual(ref.initial_state())
    res = ref.oseen.solve(ref.initial_state()[:ref.n_u], -F0)
    w_ref = ref.initial_state() + res.x

    nl = build_supg(8)
    sharded = ShardedOseen(nl, make_device_mesh(8))
    w1, iters, _ = sharded.step(nl.initial_state())

    def unpack(w, asm):
        n2 = asm.n2
        return np.concatenate([
            np.asarray(w[:n2])[:asm.n2_real],
            np.asarray(w[n2:2 * n2])[:asm.n2_real],
            np.asarray(w[2 * n2:])[:asm.n1_real]])

    a, b = unpack(w_ref, ref.asm), unpack(w1, nl.asm)
    err = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert err < 1e-6, err
    assert abs(int(iters) - int(res.iters)) <= 3
    assert int(iters) < 400     # SUPG keeps high-Re solvable when sharded


@needs_8
def test_sharded_block_layout_constructs_and_steps():
    """ShardedOseen must accept block-sparse assemblers (const.M2 is None
    there, and block-row counts need not divide the device mesh — such
    operators are replicated instead of row-sharded)."""
    mesh = meshmod.backward_step_mesh(0)
    asm = NSAssembler(mesh, 0.02, row_align=8, block_size=32, reorder=False,
                      block_dtype=jnp.float32)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], step_inflow)]
    cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2",
                                     "dtype": "float32"})
    nl = NonlinearSolver(asm, bcs, cfg)
    sharded = ShardedOseen(nl, make_device_mesh(8))
    w1, iters, _ = sharded.step(nl.initial_state())
    assert np.all(np.isfinite(np.asarray(w1)))
    assert 0 < int(iters) <= 100
