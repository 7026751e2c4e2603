"""fenapack_tpu — TPU-native PCD-preconditioned Navier-Stokes solvers.

A from-scratch rebuild of the capabilities of FENaPack (fenapack: PCD
Schur-complement preconditioning for FEniCS/PETSc Navier-Stokes solvers) as
a JAX/XLA/Pallas library: FEM assembly, static-sparsity device-resident
operators, a jit flexible-GMRES with upper-triangular Schur fieldsplit, the
BRM1/BRM2 PCD applies with their boundary-condition variants, Picard/Newton
and theta-scheme drivers, geometric-multigrid subsolves, SUPG stabilization
and GSPMD multi-chip domain decomposition.

Public surface mirroring ``fenapack/__init__.py``:

The reference's own class names are importable from the package root with
the reference's constructor shapes (``solvers.custom``): ``PCDAssembler(a,
L, bcs, mp=, ap=, kp=, ..., bcs_pcd=)`` over user-written ``fem.forms``
forms, ``PCDKrylovSolver``, ``PCDNewtonSolver``.  The TPU-idiomatic
factored API underneath maps as:
  fenapack.PCDKrylovSolver        -> solvers.oseen.OseenSolver
  fenapack.PCDAssembler           -> fem.assemble.NSAssembler
  fenapack.PCDNewtonSolver        -> solvers.nonlinear.NonlinearSolver
  fenapack.PCDNonlinearProblem    -> (folded into NonlinearSolver)
  fenapack.PCDPC_BRM1 / _BRM2     -> solvers.pcd.make_pcd_apply("BRM1"/"BRM2")
  fenapack.StabilizationParameterSD -> NSAssembler.supg_values
"""

from .fem.mesh import (TriMesh, rectangle_mesh, box_union_mesh,
                       backward_step_mesh, cavity_mesh, channel_mesh,
                       refine_uniform, WALL, INFLOW, OUTFLOW)
from .fem.mesh3d import (TetMesh, box_mesh, box_union_mesh3d,
                         backward_step_mesh3d, channel_mesh3d)
from .fem.dofmap import TaylorHood, DirichletBC, merge_bcs
from .fem.assemble import NSAssembler
from .ops.sparse import ELL, SparsityPattern
from .solvers.config import (SolverConfig, KrylovConfig, PCDConfig,
                             SubsolveConfig, override, overrides)
from .solvers.krylov import fgmres, FGMRESResult
from .solvers.pcd import make_pcd_apply
from .solvers.fieldsplit import make_fieldsplit_upper
from .solvers.oseen import OseenSolver
from .solvers.nonlinear import NonlinearSolver, NonlinearResult
from .solvers.unsteady import UnsteadySolver, UnsteadyResult
from .solvers import gmg
from .solvers.custom import PCDAssembler, PCDKrylovSolver, PCDNewtonSolver

__version__ = "0.1.0"

__all__ = [
    "TriMesh", "rectangle_mesh", "box_union_mesh", "backward_step_mesh",
    "cavity_mesh", "channel_mesh", "refine_uniform",
    "WALL", "INFLOW", "OUTFLOW",
    "TaylorHood", "DirichletBC", "merge_bcs", "NSAssembler",
    "ELL", "SparsityPattern",
    "SolverConfig", "KrylovConfig", "PCDConfig", "SubsolveConfig",
    "override", "overrides",
    "fgmres", "FGMRESResult", "make_pcd_apply", "make_fieldsplit_upper",
    "OseenSolver", "NonlinearSolver", "NonlinearResult",
    "UnsteadySolver", "UnsteadyResult", "gmg",
    "PCDAssembler", "PCDKrylovSolver", "PCDNewtonSolver",
]
