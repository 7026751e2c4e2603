"""Canonical problem definitions — the "model zoo" of a PDE framework.

The reference's workloads are its demo scripts (fenapack
``demo/navier-stokes-pcd``); here each is a small declarative class that
builds the assembler, boundary conditions and (optionally GMG-equipped)
solver in one call, so demos, tests and user code share one entry point:

    from fenapack_tpu.models import StepFlow2D
    nl = StepFlow2D(level=2, nu=0.02).solver(pcd="BRM2",
                                             gmg_subsolves=True)
    res = nl.solve(rtol=1e-5)

Every problem exposes:
  * ``mesh()``        — the marked mesh (hierarchy when ``gmg``);
  * ``assembler()``   — a ready NSAssembler;
  * ``bcs(asm)``      — the velocity Dirichlet set;
  * ``solver(...)``   — a NonlinearSolver (or UnsteadySolver via
    ``unsteady=dt``), with dotted config overrides passed through.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..fem import mesh as meshmod
from ..fem import mesh3d
from ..fem.assemble import NSAssembler
from ..fem.dofmap import DirichletBC
from ..solvers.config import SolverConfig, overrides
from ..solvers.nonlinear import NonlinearSolver
from ..solvers.unsteady import UnsteadySolver
from ..solvers import gmg


def _zero(d):
    return lambda x: np.zeros((x.shape[0], d))


@dataclasses.dataclass
class _ProblemBase:
    level: int = 0
    nu: float = 0.02
    dtype: str = "float64"
    dim: int = 2

    # -- overridable pieces -------------------------------------------- #
    def _base_mesh(self):
        raise NotImplementedError

    def inflow_profile(self):
        raise NotImplementedError

    def inflow_marker(self):
        return meshmod.INFLOW

    def noslip_markers(self):
        return [meshmod.WALL]

    def snap(self):
        """Optional in-place boundary-projection hook applied after each
        refinement (curved geometries; see mesh.snap_to_circle)."""
        return None

    def enclosed(self) -> bool:
        return False

    def pcd_marker_for(self, variant: str):
        """Facet marker carrying the pressure Dirichlet rows."""
        if self.enclosed():
            return meshmod.INFLOW if variant == "BRM1" else None
        return (meshmod.INFLOW if variant == "BRM1" else meshmod.OUTFLOW)

    # -- builders ------------------------------------------------------ #
    def mesh(self, gmg_levels: Optional[int] = None):
        snap = self.snap()
        if gmg_levels is None:
            m = self._base_mesh()
            for _ in range(self.level):
                # dispatch on the mesh itself (same criterion as
                # gmg.build_hierarchy), not the dim field
                m = (meshmod.refine_uniform(m)[0]
                     if m.vertices.shape[1] == 2
                     else mesh3d.refine_uniform3d(m)[0])
                if snap is not None:
                    snap(m)
            return m
        return gmg.build_hierarchy(self._base_mesh(),
                                   max(self.level, gmg_levels), snap=snap)

    def assembler(self, mesh=None, **asm_kw):
        m = self.mesh() if mesh is None else mesh
        kw = dict(dtype=jnp.float64 if self.dtype == "float64"
                  else jnp.float32)
        if self.dim == 3:
            kw.setdefault("quad_degree", 4)
        kw.update(asm_kw)
        return NSAssembler(m, self.nu, **kw)

    def bcs(self, asm):
        return [DirichletBC.velocity(asm.W, self.noslip_markers(),
                                     _zero(self.dim)),
                DirichletBC.velocity(asm.W, [self.inflow_marker()],
                                     self.inflow_profile())]

    def solver(self, pcd: str = "BRM2", linearization: str = "picard",
               gmg_subsolves: bool = False, unsteady: Optional[float] = None,
               theta: float = 1.0, scheme: str = "theta", asm=None,
               hier=None, **config_overrides):
        """Build the solver.  ``gmg_subsolves`` equips velocity/Ap GMG
        hierarchies; ``unsteady=dt`` returns an UnsteadySolver
        (``scheme="bdf2"`` for the 2nd-order stepper).  To reuse a
        pre-built assembler on the GMG path, pass the hierarchy it was
        built on too: ``hier = p.mesh(gmg_levels=...); asm =
        p.assembler(hier.fine); p.solver(gmg_subsolves=True, asm=asm,
        hier=hier)`` (PressureHierarchy requires ``asm.mesh is
        hier.fine``)."""
        over = {"pcd.variant": pcd, "dtype": self.dtype}
        ap_h = v_h = None
        if gmg_subsolves:
            if hier is None:
                if asm is not None:
                    raise ValueError(
                        "gmg_subsolves with a user asm needs the hierarchy"
                        " it was built on: pass hier= as well (a fresh"
                        " hierarchy's fine mesh can never be the asm's)")
                hier = self.mesh(gmg_levels=self.level)
            asm = self.assembler(hier.fine) if asm is None else asm
            over.update({"velocity.method": "gmg", "pcd.ap.method": "gmg"})
            jdt = jnp.float64 if self.dtype == "float64" else jnp.float32
            marker = self.pcd_marker_for(pcd)
            ap_h = gmg.PressureHierarchy(
                hier, jdt, pcd_markers=[marker] if marker else (),
                fine_asm=asm)
            v_h = gmg.VelocityHierarchy(
                hier, self.nu, jdt,
                bc_markers=self.noslip_markers() + [self.inflow_marker()],
                fine_asm=asm)
        elif asm is None:
            asm = self.assembler()
        over.update(config_overrides)
        cfg = overrides(SolverConfig(), over)
        bcs = self.bcs(asm)
        if unsteady is not None:
            return UnsteadySolver(asm, bcs, cfg, dt=unsteady, theta=theta,
                                  scheme=scheme,
                                  linearization=linearization,
                                  enclosed=self.enclosed(),
                                  ap_hierarchy=ap_h, velocity_hierarchy=v_h)
        return NonlinearSolver(asm, bcs, cfg, linearization=linearization,
                               enclosed=self.enclosed(),
                               ap_hierarchy=ap_h, velocity_hierarchy=v_h)


@dataclasses.dataclass
class StepFlow2D(_ProblemBase):
    """2D backward-facing step (the reference demo; BASELINE config 1)."""
    length: float = 5.0

    def _base_mesh(self):
        return meshmod.backward_step_mesh(0, length=self.length)

    def inflow_profile(self):
        def f(x):
            v = np.zeros((x.shape[0], 2))
            v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
            return v
        return f


@dataclasses.dataclass
class LidDrivenCavity(_ProblemBase):
    """Lid-driven cavity (enclosed flow; BASELINE config 2)."""
    nu: float = 0.002            # Re = 500

    def _base_mesh(self):
        return meshmod.cavity_mesh(0)

    def enclosed(self):
        return True

    def inflow_profile(self):
        def lid(x):
            v = np.zeros((x.shape[0], 2))
            v[:, 0] = 1.0
            return v
        return lid


@dataclasses.dataclass
class Channel2D(_ProblemBase):
    """Straight channel (Poiseuille; unsteady workload of config 3)."""
    length: float = 4.0
    nu: float = 0.1

    def _base_mesh(self):
        return meshmod.channel_mesh(0, length=self.length)

    def inflow_profile(self):
        def f(x):
            v = np.zeros((x.shape[0], 2))
            v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
            return v
        return f


@dataclasses.dataclass
class ObstacleChannel2D(Channel2D):
    """Channel with a square obstacle (config 3 'channel/cylinder')."""
    length: float = 6.0
    nu: float = 0.02

    def _base_mesh(self):
        return meshmod.obstacle_channel_mesh(0, length=self.length)


@dataclasses.dataclass
class CylinderChannel2D(_ProblemBase):
    """Schäfer–Turek "flow around a cylinder" channel (DFG 2D-1/2D-2;
    the reference's unsteady demo geometry, BASELINE config 3).

    Snapped-circle mesh: each refinement projects new boundary vertices
    back onto the true circle (fem.mesh.snap_to_circle), so the polygonal
    geometry error converges with level.  ``u_mean`` sets the benchmark
    regime: 0.2 → Re=20 (2D-1 steady), 1.0 → Re=100 (2D-2 shedding), with
    nu fixed at 1e-3 per the benchmark definition.  Demo:
    ``demos/demo_cylinder.py``; recorded coefficients: ``results/``.
    """
    nu: float = 0.001
    u_mean: float = 0.2          # Ubar; peak = 1.5 * u_mean

    def _base_mesh(self):
        return meshmod.cylinder_channel_mesh(0)

    def snap(self):
        return meshmod.snap_to_circle

    def noslip_markers(self):
        return [meshmod.WALL, meshmod.CYLINDER]

    def inflow_profile(self):
        u_m = 1.5 * self.u_mean
        def f(x):
            v = np.zeros((x.shape[0], 2))
            v[:, 0] = 4.0 * u_m * x[:, 1] * (0.41 - x[:, 1]) / 0.41 ** 2
            return v
        return f


@dataclasses.dataclass
class StepFlow3D(_ProblemBase):
    """3D backward-facing step (BASELINE config 4)."""
    dim: int = 3
    nu: float = 0.05
    length: float = 3.0

    def _base_mesh(self):
        return mesh3d.backward_step_mesh3d(0, length=self.length)

    def inflow_profile(self):
        def f(x):
            v = np.zeros((x.shape[0], 3))
            v[:, 0] = 16.0 * x[:, 1] * (1 - x[:, 1]) * x[:, 2] * (1 - x[:, 2])
            return v
        return f


@dataclasses.dataclass
class Duct3D(StepFlow3D):
    """3D straight duct (3D validation workload)."""
    nu: float = 0.1
    length: float = 2.0

    def _base_mesh(self):
        return mesh3d.channel_mesh3d(0, length=self.length)
