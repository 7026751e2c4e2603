"""Nested solver configuration with dotted-key overrides.

Replacement for the reference's PETSc options database with nested prefixes
(``fieldsplit_p_PCD_Ap_ksp_type`` etc., SURVEY.md section 5.6): every
sub-solver remains externally retunable — from code or from demo command
lines — without touching solver internals.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SubsolveConfig:
    """One inner solve (Ap, Mp, or the velocity block).

    methods:
      ``lu``        — exact dense factorization (validation scale, MG coarse)
      ``chebyshev`` — fixed-iteration Jacobi-Chebyshev (SPD operators)
      ``lumped``    — lumped (row-sum) diagonal inverse (mass matrices)
      ``gmg``       — geometric multigrid V-cycles (needs a mesh hierarchy)
    """
    method: str = "lu"
    iters: int = 10                      # chebyshev iterations / V-cycles
    bounds: Optional[Tuple[float, float]] = None   # spectral bounds override
    # gmg knobs
    smooth_iters: int = 2
    cycles: int = 1
    # gmg smoother: "jacobi" (SPD) | "minres" (nonsymmetric level operators
    # — required for the velocity block beyond Re ~ 1000, where damped
    # Jacobi diverges on convection-dominated levels)
    smoother: str = "jacobi"


@dataclasses.dataclass(frozen=True)
class KrylovConfig:
    rtol: float = 1e-8
    atol: float = 0.0
    maxiter: int = 100
    # mixed-precision IR round scheduling (OseenSolver.make_ir_solve):
    # a single f32 FGMRES round cannot reduce the TRUE residual by more
    # than ~eps_f32 * kappa regardless of how far its internal estimate
    # converges; ``ir_attainable`` is the assumed per-round attainable
    # true-residual reduction (learned online when a round falls short),
    # ``ir_safety`` the factor by which each round's estimate target
    # undershoots its true-reduction target to absorb estimate drift.
    ir_attainable: float = 3e-5
    ir_safety: float = 0.4
    # selective reorthogonalization threshold (0.0 = unconditional CGS2).
    # eta > 0 runs the second Gram-Schmidt pass only when the first
    # projection shrank |w| below eta * |w_pre| (Kahan-Parlett "twice is
    # enough"); each skipped pass saves the two O(m n) projection/update
    # ops — the dominant Krylov-algebra cost at 2D bench scale.
    # Default 0.707 (1/sqrt 2, the classic safe threshold), adopted after
    # the round-4 on-chip A/B at identical iteration counts (253 == 253):
    # Krylov algebra 3.89 -> 3.13 ms/iter (-19.5%), per-outer-iteration
    # 9.90 -> 9.13 ms, bench wall 2.50 -> 2.31 s
    # (results/r4_bench_eta{0,707}.json; doc/perf_analysis.md).
    reorth_eta: float = 0.707
    # GCRO-DR recycle-space dimension (0 = off): deflates the slowest
    # Krylov directions across IR rounds (same operator) and nonlinear
    # steps (nearby operator), removing the per-round Arnoldi startup cost
    recycle: int = 0
    # run operator assembly and the FGMRES solve as SEPARATE device
    # programs inside host-driven IR (OseenSolver.solve_ir): the
    # per-cell element-tensor einsums — the largest and worst
    # tile-padded HLO temps at 3D scale — never share a program with
    # the Krylov while_loop, and each wind assembles once instead of
    # once per IR round.  The production setting for near-HBM-capacity
    # problems (BASELINE config 4, 2.05M dofs).
    split_assembly: bool = False
    # evaluate the OUTER system matvec (w = A z, once per FGMRES iteration)
    # with the high-precision (f64) operator while the preconditioner and
    # Krylov algebra stay f32: raises the per-round attainable true-residual
    # reduction, cutting IR rounds.  Cost: one emulated-f64 SpMV per
    # iteration (small vs the GMG preconditioner apply).
    hi_matvec: bool = False
    # run the ENTIRE outer FGMRES algebra (Krylov basis, CGS2, Givens,
    # residual estimate) in f64 with only the preconditioner apply in
    # compute precision: the residual estimate is then trusted to 1e-8
    # directly, collapsing mixed-precision IR to a single round — measured
    # to restore exact-solve (oracle) outer iteration counts that the f32
    # estimate floor otherwise inflates by ~15%.  Cost: emulated-f64 SpMV +
    # basis algebra per iteration.
    hi_krylov: bool = False
    # compute the PER-STEP element integrals of the high-precision operator
    # (convection, Newton reaction) in f32 and cast up: emulated-f64 element
    # einsums dominate the per-step wall on TPU, and a 1e-7-perturbed
    # integral is still a consistent discrete operator (matvec, true
    # residual, and PC all read the same values).  Constant integrals
    # (nu L, mass) remain exact f64.
    hi_ops_f32: bool = True
    # ALSO run the nonlinear/IR true-RESIDUAL's convection integrals in f32
    # (fem.assemble.NSAssembler.residual compute32).  Distinct from
    # hi_ops_f32 because the residual sets the attainable nonlinear floor
    # (~1e-7 relative with f32 integrals): keep False when converging past
    # 1e-8 (e.g. Newton quadratic-decay validation); turn ON for
    # HBM-capacity problems — at 2M dofs the emulated-f64 einsum
    # temporaries inside the residual program are what RESOURCE_EXHAUSTs
    # the 16 GB chip (rtol_nl 1e-5 production targets are unaffected).
    hi_res_f32: bool = False
    # evaluate the hi-precision matvec with the double-single compensated
    # Pallas BSR kernel (ops.pallas_spmv.DF32BlockSpMV): pure-f32 VPU
    # arithmetic reproducing the emulated-f64 block matvec to ~1e-12 —
    # replaces the dominant per-iteration cost of hi_krylov/hi_matvec.
    # Requires block patterns assembled with hi_block=True (the f64
    # operators share the block layout).
    df32_matvec: bool = False
    # hi_krylov basis/CGS2 algebra in double-single (two-f32) compensated
    # storage (solvers/krylov.py::fgmres_ds): same residual-estimate honesty
    # as the f64 path at pure-f32 VPU cost — the dense-algebra analogue of
    # df32_matvec.  Ignored when recycling is on.
    ds_basis: bool = False


@dataclasses.dataclass(frozen=True)
class PCDConfig:
    variant: str = "BRM2"                # BRM1 | BRM2
    ap: SubsolveConfig = SubsolveConfig(method="lu")
    # Jacobi-scaled P1 mass spectrum is mesh-uniform (Wathen's bounds):
    # [1/2, 2] on triangles, [1/2, 5/2] on tets — measured exactly [0.5, 2]
    # on our 2D meshes.  (0.5, 2.5) covers both; tighter than the old
    # (0.15, 2.5), whose wasted interval made Chebyshev-6 ~16x less
    # accurate and cost outer iterations (cavity parity test).
    # 4 iterations at the tight bounds (min-max residual 4.3e-2) already
    # reproduce-or-beat oracle outer counts (measured: step2d l0 BRM1
    # 406@4 vs 411@6, BRM2 304@4 == oracle, l1 301@4 vs 302@6) — and save
    # two Mp SpMVs per PCD apply
    mp: SubsolveConfig = SubsolveConfig(method="chebyshev", iters=4,
                                        bounds=(0.5, 2.5))


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    krylov: KrylovConfig = KrylovConfig()
    pcd: PCDConfig = PCDConfig()
    velocity: SubsolveConfig = SubsolveConfig(method="lu")
    dtype: str = "float64"
    # add SUPG streamline diffusion to the *preconditioner* velocity
    # operator (the reference demo's separate J_pc form with
    # StabilizationParameterSD); the system operator stays unstabilized
    jpc_supg: bool = False
    # SUPG-stabilize the SYSTEM (residual + Picard operator): BASELINE
    # config 5 (Re 2000-5000) — the unstabilized Galerkin system is
    # oscillatory at cell-Peclet >> 1 and no subsolve quality saves the
    # outer Krylov (measured).  Implies stabilized PC operators too.
    system_supg: bool = False


def override(cfg: Any, key: str, value: Any) -> Any:
    """Return a copy of ``cfg`` with dotted ``key`` replaced, e.g.
    ``override(cfg, "pcd.ap.iters", 20)`` — the moral equivalent of
    ``-fieldsplit_p_PCD_Ap_ksp_max_it 20`` in the reference."""
    head, _, rest = key.partition(".")
    if rest:
        sub = override(getattr(cfg, head), rest, value)
        return dataclasses.replace(cfg, **{head: sub})
    return dataclasses.replace(cfg, **{head: value})


def overrides(cfg: Any, mapping: dict) -> Any:
    for k, v in mapping.items():
        cfg = override(cfg, k, v)
    return cfg


def env_overrides(cfg: Any) -> Any:
    """Apply ``FENAPACK_CFG`` — comma-separated dotted ``key=value`` pairs
    (values through ast.literal_eval, else kept as strings), e.g.
    ``FENAPACK_CFG=krylov.hi_krylov=True,krylov.maxiter=60``.  The demo
    drivers call this LAST, so campaign scripts can A/B any solver knob
    without editing driver code (the moral equivalent of the reference's
    PETSc option database on the command line)."""
    import ast
    import os
    spec = os.environ.get("FENAPACK_CFG", "")
    for item in filter(None, (s.strip() for s in spec.split(","))):
        k, _, v = item.partition("=")
        try:
            val = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            val = v
        cfg = override(cfg, k.strip(), val)
    return cfg
