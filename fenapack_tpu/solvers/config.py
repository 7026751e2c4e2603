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


@dataclasses.dataclass(frozen=True)
class KrylovConfig:
    rtol: float = 1e-8
    atol: float = 0.0
    maxiter: int = 100


@dataclasses.dataclass(frozen=True)
class PCDConfig:
    variant: str = "BRM2"                # BRM1 | BRM2
    ap: SubsolveConfig = SubsolveConfig(method="lu")
    # Jacobi-scaled P1 mass spectrum is mesh-uniform: contained in
    # [0.15, 2.5] for triangles and tets alike
    mp: SubsolveConfig = SubsolveConfig(method="chebyshev", iters=6,
                                        bounds=(0.15, 2.5))


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
