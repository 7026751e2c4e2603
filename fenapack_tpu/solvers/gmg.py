"""Geometric multigrid for the PCD subsolves and the velocity block.

TPU-native replacement for the AMG the reference obtains from PETSc/hypre
(``-fieldsplit_u_pc_type hypre`` / Richardson+AMG inner KSPs, SURVEY.md
section 2.2 item 4).  On TPU we own the mesh (fenapack_tpu.fem.mesh builds
hierarchies by uniform refinement with parent tracking), so *geometric* MG
with re-discretized coarse operators replaces algebraic setup entirely:

  * P1 prolongation is a two-parent gather ``e_f[i] = mean(e_c[parents[i]])``
    (fine vertices are edge midpoints or surviving coarse vertices);
    restriction is its transpose (two scatter-adds).  No sparse matrices.
  * The P2 velocity hierarchy uses the identity  *P2 dofs on mesh M =
    vertices of refine(M)*: wind transfer fine->coarse is a slice
    (injection), and P2 prolongation needs only per-fine-edge basis weights
    precomputed on the host.
  * Coarse operators are re-discretized per level.  For the (wind-dependent)
    velocity block this happens inside jit via each level's assembler, so a
    V-cycle preconditioner re-tunes itself to the current nonlinear iterate
    with zero host round-trips — the structural advantage over the
    reference, which must re-run AMG setup per Newton step.
  * Smoother: damped Jacobi (fixed iterations — static control flow);
    Chebyshev-Jacobi on the SPD pressure levels.  Coarse solve: dense LU.

V-cycles here are *preconditioners* inside flexible GMRES, matching the
reference's usage (inner Richardson+AMG at fixed iteration counts).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fem import mesh as meshmod
from ..fem.mesh import TriMesh
from ..ops.sparse import ELL
from ..ops import subsolve
from .config import SubsolveConfig


# --------------------------------------------------------------------- #
# hierarchy construction
# --------------------------------------------------------------------- #

@dataclasses.dataclass
class MeshHierarchy:
    """Coarse-to-fine chain of meshes produced by uniform refinement.

    ``parents[l]`` maps level-(l+1) vertices to their two level-l parent
    vertices (equal entries for surviving coarse vertices).
    """
    meshes: List[TriMesh]           # [coarse, ..., fine]
    parents: List[np.ndarray]       # len = levels - 1

    @property
    def fine(self) -> TriMesh:
        return self.meshes[-1]


def build_hierarchy(coarse, levels: int, snap=None) -> MeshHierarchy:
    """Refine ``coarse`` ``levels`` times; finest mesh is the problem mesh.
    Dispatches on mesh dimension (TriMesh 1:4 red / TetMesh 1:8 red).

    ``snap(mesh)``, if given, is applied to each refined mesh in place —
    used by curved-boundary domains (mesh.snap_to_circle for the
    Schafer-Turek cylinder) to project new boundary vertices back onto the
    true geometry so the polygonal boundary converges with refinement.
    The (1/2, 1/2) parent interpolation stencil is kept as the transfer
    even for snapped vertices: velocity dofs there are Dirichlet (masked
    by the smoothers) and for free pressure dofs the perturbation is an
    O(h^2) preconditioner-only inexactness."""
    if coarse.vertices.shape[1] == 3:
        from ..fem.mesh3d import refine_uniform3d as refine
    else:
        refine = meshmod.refine_uniform
    meshes = [coarse]
    parents = []
    for _ in range(levels):
        fine, par = refine(meshes[-1])
        if snap is not None:
            snap(fine)
        meshes.append(fine)
        parents.append(par)
    return MeshHierarchy(meshes=meshes, parents=parents)


# --------------------------------------------------------------------- #
# P1 transfer operators (pressure space / any vertex-based field)
# --------------------------------------------------------------------- #

def _maybe_block_pattern(rows, cols, n_rows, n_cols, block):
    """Block transfer pattern, or None when its byte cost is pathological
    (callers then keep the gather transfer path).

    ops.sparse.block_layout_ok policy, but at COLD budget (scale 0.05 =
    50 MB at the default 1 GB base): transfers run once per V-cycle level,
    so the gather cost is noise next to the smoothers — while their tiles
    are the worst-filled buffers in the whole solver (coarse block rows
    gathering scattered fine columns lose block locality with scale).
    Measured at the 2.05M-dof config-4 shape (scripts/mem_audit3d.py,
    round 3): the materialized fine-level P2 restriction alone was
    (10747, 8, 2328) = 800 MB (m=291 neighbor blocks) and the matching
    prolongation 775 MB — 1.6 GB of the 16 GB HBM for two cold operators,
    a leading term of the RESOURCE_EXHAUSTED at that scale.  At the
    default scale=1.0 budget both PASSED (<= 1e9); the cold budget evicts
    them to the few-MB gather stencils.
    """
    from ..ops.sparse import BlockSparsityPattern, block_layout_ok
    import os
    scale = float(os.environ.get("FENAPACK_TRANSFER_BLOCK_SCALE", "0.05"))
    pat = BlockSparsityPattern(rows, cols, n_rows, n_cols, block=block)
    return pat if block_layout_ok(pat, scale=scale) else None


class P1Transfer:
    """Prolongation/restriction between two P1 levels from parent pairs.

    With ``block_size`` the transfers are materialized as block-sparse
    matrices (ops.sparse.BlockSparsityPattern): arbitrary gathers/scatters
    are scalar-slow on TPU, while block-tile SpMV rides the MXU.
    """

    def __init__(self, parents: np.ndarray, n_coarse: int, dtype,
                 block_size=None, rank_fine=None, rank_coarse=None):
        nf = parents.shape[0]
        pa = parents[:, 0].astype(np.int64)
        pb = parents[:, 1].astype(np.int64)
        if rank_fine is not None or rank_coarse is not None:
            # RCM-relabeled levels (block-sparse layouts at scale): the
            # stencil arrays are indexed by NEW fine ids and reference NEW
            # coarse ids — the transfer formulas below are unchanged
            rf = (np.asarray(rank_fine) if rank_fine is not None
                  else np.arange(nf))
            rc = (np.asarray(rank_coarse) if rank_coarse is not None
                  else np.arange(n_coarse))
            pa_r = np.empty(nf, dtype=np.int64)
            pb_r = np.empty(nf, dtype=np.int64)
            pa_r[rf] = rc[pa]
            pb_r[rf] = rc[pb]
            pa, pb = pa_r, pb_r
        self.pa = jnp.asarray(pa.astype(np.int32))
        self.pb = jnp.asarray(pb.astype(np.int32))
        self.n_coarse = n_coarse
        self.n_fine = nf
        self.dtype = dtype
        self._P = self._PT = None
        if block_size:
            rows = np.arange(nf, dtype=np.int64).repeat(2)
            cols = np.stack([pa, pb], axis=1).ravel()
            vals = jnp.full(2 * nf, 0.5, dtype=dtype)
            pat = _maybe_block_pattern(rows, cols, nf, n_coarse,
                                       block_size)
            self._P = pat.assemble(vals) if pat is not None else None
            patT = _maybe_block_pattern(cols, rows, n_coarse, nf,
                                        block_size)
            self._PT = patT.assemble(vals) if patT is not None else None

    def prolong(self, xc: jnp.ndarray) -> jnp.ndarray:
        if self._P is not None:
            return self._P.mv(xc)
        return 0.5 * (xc[self.pa] + xc[self.pb])

    def restrict(self, rf: jnp.ndarray) -> jnp.ndarray:
        if self._PT is not None:
            return self._PT.mv(rf)
        z = jnp.zeros(self.n_coarse, dtype=rf.dtype)
        z = z.at[self.pa].add(0.5 * rf)
        return z.at[self.pb].add(0.5 * rf)


# --------------------------------------------------------------------- #
# generic V-cycle over static level lists
# --------------------------------------------------------------------- #

def _jacobi_smooth(matvec, dinv, omega, iters, b, x):
    for _ in range(iters):
        x = x + omega * dinv * (b - matvec(x))
    return x


def _minres_smooth(matvec, dinv, iters, b, x):
    """Minimal-residual (GMRES-polynomial) smoother, statically unrolled.

    Builds the Jacobi-preconditioned Krylov directions z_i = (D^{-1}A)^i
    D^{-1} r and picks the combination minimizing ||r - A Z y|| via the
    (iters x iters) normal equations — a robust smoother for CONVECTION-
    DOMINATED (nonsymmetric) level operators, where damped Jacobi with a
    fixed omega amplifies characteristic modes and the velocity V-cycle
    diverges (observed: outer FGMRES hits maxiter at Re ~ 2000).  Same
    matvec count as iters+? Jacobi sweeps; the small dense solve is free.
    Reference analogue: smoother KSPs inside PETSc PCMG (often GMRES).
    """
    r = b - matvec(x)
    z = dinv * r
    Zs, Ws = [], []
    for _ in range(iters):
        w = matvec(z)
        Zs.append(z)
        Ws.append(w)
        z = dinv * w
    W = jnp.stack(Ws)                         # (s, n)
    Z = jnp.stack(Zs)
    with jax.default_matmul_precision("highest"):
        G = W @ W.T                           # (s, s) Gram
        c = W @ r
        # ridge: keeps the tiny solve finite when directions degenerate
        lam = 1e-7 * jnp.trace(G) / G.shape[0] + 1e-30
        y = jnp.linalg.solve(G + lam * jnp.eye(G.shape[0], dtype=G.dtype), c)
        x = x + Z.T @ y
    return x


def make_vcycle(matvecs: Sequence[Callable], dinvs: Sequence[jnp.ndarray],
                transfers: Sequence, coarse_solve: Callable,
                masks: Sequence[Optional[jnp.ndarray]],
                smooth_iters: int = 2, omega: float = 0.67,
                cycles: int = 1, smoother: str = "jacobi") -> Callable:
    """Compose a fixed-shape V-cycle preconditioner ``solve(b) -> x``.

    ``matvecs``/``dinvs``/``masks`` are per level coarse->fine
    (len L); ``transfers`` connect consecutive levels (len L-1).
    ``masks`` chop Dirichlet rows of restricted residuals (1.0 = pinned).
    ``smoother``: "jacobi" (SPD operators) or "minres" (nonsymmetric /
    convection-dominated, see :func:`_minres_smooth`).
    """
    L = len(matvecs)

    def smooth(mv, dinv, b, x):
        if smoother == "minres":
            return _minres_smooth(mv, dinv, smooth_iters, b, x)
        return _jacobi_smooth(mv, dinv, omega, smooth_iters, b, x)

    def chop(x, lvl):
        m = masks[lvl]
        return x * (1.0 - m) if m is not None else x

    def cycle(lvl: int, b: jnp.ndarray) -> jnp.ndarray:
        if lvl == 0:
            return coarse_solve(b)
        mv, dinv = matvecs[lvl], dinvs[lvl]
        t = transfers[lvl - 1]
        x = smooth(mv, dinv, b, jnp.zeros_like(b))
        r = chop(b - mv(x), lvl)
        ec = cycle(lvl - 1, chop(t.restrict(r), lvl - 1))
        x = x + chop(t.prolong(ec), lvl)
        return smooth(mv, dinv, b, x)

    def solve(b: jnp.ndarray) -> jnp.ndarray:
        x = cycle(L - 1, b)
        for _ in range(cycles - 1):
            # extra cycles as stationary iteration
            r = b - matvecs[L - 1](x)
            x = x + cycle(L - 1, r)
        return x
    return solve


# --------------------------------------------------------------------- #
# pressure (Ap) GMG
# --------------------------------------------------------------------- #

class _PLevel:
    """One pressure-hierarchy level (asm, Ap, mask).

    A CLASS rather than a tuple so the per-level ``mask`` array lives on an
    object attribute: ``runtime.lift_jit`` can only swap attribute sites, and
    a bare device array inside a mixed tuple inlines into the serialized
    program as a frozen literal (the VERDICT r3 #8 warning on the cylinder
    path — ``levels[l][2]`` was exactly this).  Iterates/indexes like the
    old tuple so existing unpacking call sites are unchanged.
    """

    def __init__(self, asm, Ap, mask):
        self.asm, self.Ap, self.mask = asm, Ap, mask

    def __iter__(self):
        return iter((self.asm, self.Ap, self.mask))

    def __getitem__(self, i):
        return (self.asm, self.Ap, self.mask)[i]


class PressureHierarchy:
    """Per-level pressure stiffness + transfer, for the Ap subsolve.

    ``pcd_markers``: facet markers whose P1 dofs are Dirichlet-pinned on
    every level (the pcd BC rows); may be empty (enclosed flow — the caller
    handles nullspace projection around the V-cycle).
    """

    def __init__(self, hier: MeshHierarchy, dtype,
                 pcd_markers: Sequence[int] = (),
                 fine_n1: Optional[int] = None,
                 block_size: Optional[int] = None,
                 reorder: bool = False, fine_asm=None):
        from ..fem.assemble import NSAssembler     # cycle-free at runtime
        self.hier = hier
        self.dtype = dtype
        self.levels = []
        self.transfers = []
        self.fine_n1 = fine_n1
        self.reorder = reorder
        self.pcd_markers = tuple(pcd_markers)
        if fine_asm is not None:
            # reuse the solver's assembler at the (dominant) fine level —
            # a fresh full NSAssembler there re-derives every P2/div
            # pattern + constant this hierarchy never reads (measured 30s
            # of the 47s PressureHierarchy build at 761k dofs)
            if fine_asm.mesh is not hier.fine:
                raise ValueError("fine_asm was built on a different mesh")
            fa_reorder = getattr(fine_asm.W.Q, "rank", None) is not None
            if fa_reorder != reorder:
                raise ValueError(
                    f"fine_asm reorder={fa_reorder} but hierarchy "
                    f"reorder={reorder} — orderings must match")
            if fine_asm.row_align != 1:
                raise ValueError("fine_asm with row alignment padding "
                                 "cannot seed the hierarchy fine level")
        q_ranks = []
        L = len(hier.meshes)
        for l, mesh in enumerate(hier.meshes):
            # reorder=True: per-level RCM relabeling (block-sparse layouts
            # at scale); the transfers compose with the level ranks
            if fine_asm is not None and l == L - 1:
                asm = fine_asm
            else:
                # p1_only: the hierarchy reads exactly pat_p1 + Ap (+Mp);
                # a full NSAssembler per level was 3.5+ GB of dead P2/div
                # residency at the 2.05M config-4 scale
                asm = NSAssembler(mesh, nu=1.0, dtype=dtype, quad_degree=2,
                                  block_size=block_size, reorder=reorder,
                                  p1_only=True)
            Ap = asm.const.Ap.with_vals(asm.const.Ap.vals.astype(dtype))
            dofs = (asm.W.Q.facet_dofs(list(pcd_markers)) if pcd_markers
                    else np.empty(0, dtype=int))
            if dofs.size:
                m = np.zeros(asm.n1)
                m[dofs] = 1.0
                mask = jnp.asarray(m, dtype=dtype)
            else:
                # markers absent on this mesh == pure Neumann (an all-zero
                # mask would send a SINGULAR operator to the masked dense
                # coarse solve)
                mask = None
            self.levels.append(_PLevel(asm, Ap, mask))
            q_ranks.append(np.asarray(asm.W.Q.rank) if reorder else None)
            if l > 0:
                self.transfers.append(P1Transfer(
                    hier.parents[l - 1], hier.meshes[l - 1].num_vertices,
                    dtype, block_size=block_size,
                    rank_fine=q_ranks[l], rank_coarse=q_ranks[l - 1]))


def make_gmg_solver(hierarchy: PressureHierarchy, cfg: SubsolveConfig,
                    dtype, bc_mask: Optional[jnp.ndarray] = None) -> Callable:
    """Ap^{-1} approximation via V-cycles on the pressure hierarchy.

    The Dirichlet (pcd BC) rows come from the hierarchy's own
    ``pcd_markers`` — per level, not just the fine grid.  ``bc_mask`` (the
    caller's fine-level pinned mask) is accepted for interface symmetry but
    NOT consulted; OseenSolver validates marker consistency at setup
    instead.  Fine vectors may be longer than the hierarchy's fine space
    (alignment padding) — padded entries pass through as identity.
    """
    matvecs, dinvs, masks = [], [], []
    for (asm, Ap, mask) in hierarchy.levels:
        if mask is not None:
            free = 1.0 - mask
            mv = (lambda A, fr, mk: lambda x: fr * A.mv(fr * x) + mk * x)(
                Ap, free, mask)
            diag = Ap.diag_from(asm.pat_p1.diag_pos)
            diag = jnp.where(mask > 0, 1.0, diag)
        else:
            mv = Ap.mv
            diag = Ap.diag_from(asm.pat_p1.diag_pos)
        matvecs.append(mv)
        dinvs.append(1.0 / diag)
        masks.append(mask)

    asm0, Ap0, mask0 = hierarchy.levels[0]
    # dense coarse operator built ON DEVICE (a scipy export would fetch
    # device values: the first d2h transfer costs 30-500 s via the tunnel).
    # Past FENAPACK_GMG_DENSE_MAX the explicit inverse is infeasible (HBM
    # quadratic; LU panels overflow scoped VMEM at AOT compile) — fall back
    # to a Chebyshev coarse solve with measured Jacobi-scaled bounds (the
    # coarse operator is SPD, so Chebyshev is the right iterative solve).
    dense_cap = int(os.environ.get("FENAPACK_GMG_DENSE_MAX", "8192"))
    if Ap0.shape[0] > dense_cap:
        lmin, lmax = subsolve.power_bounds(matvecs[0], dinvs[0],
                                           Ap0.shape[0], dtype=dtype)
        coarse = subsolve.chebyshev_solver(matvecs[0], dinvs[0], lmin, lmax,
                                           iters=max(16, 4 * cfg.smooth_iters))
    elif mask0 is None:
        # enclosed flow: regularize the singular coarse Neumann operator
        A = asm0.pat_p1.to_dense(Ap0.vals).astype(dtype)
        A = A + 1.0 / A.shape[0]                    # rank-1 constant shift
        coarse = subsolve.dense_lu_solver(A)
    else:
        coarse = subsolve.masked_spd_solver_dense(Ap0, asm0.pat_p1, mask0,
                                                  dtype)

    vcycle = make_vcycle(matvecs, dinvs, hierarchy.transfers, coarse, masks,
                         smooth_iters=cfg.smooth_iters, cycles=cfg.cycles)

    n_hier = hierarchy.levels[-1][1].shape[0]

    def solve(b: jnp.ndarray) -> jnp.ndarray:
        bh = b[:n_hier]
        xh = vcycle(bh)
        if b.shape[0] == n_hier:
            return xh
        # alignment padding: identity on the padded tail
        return jnp.concatenate([xh, b[n_hier:]])
    return solve


# --------------------------------------------------------------------- #
# velocity block GMG (P2 vector field, wind-dependent operator)
# --------------------------------------------------------------------- #

class P2Transfer:
    """P2 scalar-field transfer between consecutive meshes (2D and 3D).

    Uses the identity ``P2 dofs on coarse mesh == vertices of fine mesh``:
    the first ``nv_f`` fine P2 dofs (fine vertices) coincide geometrically
    with the coarse P2 dofs (injection/identity); each fine *edge midpoint*
    dof is interpolated with the coarse P2 basis values (6 in 2D / 10 in 3D)
    of its parent cell, precomputed on the host.
    """

    def __init__(self, coarse, fine, dtype, block_size=None,
                 rank_fine=None, rank_coarse=None):
        d = coarse.vertices.shape[1]
        nv_f, ne_f = fine.num_vertices, fine.num_edges
        self.n_coarse = coarse.num_vertices + coarse.num_edges   # == nv_f
        assert self.n_coarse == nv_f, "fine mesh must be refine(coarse)"
        self.n_fine = nv_f + ne_f
        self._block_size = block_size

        # parent coarse cell of each fine cell: refinement emits the child
        # blocks contiguously (4 in 2D / 8 in 3D), each of length nc_coarse
        nc_c = coarse.num_cells
        n_children = 4 if d == 2 else 8
        child_parent = np.tile(np.arange(nc_c, dtype=np.int64), n_children)

        # fine edge -> one incident fine cell -> parent coarse cell
        n_loc_edges = fine.cell_edges.shape[1]
        fe_cell = np.full(ne_f, -1, dtype=np.int64)
        for k in range(n_loc_edges):
            fe_cell[fine.cell_edges[:, k]] = np.arange(fine.num_cells)
        parent = child_parent[fe_cell]

        # midpoint reference coords in the parent coarse cell
        mids = 0.5 * (fine.vertices[fine.edges[:, 0]]
                      + fine.vertices[fine.edges[:, 1]])
        v = coarse.vertices[coarse.cells[parent]]        # (ne_f, d+1, d)
        J = np.stack([v[:, i + 1] - v[:, 0] for i in range(d)], axis=2)
        ref = np.linalg.solve(J, (mids - v[:, 0])[..., None])[..., 0]
        if d == 2:
            from ..fem.elements import p2_basis
        else:
            from ..fem.elements3d import p2_basis
        phi, _ = p2_basis(ref)                           # (ne_f, nb2)
        nb2 = phi.shape[1]

        nv_c = coarse.num_vertices
        cdofs = np.concatenate([coarse.cells[parent],
                                nv_c + coarse.cell_edges[parent]], axis=1)

        self._relabeled = rank_fine is not None or rank_coarse is not None
        rf = (np.asarray(rank_fine) if rank_fine is not None
              else np.arange(self.n_fine))
        rc = (np.asarray(rank_coarse) if rank_coarse is not None
              else np.arange(self.n_coarse))
        if self._relabeled:
            # explicit prolongation stencils indexed by NEW fine ids:
            # surviving vertices get an identity entry, midpoints the
            # coarse-basis weights; inject is a plain gather
            Pcols = np.zeros((self.n_fine, nb2), dtype=np.int64)
            Pw = np.zeros((self.n_fine, nb2))
            Pcols[rf[:nv_f], 0] = rc[np.arange(nv_f)]
            Pw[rf[:nv_f], 0] = 1.0
            Pcols[rf[nv_f:]] = rc[cdofs]
            Pw[rf[nv_f:]] = phi
            self._Pcols = jnp.asarray(Pcols.astype(np.int32))
            self._Pw = jnp.asarray(Pw, dtype=dtype)
            inj = np.empty(self.n_coarse, dtype=np.int64)
            inj[rc[np.arange(nv_f)]] = rf[:nv_f]
            self._inj = jnp.asarray(inj.astype(np.int32))
        else:
            self.mid_dofs = jnp.asarray(cdofs.astype(np.int32))  # (ne_f,nb2)
            self.mid_w = jnp.asarray(phi, dtype=dtype)

        self._P = self._PT = None
        if self._block_size:
            # materialize P as block-sparse (TPU: tile SpMV >> gathers):
            # identity rows for fine vertices + basis-weight midpoint rows
            nc = self.n_coarse
            rows = np.concatenate([rf[:nv_f].astype(np.int64),
                                   rf[nv_f:].astype(np.int64).repeat(nb2)])
            cols = np.concatenate([rc[np.arange(nv_f)].astype(np.int64),
                                   rc[cdofs].astype(np.int64).ravel()])
            vals = jnp.concatenate([jnp.ones(nv_f, dtype),
                                    jnp.asarray(phi, dtype).ravel()])
            pat = _maybe_block_pattern(rows, cols, self.n_fine, nc,
                                       self._block_size)
            self._P = pat.assemble(vals) if pat is not None else None
            patT = _maybe_block_pattern(cols, rows, nc, self.n_fine,
                                        self._block_size)
            self._PT = patT.assemble(vals) if patT is not None else None

    def prolong(self, xc: jnp.ndarray) -> jnp.ndarray:
        if self._P is not None:
            return self._P.mv(xc)
        if self._relabeled:
            return jnp.sum(self._Pw * xc[self._Pcols], axis=1)
        mid = jnp.sum(self.mid_w * xc[self.mid_dofs], axis=1)
        return jnp.concatenate([xc, mid])

    def restrict(self, rf: jnp.ndarray) -> jnp.ndarray:
        if self._PT is not None:
            return self._PT.mv(rf)
        if self._relabeled:
            z = jnp.zeros(self.n_coarse, rf.dtype)
            return z.at[self._Pcols].add(self._Pw * rf[:, None])
        z = rf[:self.n_coarse]
        upd = self.mid_w * rf[self.n_coarse:, None]
        return z.at[self.mid_dofs].add(upd)

    def inject(self, xf: jnp.ndarray) -> jnp.ndarray:
        """Fine P2 -> coarse P2 by point evaluation (for the wind)."""
        if self._relabeled:
            return xf[self._inj]
        return xf[:self.n_coarse]


class VelocityHierarchy:
    """Per-level assemblers + P2 transfers + Dirichlet masks for the
    velocity convection-diffusion block.

    ``bc_markers``: facet markers carrying velocity Dirichlet BCs (values
    are irrelevant — MG solves error equations with zero BCs).
    """

    def __init__(self, hier: MeshHierarchy, nu: float, dtype,
                 bc_markers: Sequence[int] = (), fine_asm=None,
                 block_size: Optional[int] = None,
                 reorder: Optional[bool] = None):
        from ..fem.assemble import NSAssembler
        self.hier = hier
        self.nu = nu
        self.dtype = dtype
        self.asms = []
        self.masks = []          # scalar-space masks (n2,)
        self.masks_np = []       # host copies (trace-safe: the jnp masks
                                 # get lifted to jit arguments, so reading
                                 # them at trace time yields tracers)
        self.transfers = []
        if reorder is None:
            reorder = (fine_asm is not None
                       and bool(getattr(fine_asm.W, "reorder", False)))
        if fine_asm is not None and bool(
                getattr(fine_asm.W, "reorder", False)) != reorder:
            raise ValueError(
                "velocity GMG ordering mismatch: fine_asm reorder="
                f"{getattr(fine_asm.W, 'reorder', False)} but hierarchy "
                f"reorder={reorder}")
        self.reorder = reorder
        v_ranks = []
        last = len(hier.meshes) - 1
        for l, mesh in enumerate(hier.meshes):
            if l == last and fine_asm is not None:
                asm = fine_asm          # the solver's own (maybe padded) asm
            else:
                asm = NSAssembler(mesh, nu=nu, dtype=dtype, quad_degree=4,
                                  block_size=block_size, reorder=reorder)
            self.asms.append(asm)
            v_ranks.append(np.asarray(asm.W.V.rank) if reorder else None)
            m = np.zeros(asm.n2)
            if bc_markers:
                m[asm.W.V.facet_dofs(list(bc_markers))] = 1.0
            self.masks.append(jnp.asarray(m, dtype=dtype))
            self.masks_np.append(m)
            if l > 0:
                self.transfers.append(P2Transfer(
                    hier.meshes[l - 1], mesh, dtype, block_size=block_size,
                    rank_fine=v_ranks[l], rank_coarse=v_ranks[l - 1]))


class PCoarseTransfer:
    """P1 <-> P2 embedding on ONE mesh (p-coarsening bottom level).

    ``prolong`` is the finite-element interpolation of a P1 function into
    the P2 space on the same mesh (vertex dofs copy, edge-midpoint dofs
    average their edge's endpoints); ``restrict`` is its transpose.  Used
    when a hierarchy's BASE mesh is already too large for a dense coarse
    solve (the DFG cylinder: resolving the circle puts ~18.6k P2 velocity
    dofs on level 0, over FENAPACK_GMG_DENSE_MAX) — the P1 space of the
    same mesh is 4x smaller, bringing back an exact (dense-inverse) bottom
    solve.  Measured effect on DFG 2D-1 l0 Newton outer counts (CPU f64):
    622 total with the minres-sweep coarse fallback vs 186 oracle; the
    weak bottom solve was the entire gap (scripts/tune_cylinder.py:
    exact-Ap/strong-Ap/Mp changes moved nothing, velocity-only 4x4 GMG
    still 467).
    """

    def __init__(self, W, dtype):
        mesh = W.mesh
        nv, ne = mesh.num_vertices, mesh.num_edges
        self.n_coarse = W.Q.dim
        self.n_fine = W.V.dim
        v_ids = np.asarray(W.V.vertex_dofs(), dtype=np.int64)
        rankV = getattr(W.V, "rank", None)
        e_old = nv + np.arange(ne)
        e_ids = np.asarray(rankV)[e_old] if rankV is not None else e_old
        q_of_v = (np.asarray(W.Q.rank, dtype=np.int64)
                  if hasattr(W.Q, "rank") else np.arange(nv, dtype=np.int64))
        IA = np.zeros(self.n_fine, dtype=np.int64)
        IB = np.zeros(self.n_fine, dtype=np.int64)
        IA[v_ids] = q_of_v
        IB[v_ids] = q_of_v
        IA[e_ids] = q_of_v[mesh.edges[:, 0]]
        IB[e_ids] = q_of_v[mesh.edges[:, 1]]
        # one 0.5 weight per index slot: vertex rows hit the same P1 dof
        # twice (0.5 + 0.5 = identity), edge rows average their endpoints
        self._IA = jnp.asarray(IA.astype(np.int32))
        self._IB = jnp.asarray(IB.astype(np.int32))

    def prolong(self, xc):
        return 0.5 * (xc[self._IA] + xc[self._IB])

    def restrict(self, rf):
        rw = 0.5 * rf
        z = jnp.zeros(self.n_coarse, rf.dtype)
        return z.at[self._IA].add(rw).at[self._IB].add(rw)


class _VectorTransfer:
    """Lift a scalar P2 transfer to the stacked [u_0; ...; u_{d-1}] layout.

    ``n2c``/``n2f`` are the (possibly alignment-padded) per-component sizes;
    the scalar transfer acts on the leading real dofs, padding stays zero.
    """

    def __init__(self, t: P2Transfer, n2c: int, n2f: int, d: int = 2):
        self.t = t
        self.n2c, self.n2f = n2c, n2f
        self.d = d

    def _pad(self, x, n):
        return jnp.pad(x, (0, n - x.shape[0])) if n > x.shape[0] else x

    def prolong(self, xc):
        comps = [xc[a * self.n2c:(a + 1) * self.n2c][:self.t.n_coarse]
                 for a in range(self.d)]
        return jnp.concatenate([self._pad(self.t.prolong(c), self.n2f)
                                for c in comps])

    def restrict(self, rf):
        comps = [rf[a * self.n2f:(a + 1) * self.n2f][:self.t.n_fine]
                 for a in range(self.d)]
        return jnp.concatenate([self._pad(self.t.restrict(c), self.n2c)
                                for c in comps])


def _velocity_gmg_plan(vh: VelocityHierarchy, d: int):
    """(use_pcoarse, use_dense_coarse) — the bottom-level strategy, shared
    by the assembly half and the closure half of the velocity V-cycle so a
    split-program build agrees with the fused one."""
    asm0 = vh.asms[0]
    dense_cap = int(os.environ.get("FENAPACK_GMG_DENSE_MAX", "8192"))
    pcoarse = (d * asm0.n2 > dense_cap >= d * asm0.n1
               and os.environ.get("FENAPACK_GMG_PCOARSE", "1") == "1")
    dense = (not pcoarse) and d * asm0.n2 <= dense_cap
    return pcoarse, dense


def _velocity_level_masks(vh: VelocityHierarchy, bc_mask_u_fine, d: int):
    """Stacked per-level velocity masks, coarse->fine (fine = caller's)."""
    L = len(vh.asms)
    masks = []
    for l in range(L):
        if l == L - 1:
            masks.append(bc_mask_u_fine)
        else:
            masks.append(jnp.concatenate([vh.masks[l]] * d))
    return masks


def _pcoarse_mask(vh: VelocityHierarchy, dtype, d: int):
    """Stacked P1 Dirichlet+padding mask for the p-coarsening bottom level
    (host numpy: the jnp level masks are lifted jit arguments and would be
    tracers here)."""
    asm0 = vh.asms[0]
    n1 = asm0.n1
    m0 = vh.masks_np[0]
    v_ids = np.asarray(asm0.W.V.vertex_dofs(), dtype=np.int64)
    q_of_v = (np.asarray(asm0.W.Q.rank, dtype=np.int64)
              if hasattr(asm0.W.Q, "rank")
              else np.arange(asm0.W.mesh.num_vertices, dtype=np.int64))
    mask1_np = np.ones(n1)                       # padding rows pinned
    mask1_np[q_of_v] = m0[v_ids]
    return jnp.asarray(np.concatenate([mask1_np] * d), dtype=dtype)


def velocity_gmg_values(vh: VelocityHierarchy, wind_fine, newton: bool,
                        bc_mask_u_fine, dtype,
                        supg: bool = False,
                        theta: float = 1.0, inv_dt: float = 0.0,
                        fine_values=None):
    """ASSEMBLY half of the velocity V-cycle: every wind-dependent value
    the cycle needs, as one pytree — per-level operator values, the
    p-coarse P1 values, and the dense bottom-level inverse.

    Split out of :func:`make_velocity_gmg_from_wind` so near-HBM-capacity
    problems can run assembly and the Krylov solve as SEPARATE device
    programs: the per-cell element-tensor einsums here are the largest
    HLO temps at 3D scale (the 2.05M config-4 compile dump shows them
    4.7-43x tile-padding-expanded when XLA remats them across the FGMRES
    while_loop — 14 GB of a 19.5 GB program).  Feeding the solve program
    these values as *arguments* removes that entire class of temps from
    it, and skips per-IR-round re-assembly as a bonus.
    """
    L = len(vh.asms)
    fine_asm = vh.asms[-1]
    d = fine_asm.dim

    # wind on every level by repeated injection (slices — free on TPU)
    winds = [None] * L
    winds[L - 1] = wind_fine
    for l in range(L - 2, -1, -1):
        t = vh.transfers[l]
        wf = winds[l + 1]
        n2f = vh.asms[l + 1].n2
        winds[l] = jnp.concatenate(
            [t.inject(wf[a * n2f:(a + 1) * n2f]) for a in range(d)])

    def level_values(asm, wl):
        A1vals = asm.picard_matrix_values(wl).astype(dtype)
        if theta != 1.0 or inv_dt != 0.0:
            # block-mode assemblers skip the M2 constant (const is built
            # with skip_m2 — fill would double the largest stored
            # operator); recompute its values in the compute layout
            M2v = (asm.const.M2.vals if asm.const.M2 is not None
                   else asm.mass2_values())
            A1vals = theta * A1vals + inv_dt * M2v.astype(dtype)
        if supg:
            A1vals = A1vals + asm.supg_values(wl).astype(dtype)
        R = None
        if newton:
            R = asm.newton_reaction_values(wl).astype(dtype)
            if theta != 1.0:
                R = theta * R
        return A1vals, R

    levels = [level_values(asm, winds[l]) for l, asm in enumerate(vh.asms[:-1])]
    if fine_values is not None:
        # the caller's preconditioner operator (A1pc, R) IS the fine-level
        # operator — theta-scheme combination, SUPG and Newton-reaction
        # scaling all match level_values by construction.  Reusing it
        # halves the values-program assembly work and output bytes (the
        # fine level dominates both: 2.12 GB of the 4.74 GB values output
        # at the 2.05M config-4 scale, r5_2m_attempt9.log).
        A1f, Rf = fine_values
        levels.append((A1f.astype(dtype),
                       None if Rf is None else Rf.astype(dtype)))
    else:
        levels.append(level_values(vh.asms[-1], winds[L - 1]))
    masks = _velocity_level_masks(vh, bc_mask_u_fine, d)
    pcoarse, dense = _velocity_gmg_plan(vh, d)
    asm0 = vh.asms[0]
    p1_vals = None
    coarse_inv = None

    if pcoarse:
        # p-coarsening bottom level (see PCoarseTransfer): operator =
        # nu * (Ap + Kp)(wind) [+ theta/dt mass combination] + P1
        # streamline diffusion per component (Picard form — the Newton
        # reaction is left to the smoothed P2 levels; PC-only inexactness)
        w0 = winds[0]
        kp0 = asm0.kp_values(w0.astype(dtype))
        # .astype(dtype) on the SUPG term is load-bearing: h_cell is f64
        # under x64, and a promoted f64 operator reaches jnp.linalg.inv,
        # which TPU LuDecomposition rejects (f32/c64 only — measured
        # compile error on the l0 mixed-precision record)
        p1_vals = vh.nu * (asm0.const.Ap.vals.astype(dtype) + kp0)
        if theta != 1.0 or inv_dt != 0.0:
            m1_vals = vh.nu * asm0.const.Mp.vals.astype(dtype)
            p1_vals = theta * p1_vals + inv_dt * m1_vals
        # SUPG added AFTER the theta/inv_dt combination, matching the P2
        # levels (where level_values adds it to the already-combined
        # operator) — a theta-scaled bottom stabilization would weaken
        # the base level relative to the rest of the hierarchy
        p1_vals = (p1_vals
                   + asm0.supg_p1_values(w0.astype(dtype)).astype(dtype)
                   ).astype(dtype)
        mask1 = _pcoarse_mask(vh, dtype, d)
        free1 = 1.0 - mask1
        A1pd = asm0.pat_p1.to_dense(p1_vals)
        Zp = jnp.zeros_like(A1pd)
        Ap_blk = jnp.block([[A1pd if a == b else Zp for b in range(d)]
                            for a in range(d)])
        Ap_blk = (free1[:, None] * Ap_blk * free1[None, :]
                  + jnp.diag(mask1))
        coarse_inv = jnp.linalg.inv(Ap_blk)
    elif dense:
        A1vals, Rv = levels[0]
        A1 = asm0.pat_p2.to_dense(A1vals)
        Z = jnp.zeros_like(A1)
        A = jnp.block([[A1 if a == b else Z for b in range(d)]
                       for a in range(d)])
        if Rv is not None:
            blocks = [[asm0.pat_p2.to_dense(Rv[a, b]) for b in range(d)]
                      for a in range(d)]
            A = A + jnp.block(blocks)
        mask0 = masks[0]
        free0 = 1.0 - mask0
        A = free0[:, None] * A * free0[None, :] + jnp.diag(mask0)
        # explicit inverse: coarse solve = one MXU matmul per V-cycle
        coarse_inv = jnp.linalg.inv(A)

    return {"levels": levels, "p1_vals": p1_vals, "coarse_inv": coarse_inv}


def make_velocity_gmg_from_values(vh: VelocityHierarchy,
                                  cfg: SubsolveConfig, vals,
                                  bc_mask_u_fine, dtype,
                                  omega: float = 0.6):
    """CLOSURE half of the velocity V-cycle: build the preconditioner
    solve from pre-assembled :func:`velocity_gmg_values` output.  Contains
    no element-tensor assembly — safe to trace into a memory-tight Krylov
    program (see velocity_gmg_values docstring)."""
    L = len(vh.asms)
    d = vh.asms[-1].dim
    level_masks = _velocity_level_masks(vh, bc_mask_u_fine, d)

    matvecs, dinvs, masks_u, vtransfers = [], [], [], []
    for l, asm in enumerate(vh.asms):
        A1vals, R = vals["levels"][l]
        n2 = asm.n2
        mask_u = level_masks[l]
        free = 1.0 - mask_u
        A1 = asm.pat_p2.matrix(A1vals)

        def mv(x, A1=A1, R=R, asm=asm, n2=n2, free=free, mask=mask_u):
            xf = free * x
            comps = [xf[a * n2:(a + 1) * n2] for a in range(d)]
            ys = [A1.mv(comps[a]) for a in range(d)]
            if R is not None:
                for a in range(d):
                    for b in range(d):
                        ys[a] = ys[a] + asm.pat_p2.matrix(R[a, b]).mv(
                            comps[b])
            return free * jnp.concatenate(ys) + mask * x

        diag1 = A1.diag_from(asm.pat_p2.diag_pos)
        if R is not None:
            diag = jnp.concatenate([
                diag1 + asm.pat_p2.matrix(R[a, a]).diag_from(
                    asm.pat_p2.diag_pos) for a in range(d)])
        else:
            diag = jnp.concatenate([diag1] * d)
        diag = jnp.where(mask_u > 0, 1.0, diag)
        matvecs.append(mv)
        dinvs.append(1.0 / diag)
        masks_u.append(mask_u)
        if l > 0:
            vtransfers.append(_VectorTransfer(vh.transfers[l - 1],
                                              vh.asms[l - 1].n2, n2, d=d))

    # bottom level: dense masked inverse when the coarse space is small,
    # p-coarse P1 level when only its P1 space is (see PCoarseTransfer
    # docstring for the measured iteration-count cliff behind this), else
    # a fixed budget of minimal-residual sweeps (FGMRES is flexible, so an
    # inexact coarse solve only shifts iteration counts slightly).
    asm0 = vh.asms[0]
    pcoarse, dense = _velocity_gmg_plan(vh, d)

    if pcoarse:
        n1 = asm0.n1
        mask1 = _pcoarse_mask(vh, dtype, d)
        free1 = 1.0 - mask1
        P1m = asm0.pat_p1.matrix(vals["p1_vals"])

        def mv_p1(x, P1m=P1m, free=free1, mask=mask1, n1=n1):
            xf = free * x
            ys = [P1m.mv(xf[a * n1:(a + 1) * n1]) for a in range(d)]
            return free * jnp.concatenate(ys) + mask * x

        diag_p1 = jnp.concatenate(
            [P1m.diag_from(asm0.pat_p1.diag_pos)] * d)
        diag_p1 = jnp.where(mask1 > 0, 1.0, diag_p1)
        Ainv_p1 = vals["coarse_inv"]
        matvecs.insert(0, mv_p1)
        dinvs.insert(0, 1.0 / diag_p1)
        masks_u.insert(0, mask1)
        vtransfers.insert(0, _VectorTransfer(
            PCoarseTransfer(asm0.W, dtype), n1, asm0.n2, d=d))
        coarse_solve = lambda b: Ainv_p1 @ b
    elif dense:
        Ainv = vals["coarse_inv"]
        coarse_solve = lambda b: Ainv @ b
    else:
        mv0, dinv0 = matvecs[0], dinvs[0]
        sweeps = max(8, 2 * cfg.smooth_iters)

        def coarse_solve(b):
            x = _minres_smooth(mv0, dinv0, sweeps, b, jnp.zeros_like(b))
            return _minres_smooth(mv0, dinv0, sweeps, b, x)

    return make_vcycle(matvecs, dinvs, vtransfers, coarse_solve, masks_u,
                       smooth_iters=cfg.smooth_iters, omega=omega,
                       cycles=cfg.cycles, smoother=cfg.smoother)


def make_velocity_gmg_from_wind(vh: VelocityHierarchy, cfg: SubsolveConfig,
                                wind_fine, newton: bool, bc_mask_u_fine,
                                dtype, omega: float = 0.6,
                                supg: bool = False,
                                theta: float = 1.0, inv_dt: float = 0.0,
                                fine_values=None):
    """V-cycle preconditioner for the velocity block, re-discretizing the
    convection(-reaction) operator on every level from the injected wind.

    ``wind_fine`` is the stacked (d*n2_f,) velocity iterate (traced).
    ``bc_mask_u_fine`` is the fine stacked Dirichlet+padding mask.
    Composition of :func:`velocity_gmg_values` (assembly) and
    :func:`make_velocity_gmg_from_values` (closures); split callers invoke
    the halves as separate device programs.
    """
    vals = velocity_gmg_values(vh, wind_fine, newton, bc_mask_u_fine,
                               dtype, supg=supg, theta=theta,
                               inv_dt=inv_dt, fine_values=fine_values)
    return make_velocity_gmg_from_values(vh, cfg, vals, bc_mask_u_fine,
                                         dtype, omega=omega)
