"""Static-sparsity device matrices: the TPU-native replacement for PETSc Mat.

Reference-parity (SURVEY.md section 2.2 item 1): PETSc SeqAIJ/MPIAIJ SpMV,
MatMult and submatrix extraction.  The sparsity of every FEM operator is
fixed by the mesh, so all layouts are precomputed host-side (NumPy); per-
iteration reassembly of wind-dependent operators is a single jit scatter-add
of element values.

Two interchangeable layouts behind one interface
(``pattern.matrix(vals) -> op`` with ``op.mv/vals/with_vals/diag_from``):

  * :class:`SparsityPattern` / :class:`ELL` — per-row padded column lists;
    SpMV is an XLA gather + row contraction.  Simple and exact-size, but XLA
    lowers the arbitrary 1D gather to near-scalar code on TPU (~100x off
    memory bandwidth — measured on v5e).
  * :class:`BlockSparsityPattern` / :class:`BlockELL` — block-sparse rows
    (BSR-like): dofs are grouped into contiguous blocks of ``b``; each block
    row stores dense ``b x b`` tiles for its neighbor blocks.  SpMV becomes
    a *row gather of whole blocks* (efficient on TPU — embedding-lookup
    shape) plus one batched dense tile contraction on the MXU/VPU.  The
    fill-in cost (stored zeros) is repaid ~10-100x by leaving the scalar
    gather path; pair with RCM dof reordering (fem.dofmap) to keep the
    block-neighbor count small.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..runtime import intern as _intern


def block_layout_ok(pat, scale: float = 1.0) -> bool:
    """Keep a block-tile layout, or evict to the compact gather/ELL path?

    Primary criterion: estimated tile-plane BYTES (nb * m * b * b * 4,
    f32) against ``scale * FENAPACK_BLOCK_MAXBYTES`` (base default 1e9) —
    the 16 GB-HBM constraint that motivated eviction (3D rectangular
    div/grad and GMG restriction tiles reach GBs at 761k dofs under any
    ordering).  ``scale`` lets callers budget by hotness: the square P2
    operator (3 SpMVs per matvec + every GMG smoothing sweep) earns a
    bigger share of HBM than the once-per-matvec rectangular blocks.

    The original ratio knob ``FENAPACK_BLOCK_MAXFILL`` (slots/nnz) still
    applies when explicitly set, but as a DEFAULT it wrongly evicted the
    2D bench patterns (fill 52-93 at a harmless 5-50 MB), silently
    breaking the df32 block path.
    """
    import os
    mf = os.environ.get("FENAPACK_BLOCK_MAXFILL")
    if mf is not None and pat.fill_ratio > float(mf):
        return False
    maxbytes = float(os.environ.get("FENAPACK_BLOCK_MAXBYTES", "1e9"))
    # near-HBM-capacity escape hatch: tighten ONLY the cold (scale < 1)
    # patterns — the round-4 2M attempts showed a global MAXBYTES cut
    # also evicts the hot square operators (every smoother sweep) to the
    # ~100x-slower gather path, trading an OOM for an execution kill
    cold = os.environ.get("FENAPACK_BLOCK_MAXBYTES_COLD")
    if cold is not None and scale < 1.0:
        return pat.nb * pat.m * pat.block * pat.block * 4 <= float(cold)
    return pat.nb * pat.m * pat.block * pat.block * 4 <= scale * maxbytes


def _use_pallas_bsr(nb: int, dtype, block: int = 32) -> bool:
    """Route the block SpMV through the Pallas BSR kernel?

    Measured on TPU v5e (doc/spmv_table.md, 2026-08-19): the Pallas kernel
    wins ONLY for b=32 tiles at 3D scale (3d-l3 nb=7592: 2084 us vs XLA
    2262 us, 449 GB/s = 55% of roofline); for b=8/b=16 the (nb, b, m*b)
    tiles leave the 8x128 vregs underfilled and XLA's flat einsum wins at
    every scale (3d-l3 b=16 nb=15183: XLA 2508 us vs Pallas 4909 us).
    FENAPACK_PALLAS_BSR: auto (TPU + f32 + b >= 32 + nb >= threshold)
    | 1 | 0.
    """
    import os
    mode = os.environ.get("FENAPACK_PALLAS_BSR", "auto")
    if mode == "0":
        return False
    if jax.default_backend() != "tpu" or jnp.dtype(dtype) != jnp.float32:
        return False
    if mode == "1":
        return True
    if block < 32:
        return False
    return nb >= int(os.environ.get("FENAPACK_PALLAS_BSR_NB", "4096"))


class _StaticArray:
    """Hashable wrapper for the index arrays carried as pytree METADATA
    (``ELL.cols`` / ``BlockELL.nbr``): they are compile-time constants of a
    fixed sparsity pattern, so they belong in aux, but raw arrays there
    crash jit's treedef equality ("arrays cannot be passed as metadata
    fields") the moment TWO different pattern builds meet one process
    (seen: sweep_bench point 2+).  Equality/hash go by the wrapped array's
    object identity — distinct builds get distinct treedefs (a fresh jit
    cache entry), identical patterns shared via with_vals() stay equal."""
    __slots__ = ("a",)

    def __init__(self, a):
        self.a = a

    def __eq__(self, other):
        return isinstance(other, _StaticArray) and self.a is other.a

    def __hash__(self):
        return hash(id(self.a))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ELL:
    """ELL sparse matrix: ``cols`` (n_rows, K) int32, ``vals`` same shape.

    Padded slots have ``col = 0`` and ``val = 0`` (safe: contributes nothing).
    """
    cols: jnp.ndarray
    vals: jnp.ndarray
    n_cols: int

    def tree_flatten(self):
        return (self.vals,), (_StaticArray(self.cols), self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, n_cols = aux
        return cls(cols=cols.a, vals=children[0], n_cols=n_cols)

    @property
    def shape(self):
        return (self.cols.shape[0], self.n_cols)

    def with_vals(self, vals: jnp.ndarray) -> "ELL":
        return ELL(cols=self.cols, vals=vals, n_cols=self.n_cols)

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x.  ``x`` may be (n_cols,) or (n_cols, b) for batched RHS."""
        g = x[self.cols]                       # (n, K) or (n, K, b)
        if x.ndim == 1:
            return jnp.sum(self.vals * g, axis=1)
        return jnp.einsum("nk,nkb->nb", self.vals, g)

    def row_sums(self) -> jnp.ndarray:
        return jnp.sum(self.vals, axis=1)

    def diag_from(self, diag_pos: jnp.ndarray) -> jnp.ndarray:
        """Extract the diagonal given precomputed flat slot positions."""
        return self.vals.reshape(-1)[diag_pos]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockELL:
    """Block-sparse-row matrix; block row I couples to block columns
    ``nbr[I, :]`` (padded with repeats — their tiles are zero).

    Tile storage is FLAT: ``tiles[(I), i, (j*b + c)] = A[I*b+i, nbr[I,j]*b+c]``
    of shape (nb, b, m*b) — the last dim is wide (m*b >= 128 typically), so
    the TPU (8, 128) tiled layout adds no padding, where the naive
    (nb, m, b, b) form pads the trailing (b, b) = (32, 32) tile to
    (32, 128): 4x HBM for every stored operator and 4x the SpMV traffic.
    The SpMV becomes one batched (b, m*b) @ (m*b,) GEMV per block row."""
    nbr: jnp.ndarray          # (nb, m) int32
    tiles: jnp.ndarray        # (nb, b, m*b)
    n_rows: int
    n_cols: int

    def tree_flatten(self):
        return (self.tiles,), (_StaticArray(self.nbr), self.n_rows,
                               self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        nbr, n_rows, n_cols = aux
        return cls(nbr=nbr.a, tiles=children[0], n_rows=n_rows,
                   n_cols=n_cols)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def vals(self):
        return self.tiles

    def with_vals(self, vals: jnp.ndarray) -> "BlockELL":
        return BlockELL(nbr=self.nbr, tiles=vals, n_rows=self.n_rows,
                        n_cols=self.n_cols)

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        nb, b, mb = self.tiles.shape
        ncb = -(-self.n_cols // b) * b
        if x.ndim == 2:
            # multi-RHS (n_cols, k) — same interface as ELL.mv.  Always the
            # batched einsum (better MXU utilization than k streaming
            # Pallas calls; reduced-precision caveat applies, as for vmap)
            k = x.shape[1]
            xb = jnp.pad(x, ((0, ncb - self.n_cols), (0, 0)))
            g = xb.reshape(ncb // b, b, k)[self.nbr].reshape(nb, mb, k)
            y = jnp.einsum("bik,bkj->bij", self.tiles, g)
            return y.reshape(-1, k)[:self.n_rows]
        if _use_pallas_bsr(nb, self.tiles.dtype, block=b):
            from .pallas_spmv import PallasBSRSpMV
            return PallasBSRSpMV(self, rows_per_step=8,
                                 variant="scratch")(x)
        xb = jnp.pad(x, (0, ncb - self.n_cols)).reshape(ncb // b, b)
        g = xb[self.nbr].reshape(nb, mb)               # (nb, m*b) row gather
        y = jnp.einsum("bik,bk->bi", self.tiles, g)
        return y.reshape(-1)[:self.n_rows]

    def row_sums(self) -> jnp.ndarray:
        y = jnp.sum(self.tiles, axis=2)                # (nb, b)
        return y.reshape(-1)[:self.n_rows]

    def diag_from(self, diag_pos: jnp.ndarray) -> jnp.ndarray:
        return self.tiles.reshape(-1)[diag_pos]


class SparsityPattern:
    """Host-side precomputed scatter layout for one (test-space x trial-space)
    operator with fixed connectivity.

    Build once from the COO entry list generated by the cell (or facet)
    dofmaps; provides:
      * ``entry_pos`` — flat position in the value array of every COO entry,
        so a jit assembly is ``zeros(size).at[entry_pos].add(element_values)``
      * ``matrix(vals)`` — wrap an assembled value array as an operator,
      * ``diag_pos`` — flat value positions of diagonal entries (square).
    """

    def __init__(self, rows: np.ndarray, cols: np.ndarray,
                 n_rows: int, n_cols: int):
        rows = np.asarray(rows, dtype=np.int64).ravel()
        cols = np.asarray(cols, dtype=np.int64).ravel()
        keys = rows * n_cols + cols
        from ..native import unique_i64
        uniq, inverse = unique_i64(keys)
        urow = (uniq // n_cols).astype(np.int64)
        ucol = (uniq % n_cols).astype(np.int64)
        self.n_rows, self.n_cols = n_rows, n_cols
        self.nnz = uniq.shape[0]
        self._ukeys = uniq
        self._urow, self._ucol = urow, ucol

        self._layout(urow, ucol)      # sets value_shape, _upos, aux arrays

        self._entry_pos_np = self._upos[inverse].astype(np.int32)
        self.entry_pos = _intern(self._entry_pos_np)
        if n_rows == n_cols:
            dmask = urow == ucol
            dp = np.zeros(n_rows, dtype=np.int64)
            dp[urow[dmask]] = self._upos[dmask]
            self.diag_pos = _intern(dp, dtype=np.int32)
        else:
            self.diag_pos = None

    # ------------------------------------------------------------------ #
    def _layout(self, urow, ucol):
        counts = np.bincount(urow, minlength=self.n_rows)
        K = int(counts.max()) if counts.size else 1
        row_start = np.concatenate([[0], np.cumsum(counts)])
        slot = np.arange(urow.shape[0]) - row_start[urow]
        self._upos = urow * K + slot
        self.K = K
        self.value_shape = (self.n_rows, K)
        ell_cols = np.zeros((self.n_rows, K), dtype=np.int32)
        ell_cols.reshape(-1)[self._upos] = ucol
        self.cols = _intern(ell_cols)

    @property
    def value_size(self) -> int:
        return int(np.prod(self.value_shape))

    def matrix(self, vals: jnp.ndarray):
        return ELL(cols=self.cols, vals=vals, n_cols=self.n_cols)

    # ------------------------------------------------------------------ #
    def pad_entries(self, n_extra: int) -> None:
        """Extend ``entry_pos`` with out-of-bounds slots for phantom padding
        cells: JAX scatter-add drops OOB updates, so the padded entries of an
        element-value batch contribute nothing (their values are zero anyway —
        phantom cells have zero quadrature weight)."""
        if not n_extra:
            return
        oob = jnp.full(n_extra, self.value_size, dtype=jnp.int32)
        self.entry_pos = jnp.concatenate([self.entry_pos, oob])
        self._entry_pos_np = np.concatenate(
            [self._entry_pos_np,
             np.full(n_extra, self.value_size, dtype=np.int32)])

    def assemble_values(self, element_values: jnp.ndarray,
                        host: bool = False) -> jnp.ndarray:
        """Scatter-add flat element-tensor values into a value array.

        ``host=True`` uses a host (CPU-device) copy of the scatter map so the
        whole op runs on the CPU backend under ``jax.default_device`` —
        the setup-time constant-assembly path at 3D scale (device entry_pos
        would drag the computation back onto the TPU)."""
        v = element_values.ravel()
        flat = jnp.zeros(self.value_size, dtype=v.dtype)
        pos = (jnp.asarray(self._entry_pos_np[:v.shape[0]]) if host
               else self.entry_pos)
        flat = flat.at[pos].add(v)
        return flat.reshape(self.value_shape)

    def assemble(self, element_values: jnp.ndarray,
                 dtype: Optional[jnp.dtype] = None):
        v = element_values
        if dtype is not None:
            v = v.astype(dtype)
        return self.matrix(self.assemble_values(v))

    def entry_positions(self, test_dofs: np.ndarray,
                        trial_dofs: np.ndarray) -> jnp.ndarray:
        """Flat value positions for extra COO entries (e.g. facet terms)
        whose (row, col) pairs are already present in this pattern.

        ``test_dofs`` (nf, a), ``trial_dofs`` (nf, b) -> positions (nf*a*b,)
        matching element values (nf, a, b) raveled C-style.
        """
        a = test_dofs.shape[1]
        b = trial_dofs.shape[1]
        rows = np.repeat(np.asarray(test_dofs, dtype=np.int64), b, axis=1).ravel()
        cols = np.tile(np.asarray(trial_dofs, dtype=np.int64), (1, a)).ravel()
        keys = rows * self.n_cols + cols
        from ..native import searchsorted_i64
        idx, hits = searchsorted_i64(self._ukeys, keys)
        if hits != keys.shape[0]:
            raise ValueError("facet entries not contained in the pattern")
        return jnp.asarray(self._upos[idx], dtype=np.int32)

    def to_dense(self, vals: jnp.ndarray) -> jnp.ndarray:
        """Dense (n_rows, n_cols) matrix from a (traced) value array —
        jit-safe, used for exact subsolve factorizations."""
        if not hasattr(self, "_dense_idx"):
            size = self.value_size
            r = np.zeros(size, dtype=np.int32)
            c = np.zeros(size, dtype=np.int32)
            r[self._upos] = self._urow
            c[self._upos] = self._ucol
            # unmapped (padding) cells: send to an OOB row so .add drops them
            mask = np.ones(size, dtype=bool)
            mask[self._upos] = False
            r[mask] = self.n_rows
            # cache as NumPy: jnp constants created inside a trace would
            # leak tracers across jit boundaries
            self._dense_idx = (r, c)
        # wrap per use: raw numpy captures break the const-as-argument
        # lowering (jax_use_simplified_jaxpr_constants)
        r = jnp.asarray(self._dense_idx[0])
        c = jnp.asarray(self._dense_idx[1])
        dense = jnp.zeros((self.n_rows, self.n_cols), vals.dtype)
        return dense.at[r, c].add(vals.reshape(-1), mode="drop")

    def to_scipy(self, op):
        """Export to scipy CSR (host) for tests/validation."""
        import scipy.sparse as sp
        vals = np.asarray(op.vals).reshape(-1)[self._upos]
        return sp.csr_matrix((vals, (self._urow, self._ucol)),
                             shape=(self.n_rows, self.n_cols))

    # ------------------------------------------------------------------ #
    # disk memoization (pattern_from_dofmaps)
    # ------------------------------------------------------------------ #
    def _to_cache(self) -> dict:
        return dict(ukeys=self._ukeys, upos=self._upos,
                    entry_pos=np.asarray(self.entry_pos),
                    diag_pos=(np.asarray(self.diag_pos)
                              if self.diag_pos is not None
                              else np.zeros(0, np.int32)),
                    ell_cols=np.asarray(self.cols), K=np.int64(self.K))

    @classmethod
    def _from_cache(cls, d: dict, n_rows: int, n_cols: int, block):
        self = object.__new__(cls)
        self.n_rows, self.n_cols = n_rows, n_cols
        self._ukeys = d["ukeys"]
        self._urow = (self._ukeys // n_cols).astype(np.int64)
        self._ucol = (self._ukeys % n_cols).astype(np.int64)
        self.nnz = self._ukeys.shape[0]
        self._upos = d["upos"]
        self.K = int(d["K"])
        self.value_shape = (n_rows, self.K)
        self.cols = _intern(d["ell_cols"])
        self._entry_pos_np = d["entry_pos"].astype(np.int32)
        self.entry_pos = _intern(self._entry_pos_np)
        self.diag_pos = (_intern(d["diag_pos"])
                         if d["diag_pos"].size else None)
        return self


class BlockSparsityPattern(SparsityPattern):
    """Block-sparse-row layout (see module docstring).  ``block`` is the
    tile size ``b``; rows AND cols are grouped in blocks of ``b`` (row and
    column spaces may differ in size)."""

    def __init__(self, rows, cols, n_rows, n_cols, block: int = 32):
        self.block = int(block)
        super().__init__(rows, cols, n_rows, n_cols)

    def _layout(self, urow, ucol):
        b = self.block
        nb = -(-self.n_rows // b)
        ncb = -(-self.n_cols // b)
        br = urow // b
        bc = ucol // b
        bkeys = br * ncb + bc
        from ..native import unique_i64
        upairs, pinv = unique_i64(bkeys)
        pbr = upairs // ncb
        pbc = upairs % ncb
        counts = np.bincount(pbr, minlength=nb)
        m = int(counts.max()) if counts.size else 1
        row_start = np.concatenate([[0], np.cumsum(counts)])
        slot = np.arange(upairs.shape[0]) - row_start[pbr]   # tile slot j
        tile_of_pair = pbr * m + slot                        # flat tile id

        nbr = np.zeros((nb, m), dtype=np.int32)
        # pad unused slots with a valid block id (their tiles stay zero)
        nbr[:] = 0
        nbr.reshape(-1)[tile_of_pair] = pbc
        # fill padding slots with the row's first neighbor (cheap, valid)
        filled = np.zeros((nb, m), dtype=bool)
        filled.reshape(-1)[tile_of_pair] = True
        first = np.where(counts > 0,
                         nbr[np.arange(nb), 0], 0)
        for j in range(m):
            colj = nbr[:, j]
            nbr[:, j] = np.where(filled[:, j], colj, first)

        tid = tile_of_pair[pinv]                             # per unique entry
        pbr_e = tid // m
        slot_e = tid % m
        # FLAT tile layout (nb, b, m*b): see BlockELL docstring
        self._upos = ((pbr_e * b + urow % b) * (m * b)
                      + slot_e * b + ucol % b)
        self.nb, self.m = nb, m
        self.value_shape = (nb, b, m * b)
        self.nbr = _intern(nbr)
        self.fill_ratio = float(nb * m * b * b) / max(self.nnz, 1)

    def matrix(self, vals: jnp.ndarray):
        return BlockELL(nbr=self.nbr, tiles=vals, n_rows=self.n_rows,
                        n_cols=self.n_cols)

    def _to_cache(self) -> dict:
        return dict(ukeys=self._ukeys, upos=self._upos,
                    entry_pos=np.asarray(self.entry_pos),
                    diag_pos=(np.asarray(self.diag_pos)
                              if self.diag_pos is not None
                              else np.zeros(0, np.int32)),
                    nbr=np.asarray(self.nbr),
                    shape_meta=np.asarray([self.nb, self.m, self.block],
                                          dtype=np.int64))

    @classmethod
    def _from_cache(cls, d: dict, n_rows: int, n_cols: int, block):
        self = object.__new__(cls)
        self.n_rows, self.n_cols = n_rows, n_cols
        self.block = int(block)
        self._ukeys = d["ukeys"]
        self._urow = (self._ukeys // n_cols).astype(np.int64)
        self._ucol = (self._ukeys % n_cols).astype(np.int64)
        self.nnz = self._ukeys.shape[0]
        self._upos = d["upos"]
        nb, m, b = (int(v) for v in d["shape_meta"])
        assert b == self.block
        self.nb, self.m = nb, m
        self.value_shape = (nb, b, m * b)
        self.nbr = _intern(d["nbr"])
        self.fill_ratio = float(nb * m * b * b) / max(self.nnz, 1)
        self._entry_pos_np = d["entry_pos"].astype(np.int32)
        self.entry_pos = _intern(self._entry_pos_np)
        self.diag_pos = (_intern(d["diag_pos"])
                         if d["diag_pos"].size else None)
        return self


def _pattern_cache_dir():
    import os
    d = os.environ.get("FENAPACK_CACHE")
    if d == "":
        return None                     # cache disabled
    return d or "/tmp/fenapack_cache/patterns"


def pattern_from_dofmaps(test_dofs: np.ndarray, trial_dofs: np.ndarray,
                         n_rows: int, n_cols: int,
                         block: Optional[int] = None) -> SparsityPattern:
    """Pattern for sum_cells outer(test_dofs[c], trial_dofs[c]).

    ``test_dofs`` (nc, a), ``trial_dofs`` (nc, b); entry order matches
    ``element_values`` of shape (nc, a, b) raveled C-style.  ``block``
    selects the block-sparse layout (tile size).

    Layouts are memoized on disk keyed by the dofmap content (the moral
    equivalent of the reference's FFC/dijitso generated-code cache: setup
    products of a fixed discretization are deterministic).  Set
    ``FENAPACK_CACHE=""`` to disable, or to a directory to relocate.
    """
    import hashlib
    import os
    nc, a = test_dofs.shape
    b = trial_dofs.shape[1]

    cache_dir = _pattern_cache_dir()
    path = None
    if cache_dir is not None:
        hsh = hashlib.blake2b(digest_size=20)
        for part in (np.ascontiguousarray(test_dofs),
                     np.ascontiguousarray(trial_dofs)):
            hsh.update(part.tobytes())
        hsh.update(f"v2|{n_rows}|{n_cols}|{block}".encode())
        path = os.path.join(cache_dir, hsh.hexdigest() + ".npz")
        if os.path.exists(path):
            try:
                with np.load(path) as z:
                    data = {k: z[k] for k in z.files}
                cls = BlockSparsityPattern if block else SparsityPattern
                return cls._from_cache(data, n_rows, n_cols, block)
            except Exception:
                pass                    # corrupt/stale: rebuild

    rows = np.repeat(test_dofs, b, axis=1)              # (nc, a*b)
    cols = np.tile(trial_dofs, (1, a))
    if block:
        pat = BlockSparsityPattern(rows, cols, n_rows, n_cols, block=block)
    else:
        pat = SparsityPattern(rows, cols, n_rows, n_cols)
    if path is not None:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            np.savez(tmp, **pat._to_cache())
            os.replace(tmp, path)
        except Exception:
            pass
    return pat
