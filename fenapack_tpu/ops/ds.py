"""Double-single (two-float32) vector arithmetic for the hi-Krylov algebra.

Reference-parity context: PETSc runs its whole KSP in ``PetscReal = double``
(SURVEY.md section 2.2 item 2).  The TPU v5e has no native f64 — XLA emulates
it at ~10x VPU cost, which makes the f64 CGS2 of ``krylov.hi_krylov`` the
dominant per-iteration term once the matvec runs through the compensated
Pallas kernel (ops/pallas_spmv.DF32BlockSpMV).  This module provides the same
trick for the *dense* Krylov algebra: numbers represented as an (hi, lo) pair
of f32 arrays with ``hi + lo`` accurate to ~2^-48 relative, all arithmetic in
pure f32 VPU ops via error-free transforms:

  * ``two_sum``       Knuth branch-free exact addition (6 flops)
  * ``two_prod``      Dekker/Veltkamp split multiplication (17 flops, no FMA
                      assumption — XLA does not contract mul+add by default
                      and never reassociates, so the splits stay exact; the
                      same invariant the validated DF32BlockSpMV kernel uses)
  * ``add/sub/mul``   renormalized double-single ops
  * ``tree_sum``      compensated binary-tree reduction (pads to a power of
                      two; each level is one elementwise two_sum over the
                      halves, so rounding never accumulates linearly in n)
  * ``mat_dots``      (m, n) x (n,) -> (m,) dot products — the CGS2
                      projection h = V w
  * ``update``        w - V^T h — the CGS2 subtraction

Everything is jit-traceable XLA (no Pallas): the elementwise chains fuse, and
the tree reduction's total HBM traffic is ~2x the operand size.  Accuracy is
validated against numpy longdouble in tests/test_ds.py.

A ds array is a ``DS`` NamedTuple of two equal-shape f32 arrays.  Scalars
broadcast like the underlying arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


_SPLIT = 4097.0          # 2^12 + 1: Veltkamp split constant for f32


class DS(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray


def two_sum(a, b):
    """Exact addition: returns (s, e) with s = fl(a+b), s + e = a + b."""
    s = a + b
    bv = s - a
    av = s - bv
    return s, (a - av) + (b - bv)


def _split(a):
    """Veltkamp split: a = a1 + a2 with <=12-bit mantissas each."""
    c = a * _SPLIT
    a1 = c - (c - a)
    return a1, a - a1


def two_prod(a, b):
    """Exact multiplication: returns (p, e) with p = fl(a*b), p + e = a*b."""
    p = a * b
    a1, a2 = _split(a)
    b1, b2 = _split(b)
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def from_f64(x) -> DS:
    """f64 array -> DS (hi = f32(x), lo = f32(x - hi))."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DS(hi, lo)


def to_f64(x: DS):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def from_f32(x) -> DS:
    return DS(x, jnp.zeros_like(x))


def add(x: DS, y: DS) -> DS:
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    s2, e2 = two_sum(s, e)
    return DS(s2, e2)


def neg(x: DS) -> DS:
    return DS(-x.hi, -x.lo)


def sub(x: DS, y: DS) -> DS:
    return add(x, neg(y))


def mul(x: DS, y: DS) -> DS:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    s, e2 = two_sum(p, e)
    return DS(s, e2)


def scale(x: DS, a) -> DS:
    """ds * plain-f32 scalar/array."""
    p, e = two_prod(x.hi, a)
    e = e + x.lo * a
    s, e2 = two_sum(p, e)
    return DS(s, e2)


def _pad_pow2(x: DS, axis: int) -> DS:
    n = x.hi.shape[axis]
    n2 = 1 << (n - 1).bit_length() if n > 1 else 1
    if n2 == n:
        return x
    pads = [(0, 0)] * x.hi.ndim
    pads[axis] = (0, n2 - n)
    return DS(jnp.pad(x.hi, pads), jnp.pad(x.lo, pads))


def tree_sum(x: DS, axis: int = -1) -> DS:
    """Compensated reduction along ``axis``: result error ~2^-48 relative.

    Each halving level is a full ds add of the two halves; the level count is
    log2(n), so per-element rounding (itself ~2^-48) never compounds beyond a
    factor log2(n).
    """
    axis = axis % x.hi.ndim
    x = _pad_pow2(x, axis)
    n = x.hi.shape[axis]

    def half(a, lo_half, hi_half):
        sl = [slice(None)] * a.ndim
        sl[axis] = lo_half
        lo = a[tuple(sl)]
        sl[axis] = hi_half
        return lo, a[tuple(sl)]

    while n > 1:
        h = n // 2
        xh_lo, xh_hi = half(x.hi, slice(0, h), slice(h, n))
        xl_lo, xl_hi = half(x.lo, slice(0, h), slice(h, n))
        x = add(DS(xh_lo, xl_lo), DS(xh_hi, xl_hi))
        n = h
    hi = jnp.squeeze(x.hi, axis)
    lo = jnp.squeeze(x.lo, axis)
    return DS(hi, lo)


def mat_dots(V: DS, w: DS) -> DS:
    """Row dots ``h_i = <V_i, w>`` for V (m, n), w (n,) -> h (m,)."""
    prod = mul(DS(V.hi, V.lo), DS(w.hi[None, :], w.lo[None, :]))
    return tree_sum(prod, axis=1)


def update(w: DS, V: DS, h: DS) -> DS:
    """CGS2 subtraction ``w - V^T h``: V (m, n), h (m,), w (n,) -> (n,).

    The projection sum over m runs as a compensated tree over the (small)
    row axis, then one ds subtraction.
    """
    prod = mul(DS(V.hi, V.lo), DS(h.hi[:, None], h.lo[:, None]))
    proj = tree_sum(prod, axis=0)
    return sub(w, proj)


def dot(x: DS, y: DS) -> DS:
    return tree_sum(mul(x, y), axis=0)


def norm(x: DS):
    """||x|| as a plain f64 scalar (sqrt in f64: scalar cost is nil)."""
    s = dot(x, x)
    return jnp.sqrt(jnp.maximum(to_f64(s), 0.0))


def dynamic_set_row(V: DS, k, row: DS) -> DS:
    """V with row k replaced (the Arnoldi basis append)."""
    return DS(V.hi.at[k].set(row.hi), V.lo.at[k].set(row.lo))
