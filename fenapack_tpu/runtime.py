"""lift_jit: jit with solver-state arrays passed as ARGUMENTS.

Problem (measured on the TPU remote-compile path): jax inlines every
closed-over array into the serialized program as a literal — FEM operator
state (block tiles, index maps, geometry batches) reaches hundreds of MB and
overflows compile-request limits (HTTP 413) long before HBM does.  Splat
arrays (e.g. ``np.ones``) serialize compactly, which masks the issue in toy
probes.

Fix: :func:`lift_jit` walks the solver object graph (assembler, patterns,
constant operators, hierarchies, transfers), collects every device array
above a size threshold as a (holder, attribute) site, and wraps the function
so those arrays are passed as jit ARGUMENTS: during tracing the attributes
are temporarily swapped for the incoming tracers, so all existing
attribute-based code paths (closures over ``self.asm`` etc.) transparently
become argument-based.  The arrays are restored after tracing; repeated
calls re-collect the same (identical) arrays and hit the jit cache.

This is the moral equivalent of making the whole solver an equinox-style
pytree module, without rewriting every closure.
"""
from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import numpy as np
import jax


LIFT_THRESHOLD_BYTES = 1 << 18      # 256 KB — smaller consts inline fine


class Holder:
    """Attribute bag for arrays captured by closures (e.g. precomputed dense
    inverses): registering the holder on a solver attribute makes its arrays
    reachable by :func:`collect_sites` and hence liftable."""

    def __init__(self, **arrays):
        self.__dict__.update(arrays)


_INTERN_POOL: dict = {}


def intern(arr, dtype=None):
    """Upload a host array to the device, DEDUPLICATED by content.

    The round-5 2.05M-dof residency audit (scripts/r5_resident_audit.py)
    measured ~5.9 GB of int32 pattern indices resident as 8-16 identical
    copies: every NSAssembler / hierarchy-level / cache-load constructs its
    own device copy of the same cols/entry_pos/nbr tables.  Content-keyed
    interning collapses them to one buffer (device arrays are immutable
    and nothing in this codebase donates arguments, so sharing is safe).

    Process-lifetime retention is intentional — these are setup artifacts
    that would otherwise live exactly as long anyway.  Disable with
    FENAPACK_INTERN=0 (then this is a plain jnp.asarray).
    """
    import os
    import hashlib
    import jax.numpy as jnp
    a = np.asarray(arr, dtype=dtype)
    if os.environ.get("FENAPACK_INTERN", "1") == "0" or a.nbytes < (1 << 16):
        return jnp.asarray(a)
    h = hashlib.blake2b(np.ascontiguousarray(a).view(np.uint8),
                        digest_size=16).hexdigest()
    key = (a.shape, str(a.dtype), h)
    hit = _INTERN_POOL.get(key)
    if hit is not None:
        return hit
    d = jnp.asarray(a)
    if isinstance(d, jax.core.Tracer):
        # called under an active trace (e.g. the mini-UFL form compiler
        # builds patterns inside jit): the "upload" is a trace constant —
        # pooling it would leak the tracer into later, unrelated calls
        return d
    _INTERN_POOL[key] = d
    return d


def _is_big_array(v) -> bool:
    return (isinstance(v, jax.Array)
            and v.size * v.dtype.itemsize >= LIFT_THRESHOLD_BYTES)


def _should_recurse(v) -> bool:
    mod = type(v).__module__ or ""
    return mod.startswith("fenapack_tpu") and hasattr(v, "__dict__")


def _liftable_container(v) -> bool:
    """True for a (possibly nested) tuple/list/dict attribute whose leaves
    are ALL jax arrays with at least one above threshold: such containers
    are lifted WHOLE as one pytree argument (arrays inside containers can't
    be swapped in place, and inlining them serializes them as literals —
    measured 594 MB of HLO for the df32 split-tile tuples)."""
    if not isinstance(v, (tuple, list, dict)):
        return False
    leaves = jax.tree_util.tree_leaves(v)
    return (bool(leaves)
            and all(isinstance(l, jax.Array) for l in leaves)
            and any(_is_big_array(l) for l in leaves))


def collect_sites(roots: Sequence[Any]) -> List[Tuple[Any, str]]:
    """(holder, attr) pairs of every big device array (or all-array
    container) reachable from ``roots`` through fenapack_tpu objects /
    tuples / lists / dicts."""
    sites: List[Tuple[Any, str]] = []
    seen = set()
    stack = list(roots)
    while stack:
        o = stack.pop()
        if o is None or id(o) in seen:
            continue
        seen.add(id(o))
        if isinstance(o, jax.Array):
            # a bare array element of a MIXED container (the all-array case
            # is lifted whole at its attribute site and never recursed):
            # there is no (holder, attr) slot to swap, so it will inline as
            # an HLO literal, frozen at trace time — surface that instead
            # of silently bloating the serialized program
            if _is_big_array(o):
                import warnings
                warnings.warn(
                    "lift_jit: big device array inside a mixed container "
                    f"(shape {o.shape}, dtype {o.dtype}, "
                    f"{o.size * o.dtype.itemsize / 1e6:.1f} MB) cannot be "
                    "lifted — it inlines into the program and later "
                    "mutations are ignored; store it on an object "
                    "attribute or a runtime.Holder "
                    "(scripts/probe_lift_sites.py locates the path)",
                    stacklevel=2)
            continue
        if isinstance(o, (tuple, list)):
            stack.extend(o)
            continue
        if isinstance(o, dict):
            stack.extend(o.values())
            continue
        if not hasattr(o, "__dict__"):
            continue
        for name, v in list(vars(o).items()):
            if _is_big_array(v) or _liftable_container(v):
                sites.append((o, name))
            elif isinstance(v, (tuple, list, dict)) or _should_recurse(v):
                stack.append(v)
    return sites


def lift_jit(f: Callable, roots: Sequence[Any],
             static_argnums=()) -> Callable:
    """jit ``f`` with all big solver-state arrays lifted to arguments.

    ``f`` may read the arrays through any attribute path reachable from
    ``roots``; it must not retain references to them across calls.
    """
    sites = collect_sites(roots)

    def wrapped(leaves, *args):
        olds = [getattr(o, n) for o, n in sites]
        for (o, n), v in zip(sites, leaves):
            object.__setattr__(o, n, v)
        try:
            return f(*args)
        finally:
            for (o, n), v in zip(sites, olds):
                object.__setattr__(o, n, v)

    if isinstance(static_argnums, int):      # jax.jit accepts a bare int
        static_argnums = (static_argnums,)
    jf = jax.jit(wrapped, static_argnums=tuple(
        i + 1 for i in static_argnums) if static_argnums else ())

    def call(*args):
        leaves = [getattr(o, n) for o, n in sites]
        return jf(leaves, *args)

    call.lifted_sites = sites           # introspection/debugging
    call.__wrapped__ = f
    call._jf = jf                       # e.g. ._jf.lower() for program-size probes

    def lower(*args):
        """Lower with the CURRENT lifted leaves + the given (possibly
        abstract ShapeDtypeStruct) user args — compile-only memory/size
        probes without executing (scripts/mem_audit3d.py)."""
        leaves = [getattr(o, n) for o, n in sites]
        return jf.lower(leaves, *args)

    call.lower = lower
    return call
