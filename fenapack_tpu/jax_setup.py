"""Process-wide JAX configuration for fenapack_tpu entry points.

``setup()`` is called by bench/demos/driver entries (NOT on library import —
libraries must not mutate global config for embedding applications).
"""
from __future__ import annotations

import os

import jax


def setup(x64: bool = True, cache_dir: str | None = None) -> None:
    """Apply the configuration the TPU production path depends on.

    - ``jax_use_simplified_jaxpr_constants``: closed-over constants become
      runtime arguments instead of literals embedded in the serialized
      program.  Load-bearing at scale: FEM operator constants (block tiles,
      geometry batches) reach hundreds of MB and otherwise overflow
      compile-request limits (observed HTTP 413 from the remote TPU
      compiler at ~100k dofs).
    - persistent compilation cache: FGMRES+GMG programs take minutes to
      compile; repeat runs are free.
    - optional x64 for high-precision IR residuals (f32 compute unaffected).
    """
    # the environment may force-register a remote TPU backend via
    # sitecustomize (jax_platforms preset); FENAPACK_PLATFORM overrides it
    platform = os.environ.get("FENAPACK_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_use_simplified_jaxpr_constants", True)
    except AttributeError:    # flag removed in newer jax (became default)
        pass
    jax.config.update(
        "jax_compilation_cache_dir",
        cache_dir or os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
