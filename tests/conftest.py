"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip behaviour is validated the TPU-idiomatic way (SURVEY.md section 4,
item 4): `--xla_force_host_platform_device_count=8` is the analogue of the
reference's `mpirun -np 3` oversubscribed single-node CI runs.
"""
import os
import sys

# Hard override: the session environment presets JAX_PLATFORMS=axon (the real
# TPU tunnel); unit tests must run on the virtual CPU mesh for speed and f64.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Solver correctness tests run in double precision (CPU); the TPU production
# path uses mixed precision (f32 + compensated reductions) and is benchmarked
# separately on hardware.
import jax
jax.config.update("jax_enable_x64", True)
# The baked sitecustomize force-registers the axon TPU backend and sets
# jax_platforms="axon,cpu" in every process; unit tests must run on local CPU
# (the axon remote-compile tunnel makes each jit take ~30s+).
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
