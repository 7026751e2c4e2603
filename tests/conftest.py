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
# Persistent compilation cache: on this box (1 CPU core) compile time IS
# most of the suite's wall-clock; cached XLA executables cut re-runs by
# minutes.  Keyed by program, so code changes invalidate naturally.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FENAPACK_JAX_CACHE",
                                 "/tmp/fenapack_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# The baked sitecustomize force-registers the axon TPU backend and sets
# jax_platforms="axon,cpu" in every process; unit tests must run on local CPU
# (the axon remote-compile tunnel makes each jit take ~30s+).
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ----------------------------------------------------------------------- #
# Data-driven slow marking: tests whose MEASURED duration (committed in
# tests/durations.json, recorded on this 1-CPU box) exceeds the threshold
# get the ``slow`` marker.  The default addopts (-m "not slow", see
# pyproject.toml) make bare ``pytest`` the fast tier; run everything with
#   pytest -m "slow or not slow"
# Unknown/new tests default to fast, so new work is always exercised.
# ----------------------------------------------------------------------- #
import json

import pytest

_SLOW_S = float(os.environ.get("FENAPACK_SLOW_S", "15"))
_dur_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "durations.json")
try:
    with open(_dur_path) as _f:
        _DURATIONS = json.load(_f)
except OSError:
    _DURATIONS = {}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if _DURATIONS.get(item.nodeid, 0.0) >= _SLOW_S:
            item.add_marker(pytest.mark.slow)


# ----------------------------------------------------------------------- #
# Duration recording: FENAPACK_RECORD_DURATIONS=/path/out.json makes a run
# export every test's measured call duration (merged over an existing file,
# so fast/slow tiers recorded in separate runs compose).  This is how
# tests/durations.json is (re)generated:
#   FENAPACK_RECORD_DURATIONS=tests/durations.json pytest -m "slow or not slow"
# ----------------------------------------------------------------------- #
_REC_PATH = os.environ.get("FENAPACK_RECORD_DURATIONS", "")
_RECORDED = {}


def pytest_runtest_logreport(report):
    if _REC_PATH and report.when == "call":
        _RECORDED[report.nodeid] = round(report.duration, 3)


def pytest_sessionfinish(session, exitstatus):
    if not (_REC_PATH and _RECORDED):
        return
    try:
        with open(_REC_PATH) as f:
            merged = json.load(f)
    except OSError:
        merged = {}
    merged.update(_RECORDED)
    with open(_REC_PATH, "w") as f:
        json.dump(merged, f, indent=0, sort_keys=True)
        f.write("\n")
