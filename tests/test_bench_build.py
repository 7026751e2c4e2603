"""The headline bench must BUILD in its default (df32) configuration.

Regression lock: FENAPACK_BLOCK_MAXFILL=48 silently evicted all 2D bench
block patterns (fill 52-93 at a harmless 5-50 MB), which made the default
bench CRASH at build — the driver records BENCH_r{N}.json from bench.py, so
a build failure loses the round's benchmark entirely.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pin the TPU-DEFAULT bench configuration regardless of where this test
# runs: importing bench without FENAPACK_PLATFORM probes the TPU tunnel
# (900 s stall during an outage) and, on fallback, flips BENCH_DF32=0 —
# which is exactly the config this lock must NOT silently switch to.
os.environ["FENAPACK_PLATFORM"] = "cpu"
os.environ["BENCH_DF32"] = "1"


def test_bench_default_config_builds():
    import bench
    nl = bench.build(2, "BRM2", ls="iterative", block_size=32)
    asm = nl.asm
    # the df32 kernel needs BLOCK hi layouts on the monolithic operators
    for name in ("pat_p2_hi", "pat_div_hi", "pat_divT_hi"):
        assert hasattr(getattr(asm, name), "nbr"), (
            f"{name} fell back to ELL — the default df32 bench would crash")
    # and the df32 machinery must have been constructed
    assert nl.oseen.config.krylov.df32_matvec
