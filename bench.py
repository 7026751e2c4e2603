#!/usr/bin/env python
"""Headline benchmark: 2D backward-facing step, Re=100, Picard + PCD-BRM2.

The BASELINE.json metric: outer FGMRES iterations + wall-clock to 1e-8, plus
PCD-apply latency.  Runs on whatever jax.default_backend() provides (the real
TPU chip under the driver; CPU elsewhere).

Pipeline measured:
  * full Picard solve (nonlinear rtol 1e-5, per-step linear rtol 1e-8 via
    mixed-precision iterative refinement: f32 FGMRES correction solves +
    f64 true residuals) — wall-clock excludes compilation (one warmup).
  * PCD apply latency (jitted BRM2 apply alone).
  * ``vs_baseline``: golden-iteration-count ratio vs the scipy exact-LU
    oracle (tests/golden_counts.json) — >= 1.0 means we need no more Krylov
    iterations than the reference-equivalent exact path; the 10% band of
    BASELINE.json is [0.9, inf).

Prints ONE JSON line.  Env knobs: BENCH_LEVEL (default 1), BENCH_VARIANT.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _probe_tpu(timeout_s: float) -> bool:
    """True iff the axon TPU backend initializes in a fresh process.

    The axon service has been observed to go down HARD (backend init hangs
    forever, not just erroring) — probing in-process would hang the whole
    benchmark.  A subprocess probe with a kill-on-timeout keeps bench.py
    guaranteed to print its JSON line on whatever backend is reachable.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax\n"
             "assert jax.default_backend() != 'cpu'\n"
             "import jax.numpy as jnp\n"
             "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()\n"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _cpu_env(env):
    """CPU-fallback env: level 1 keeps wall sane; the df32 Pallas kernel
    only runs in (very slow) interpret mode off-TPU."""
    e = dict(env)
    e["FENAPACK_PLATFORM"] = "cpu"
    e.setdefault("BENCH_LEVEL", "1")
    e.setdefault("BENCH_DF32", "0")
    return e


def _wrapper():
    """Outer driver (no jax import): run the benchmark worker in a
    subprocess, retry transient axon service failures, fall back to CPU.

    Round-3 post-mortem: a single mid-warmup ``remote_compile: response
    body closed`` propagated as rc=1 and erased the round's perf evidence
    (BENCH_r03.json parsed=null).  The service errors observed
    (INTERNAL / UNAVAILABLE / FAILED_PRECONDITION right after another
    process exits) are transient — SURVEY round-2 notes say retry once.
    This wrapper guarantees: the LAST stdout line is always valid in-band
    JSON and the exit code is always 0.
    """
    base = dict(os.environ, BENCH_WRAPPED="1")
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", "2700"))
    if "FENAPACK_PLATFORM" in base:
        plans = [("explicit", base), ("explicit-retry", base)]
    elif _probe_tpu(float(os.environ.get("BENCH_PROBE_S", "900"))):
        plans = [("tpu", base), ("tpu-retry", base),
                 ("cpu-fallback", _cpu_env(base))]
    else:
        print("bench: TPU backend unreachable -> CPU fallback",
              file=sys.stderr, flush=True)
        plans = [("cpu", _cpu_env(base)), ("cpu-retry", _cpu_env(base))]

    backoff = 10.0
    last_err = ""
    for i, (tag, env) in enumerate(plans):
        if i > 0:
            time.sleep(backoff)
            backoff = min(backoff * 3, 120.0)
        print(f"bench: attempt {i + 1}/{len(plans)} [{tag}]",
              file=sys.stderr, flush=True)
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=attempt_timeout,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            last_err = f"{tag}: timeout after {attempt_timeout:.0f}s"
            print(f"bench: {last_err}", file=sys.stderr, flush=True)
            continue
        sys.stderr.write(r.stderr[-4000:])
        for line in reversed(r.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except ValueError:
                    continue
                if "metric" in parsed:
                    print(line, flush=True)
                    return 0
        last_err = (f"{tag}: rc={r.returncode} "
                    f"tail={r.stderr.strip()[-300:]!r}")
        print(f"bench: attempt failed: {last_err}", file=sys.stderr,
              flush=True)
    # every attempt failed: still emit in-band JSON so the round records a
    # structured failure rather than parsed=null
    print(json.dumps({
        "metric": "step2d_re100_picard_pcd_nl1e-5_lin1e-8_wall_s",
        "value": None, "unit": "s", "vs_baseline": None,
        "detail": {"error": last_err[:400]},
    }), flush=True)
    return 0


if os.environ.get("BENCH_WRAPPED") != "1" and __name__ == "__main__":
    sys.exit(_wrapper())

import jax

from fenapack_tpu.jax_setup import setup as _jax_setup

_jax_setup(x64=True)   # f64 only for IR true residuals

import numpy as np
import jax.numpy as jnp

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver


def build(level: int, variant: str, ls: str = "direct",
          block_size=None):
    # hi_krylov (f64 outer FGMRES, f32 preconditioner) is the production
    # default: single-round solves at oracle-parity iteration counts
    # (BENCH_HIK=0 selects the 2-round f32 IR mode)
    hik = os.environ.get("BENCH_HIK", "1") == "1"
    # df32: hi matvec via the compensated Pallas BSR kernel (pure-f32 VPU
    # arithmetic, ~1e-12 of emulated f64) — needs the f64 operators in the
    # block layout (hi_block)
    # default ON: measured 3.31 s vs 5.00 s with the emulated-f64 matvec,
    # identical iteration counts (286; vs_baseline 0.9476)
    df32 = os.environ.get("BENCH_DF32", "1") == "1"
    if ls == "iterative":
        from fenapack_tpu.solvers import gmg
        hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), level)
        mesh = hier.fine
    else:
        mesh = meshmod.backward_step_mesh(level)
    # GMG transfers need natural ordering; block tiles help either way
    asm = NSAssembler(mesh, 0.02, dtype=jnp.float64, block_size=block_size,
                      reorder=(block_size is not None and ls != "iterative"),
                      block_dtype=jnp.float32 if block_size else None,
                      hi_block=((os.environ.get("BENCH_HIBLOCK", "0") == "1"
                                 or df32) and block_size is not None))

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    over = {
        "dtype": "float32",
        "pcd.variant": variant,
        "krylov.hi_krylov": hik,
        "krylov.rtol": 2e-6,          # inner IR correction tolerance
        "krylov.maxiter": 80,
        # GCRO-DR recycling: a win for the 2-round f32 IR mode (deflates the
        # per-round Arnoldi startup; 886 -> 324 iters once the batched-SpMV
        # precision landmine was pinned).  Under hi_krylov the solve is
        # single-round and recycling saves only ~1% (CPU: 303 vs 306) while
        # adding the refresh/deflation machinery to the TPU program — off by
        # default there.
        "krylov.recycle": int(os.environ.get(
            "BENCH_RECYCLE", "0" if hik else "16")),
        # measured: f64 outer matvec does NOT cut iterations (the 2-round
        # IR floor comes from the f32 residual-ESTIMATE resolution, not
        # matvec accuracy) and costs +3.5s wall; opt-in only
        "krylov.hi_matvec": os.environ.get("BENCH_HI_MATVEC", "0") == "1",
        "krylov.df32_matvec": df32,
        # double-single Krylov basis: same 1e-8 estimate honesty as the f64
        # basis at pure-f32 VPU cost — measured 3.30 -> 2.54 s at identical
        # iteration counts (sweep 2026-08-19); ignored when recycling is on
        "krylov.ds_basis": os.environ.get("BENCH_DS", "1") == "1",
    }
    if over["krylov.hi_matvec"]:
        # f64 outer matvec: a single f32 round reaches much deeper before
        # the true residual stalls
        over["krylov.ir_attainable"] = float(
            os.environ.get("BENCH_ATT", "1e-7"))
    ap_h = v_h = None
    if ls == "iterative":
        over.update({"velocity.method": "gmg", "velocity.smooth_iters": 3,
                     "velocity.cycles": 2, "pcd.ap.method": "gmg",
                     # hi_krylov counts stay in the 30s: a tight Krylov cap
                     # shrinks the f64 basis/CGS2 footprint per iteration
                     "krylov.maxiter": 48 if hik else 120})
        marker = meshmod.INFLOW if variant == "BRM1" else meshmod.OUTFLOW
        ap_h = gmg.PressureHierarchy(hier, jnp.float32,
                                     pcd_markers=[marker],
                                     block_size=block_size, fine_asm=asm)
        # reuse the solver's assembler as the fine level: avoids a duplicate
        # full set of fine-grid operator constants in every jit program
        v_h = gmg.VelocityHierarchy(hier, 0.02, jnp.float32,
                                    bc_markers=[meshmod.WALL, meshmod.INFLOW],
                                    fine_asm=asm, block_size=block_size)
    # free-form experiment overrides: BENCH_OVER='velocity.cycles=3,...'
    for kv in filter(None, os.environ.get("BENCH_OVER", "").split(",")):
        k, _, v = kv.partition("=")
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                v = {"true": True, "false": False}.get(v, v)
        over[k.strip()] = v
    cfg = overrides(SolverConfig(), over)
    return NonlinearSolver(asm, bcs, cfg, ap_hierarchy=ap_h,
                           velocity_hierarchy=v_h)


def picard_ir(nl, step=None, rtol_nl=1e-5, rtol_lin=1e-8, max_steps=25):
    """Picard loop over the FUSED jitted step (one device call per step:
    residual + whole IR linear solve + update)."""
    if step is None:
        step = nl.make_step_ir(rtol_lin=rtol_lin)
    kr = nl.oseen.config.krylov.recycle
    rec = nl.initial_recycle() if kr else None
    w = nl.initial_state().astype(jnp.float64)
    iters, res = [], []
    r0 = None
    for _ in range(max_steps):
        if kr:
            w_new, rn, inner, _, rec = step(w, rec)
        else:
            w_new, rn, inner, _ = step(w)
        rn = float(rn)
        res.append(rn)
        if r0 is None:
            r0 = rn if rn > 0 else 1.0
        if rn <= rtol_nl * r0:
            break
        iters.append(int(inner))
        w = w_new
    return w, iters, res, step


def time_pcd_apply(nl, w, n_apply=200):
    """Per-apply latency of the PCD apply, amortized over ``n_apply``
    chained applies inside ONE jit (excludes host/tunnel round-trip)."""
    oseen = nl.oseen
    asm = nl.asm
    kpvals = asm.kp_values(
        w[:nl.n_u].astype(oseen.dtype),
        surface=(nl.oseen.config.pcd.variant == "BRM2")).astype(oseen.dtype)
    r = jnp.asarray(np.random.default_rng(0).standard_normal(asm.n1),
                    dtype=oseen.dtype)
    r = r / jnp.linalg.norm(r)

    def mk(kpvals):
        kp = asm.pat_p1.matrix(kpvals)
        return lambda x: oseen.pcd_apply(kp, x)

    return _time_chain(mk, kpvals, r, oseen._lift_roots, n_apply)


def _time_chain(make_fn, ops, x0, roots, n_apply=100, reps=5):
    """Median per-apply latency of ``make_fn(ops)`` amortized over
    ``n_apply`` chained applies inside ONE jit program (normalized each
    step so values stay finite; excludes host/tunnel dispatch).

    ``ops`` (a pytree of device arrays) rides as an explicit jit argument
    and solver-state arrays are lifted through ``roots`` — closures that
    inline big operands serialize them into the remote compile request
    and overflow it (HTTP 413) at level >= 2 scale.
    """
    from fenapack_tpu.runtime import lift_jit

    def chain(ops, x):
        fn = make_fn(ops)

        def body(x, _):
            y = fn(x)
            return y / jnp.linalg.norm(y), None
        out, _ = jax.lax.scan(body, x, None, length=n_apply)
        return out

    jfn = lift_jit(chain, roots)
    jfn(ops, x0).block_until_ready()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jfn(ops, x0).block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3 / n_apply)


def stage_breakdown(nl, w, wall_s, total_iters, n_apply=100):
    """Per-outer-iteration device-time decomposition (VERDICT round-1 #2):
    {outer matvec, full PC apply, velocity subsolve, PCD apply, B^T} each
    timed in isolation; 'krylov_algebra_and_loop' is the unattributed
    remainder (f64 CGS2 + Givens + while_loop bookkeeping + nonlinear-step
    residual assembly amortized over its iterations)."""
    oseen = nl.oseen
    asm = nl.asm
    dt_hi = jnp.dtype(asm.dtype)
    rng = np.random.default_rng(1)
    wind = w[:nl.n_u].astype(oseen.dtype)
    roots = oseen._lift_roots

    hik = oseen.config.krylov.hi_krylov
    # the outer matvec actually used per iteration: hi (df32/f64) under
    # hi_krylov or hi_matvec, else the compute-precision one
    hi_mv = hik or oseen.config.krylov.hi_matvec
    mv_dt = dt_hi if hi_mv else oseen.dtype
    x_n = jnp.asarray(rng.standard_normal(oseen.n))

    if hi_mv:
        A1h, Rh = oseen._operator_values_raw(w[:nl.n_u].astype(dt_hi),
                                             hi=True)
        mv_ms = _time_chain(
            lambda ops: oseen._matvec_factory(ops[0], ops[1], hi=True),
            (A1h, Rh), x_n.astype(mv_dt), roots, n_apply)
    else:
        mv_ms = _time_chain(lambda wd: oseen._pipeline(wd)[0], wind,
                            x_n.astype(mv_dt), roots, n_apply)
    pc_ms = _time_chain(lambda wd: oseen._pipeline(wd)[1], wind,
                        x_n.astype(oseen.dtype), roots, n_apply)

    # PC internals (sum ~= pc_ms; the difference is fieldsplit glue)
    cfg = oseen.config
    A1vals, R = oseen._operator_values(wind)
    A1pc = A1vals
    if cfg.jpc_supg and not cfg.system_supg:
        A1pc = A1vals + asm.supg_values(wind).astype(oseen.dtype)
    x_u = jnp.asarray(rng.standard_normal(nl.n_u), dtype=oseen.dtype)
    vel_ms = _time_chain(
        lambda ops: oseen._velocity_solver(ops[0], ops[1], wind=ops[2]),
        (A1pc, R, wind), x_u, roots, n_apply)
    pcd_ms = time_pcd_apply(nl, w, n_apply)
    # B^T maps p -> u (rectangular): keep the chain carry in p-space by
    # folding the output back through its norm
    x_p = jnp.asarray(rng.standard_normal(asm.n1), dtype=oseen.dtype)
    bt_ms = _time_chain(
        lambda _: (lambda p: p * (1.0 + jnp.linalg.norm(oseen._bt_mv(p)))),
        jnp.zeros(0), x_p, roots, n_apply)

    per_iter_ms = wall_s * 1e3 / max(total_iters, 1)
    attributed = mv_ms + pc_ms
    return {
        "per_outer_iter_ms": round(per_iter_ms, 4),
        "outer_matvec_ms": round(mv_ms, 4),
        "pc_apply_ms": round(pc_ms, 4),
        "pc_velocity_solve_ms": round(vel_ms, 4),
        "pc_pcd_apply_ms": round(pcd_ms, 4),
        "pc_bt_mv_ms": round(bt_ms, 4),
        "krylov_algebra_and_loop_ms": round(per_iter_ms - attributed, 4),
    }


def main():
    level = int(os.environ.get("BENCH_LEVEL", "2"))
    variant = os.environ.get("BENCH_VARIANT", "BRM2")
    ls = os.environ.get("BENCH_LS", "iterative")
    bs = int(os.environ.get("BENCH_BLOCK", "32")) or None
    nl = build(level, variant, ls=ls, block_size=bs)

    # fully-fused path: the WHOLE Picard solve is one device program (no
    # per-step host round-trips / scalar fetches through the tunnel); the
    # GCRO-DR recycle space (f32 IR mode, BENCH_HIK=0) rides the carry
    fullfuse = os.environ.get("BENCH_FULLFUSE", "1") == "1"
    if fullfuse:
        # device-fused Anderson(6) mixing: 284 -> 253 outer iterations —
        # BEATS the oracle's 271 (vs_baseline 1.07; the oracle has no
        # nonlinear acceleration, upstream's only move is Newton) at a
        # net wall win (sweep 2026-08-19: 2.31 s vs 2.54 s plain ds)
        full = nl.make_full_solve(
            rtol=1e-5, rtol_lin=1e-8, max_steps=25,
            anderson=int(os.environ.get("BENCH_ANDERSON", "6")))
        w0 = nl.initial_state().astype(jnp.float64)
        out = full(w0)                       # warmup/compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        w, k, iters_a, res_a = full(w0)
        jax.block_until_ready((w, k, iters_a))
        wall = time.perf_counter() - t0
        k = int(k)
        iters = [int(i) for i in np.asarray(iters_a)[:k]]
        res = [float(r) for r in np.asarray(res_a)[:k + 1]]
    else:
        # warmup: compiles the fused step once
        _, _, _, step = picard_ir(nl, max_steps=2)

        t0 = time.perf_counter()
        w, iters, res, _ = picard_ir(nl, step=step)
        wall = time.perf_counter() - t0

    pcd_ms = time_pcd_apply(nl, w)
    breakdown = None
    if os.environ.get("BENCH_BREAKDOWN", "1") == "1":
        # never lose the headline JSON to an instrumentation failure: the
        # driver records bench.py's single line as the round's benchmark
        try:
            breakdown = stage_breakdown(nl, w, wall, sum(iters))
        except Exception as e:                      # noqa: BLE001
            print(f"bench: stage_breakdown failed: {e!r}",
                  file=sys.stderr, flush=True)
            breakdown = {"error": str(e)[:200]}

    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tests", "golden_counts.json")
    vs_baseline = None
    golden_total = None
    if os.path.exists(golden_path):
        with open(golden_path) as f:
            golden = json.load(f)
        key = f"step2d/l{level}/{variant}/picard"
        if key in golden:
            golden_total = golden[key]["total"]
            vs_baseline = golden_total / max(sum(iters), 1)

    print(json.dumps({
        # tolerance semantics (spelled out): the nonlinear Picard loop stops
        # at relative residual 1e-5; EACH linear solve inside it converges to
        # true relative residual 1e-8 (mixed-precision IR verified in f64).
        # The oracle (tests/golden_counts.json) uses the identical rule, so
        # vs_baseline compares like with like.
        "metric": "step2d_re100_picard_pcd_nl1e-5_lin1e-8_wall_s",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
        "detail": {
            "backend": jax.default_backend(),
            "rtol_nl": 1e-5,
            "rtol_lin": 1e-8,
            "level": level,
            "variant": variant,
            "subsolves": ls,
            "block_size": bs,
            "n_dof": int(nl.n),
            "nonlinear_steps": len(iters),
            "inner_iters_per_step": iters,
            "total_inner_iters": int(sum(iters)),
            "oracle_total_iters": golden_total,
            "final_nonlinear_res_rel": res[-1] / res[0] if res else None,
            "pcd_apply_ms": round(pcd_ms, 4),
            "stage_breakdown": breakdown,
        },
    }))


if __name__ == "__main__":
    main()
