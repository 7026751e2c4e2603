"""Sharded velocity GMG vs the single-device wind-dependent V-cycle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from functools import partial

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers import gmg
from fenapack_tpu.solvers.config import SubsolveConfig
from fenapack_tpu.parallel.spmd import shard_map
from fenapack_tpu.parallel.spmd_gmg import SPMDVelocityGMG


def step_inflow(x):
    v = np.zeros((x.shape[0], 2))
    v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
    return v


@pytest.fixture(scope="module")
def setup():
    hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), 2)
    vh = gmg.VelocityHierarchy(hier, 0.02, jnp.float64,
                               bc_markers=[meshmod.WALL, meshmod.INFLOW])
    dmesh = Mesh(np.array(jax.devices("cpu")[:8]), ("dd",))
    sp = SPMDVelocityGMG(vh, dmesh, dtype=jnp.float64, smooth_iters=4,
                         cycles=1)
    asm_f = vh.asms[-1]
    # a physically-plausible wind: inflow profile propagated everywhere
    coords = asm_f.W.V.dof_coords()
    wind = np.concatenate([4 * np.clip(coords[:, 1], 0, 1)
                           * (1 - np.clip(coords[:, 1], 0, 1)),
                           np.zeros(asm_f.n2)])
    return vh, sp, wind


def _pack(sp, x_stacked):
    """Stacked natural (d*n2_f,) -> fine-level device-major padded."""
    lv = sp.lv[-1]
    d = sp.d
    n2, n_pad, loc = lv["n2"], lv["n_pad"], lv["loc"]
    padded = np.zeros(d * n_pad)
    for a in range(d):
        padded[a * n_pad + lv["rank"]] = x_stacked[a * n2:(a + 1) * n2]
    return sp._u_dm_arr(padded, n_pad, loc)


def _unpack(sp, x_dm):
    lv = sp.lv[-1]
    d = sp.d
    n2, n_pad, loc = lv["n2"], lv["n_pad"], lv["loc"]
    x_dm = np.asarray(x_dm)
    stacked = np.zeros(d * n_pad)
    for a in range(d):
        j = np.arange(n_pad)
        dev = j // loc
        stacked[a * n_pad + j] = x_dm[dev * d * loc + a * loc
                                      + (j - dev * loc)]
    out = np.zeros(d * n2)
    for a in range(d):
        out[a * n2:(a + 1) * n2] = stacked[a * n_pad + lv["rank"]]
    return out


def test_spmd_velocity_vcycle_contracts(setup):
    vh, sp, wind = setup
    asm_f = vh.asms[-1]
    ops = sp.build_operands(wind)

    cfg = SubsolveConfig(method="gmg", smooth_iters=4, cycles=1,
                         smoother="minres")
    mask_full = jnp.concatenate([vh.masks[-1]] * 2)
    single = gmg.make_velocity_gmg_from_wind(
        vh, cfg, jnp.asarray(wind), False, mask_full, jnp.float64)

    rng = np.random.default_rng(0)
    free = 1.0 - np.asarray(mask_full)
    b = rng.standard_normal(2 * asm_f.n2) * free

    specs = sp.operand_specs(ops)

    @partial(shard_map, mesh=sp.mesh, in_specs=(specs, P("dd")),
             out_specs=P("dd"))
    def run(ops_loc, b_loc):
        return sp.solve_local(b_loc, ops_loc)

    x_sp = _unpack(sp, run(ops, jnp.asarray(_pack(sp, b))))
    x_single = np.asarray(single(jnp.asarray(b)))

    # both reduce the residual of the SAME operator comparably
    A1vals = np.asarray(asm_f.picard_matrix_values(jnp.asarray(wind)))
    A1 = asm_f.pat_p2.matrix(jnp.asarray(A1vals))

    def resid(x):
        xs = jnp.asarray(x)
        xf = jnp.asarray(free) * xs
        ys = [A1.mv(xf[a * asm_f.n2:(a + 1) * asm_f.n2]) for a in range(2)]
        y = jnp.asarray(free) * jnp.concatenate(ys) + \
            jnp.asarray(np.asarray(mask_full)) * xs
        return float(jnp.linalg.norm(jnp.asarray(b) - y))

    b_norm = float(np.linalg.norm(b))
    r_sp, r_single = resid(x_sp), resid(x_single)
    assert r_sp < 0.35 * b_norm, (r_sp, b_norm)
    assert r_sp < 2.5 * r_single + 1e-12, (r_sp, r_single)
