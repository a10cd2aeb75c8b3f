"""Ablation timing of the fused AL backward kernel on maze shapes.

Compiles three kernel variants — full, jacobians-stubbed (A=I, B=e_j),
AL-terms-stubbed — and times them; the differences attribute the kernel's
per-sweep cost to in-kernel jacobians vs AL expansion vs Riccati math.
Ablations are benchmark-only monkeypatches; results guide optimization.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

import trajopt_tpu.ops.pallas_al_fused as paf
from trajopt_tpu.ops.canonical import canonical_stack
from trajopt_tpu.ops.pallas_fused import _onehot_rows
from trajopt_tpu.ops.rollout import rollout
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.altro import infeasible_problem

DTYPE = jnp.float32


def main(B=128):
    prob = infeasible_problem(probs.quadrotor_maze(dtype=DTYPE), 1e-8)
    model, cs = prob.model, prob.constraints
    n, m, N = model.n, model.m, prob.N
    obj = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DTYPE), prob.obj)
    dt_traj = jnp.asarray(prob.dt_traj(), DTYPE)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.tile(np.asarray(prob.x0)[None], (B, 1)), DTYPE)
    U = jnp.asarray(np.tile(np.asarray(prob.U)[None], (B, 1, 1)), DTYPE)
    X = jax.vmap(lambda x0, Ui: rollout(model, x0, Ui, dt_traj))(x0s, U)
    mask = np.asarray(jax.device_get(cs.mask), bool)
    lam = jnp.asarray(rng.uniform(0, 0.5, size=(B, N, cs.P)) * mask, DTYPE)
    mu = jnp.asarray(rng.uniform(0.5, 20., size=(B, N, cs.P)) * mask, DTYPE)
    rho = jnp.zeros((B,), DTYPE)
    canon = canonical_stack(cs, n, m, dtype=DTYPE)
    model_fns = (model.step_lanes, model.base_step_lanes, model.slack_m)

    def timeit(tag, f, *a):
        jax.block_until_ready(f(*a))
        ts = []
        for _ in range(15):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: {sorted(ts)[len(ts) // 2] * 1e3:7.2f} ms", flush=True)

    orig_jac = paf._step_jac_cols
    orig_al = paf._al_expansion_accumulate

    def run(tag):
        fbp = jax.jit(lambda X, U, lam, mu, rho: paf.fused_al_backward_pallas(
            model_fns, canon, X, U, lam, mu, dt_traj, obj, rho))
        timeit(tag, fbp, X, U, lam, mu, rho)

    run("full          ")

    def stub_jac(step_lanes, x, u, dtv, n_, m_, m_base=None,
                 base_step_lanes=None):
        dtype = x.dtype
        Bt = x.shape[-1]
        Acols = [_onehot_rows(j, n_, Bt, dtype) for j in range(n_)]
        Bcols = [_onehot_rows(j % n_, n_, Bt, dtype) for j in range(m_)]
        return jnp.stack(Acols, axis=1), jnp.stack(Bcols, axis=1)

    paf._step_jac_cols = stub_jac
    run("no-jacobians  ")
    paf._step_jac_cols = orig_jac

    def stub_al(spec, data_refs, x, u, lam_k, mu_k, atol, n_, m_,
                alx_ref, alu_ref, alxx_ref, aluu_ref):
        alx_ref[:] = jnp.zeros_like(alx_ref)
        alu_ref[:] = jnp.zeros_like(alu_ref)
        alxx_ref[:] = jnp.zeros_like(alxx_ref)
        aluu_ref[:] = jnp.zeros_like(aluu_ref)

    paf._al_expansion_accumulate = stub_al
    run("no-AL-terms   ")
    paf._al_expansion_accumulate = orig_al

    paf._step_jac_cols = stub_jac
    paf._al_expansion_accumulate = stub_al
    run("riccati-only  ")
    paf._step_jac_cols = orig_jac
    paf._al_expansion_accumulate = orig_al


if __name__ == "__main__":
    main()
