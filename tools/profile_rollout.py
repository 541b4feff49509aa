"""Per-stage timing of the closed-loop tick on the current backend.

Times (after warmup) each component of the bench configuration at
S=64 scenarios x A=24 agents: world-only env_step, recognition, feature
build, model forward, reference lines, evaluator (train mode), and the
composed rollout_chunk in eval and train modes. Run on the real TPU:

    python tools/profile_rollout.py

or on the CPU mesh for a sanity pass:

    JAX_PLATFORMS=cpu python tools/profile_rollout.py s=8
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from rift_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timeit(name, fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt * 1e3:9.2f} ms")
    return out, dt


def main(s=64, a=24, c=3, chunk=10, stages=1, train=1, canonical=1):
    from rift_tpu.map import make_grid_town
    from rift_tpu.models.pluto import build_cbv_features
    from rift_tpu.models.pluto.policy import pluto_cbv_act
    from rift_tpu.rollout import rollout_chunk
    from rift_tpu.runner import Runner, RunnerConfig
    from rift_tpu.scenario import cbv_slot_assignment
    from rift_tpu.scenario.env import env_step
    from rift_tpu.scenario.recognition import recognize_cbvs

    tmap = make_grid_town(blocks=2, num_lanes=2)
    # profile the bench's default path: frame-invariant canonical tokens
    # (bench.py RIFT_TPU_CANONICAL); canonical=0 reverts to per-CBV encoding
    cfg = RunnerConfig(
        num_scenarios=s, num_agents=a, max_cbvs=c, canonical=bool(canonical)
    )
    r = Runner(tmap, cfg)
    state, crit, spec = r.init_params()
    print(f"backend={jax.default_backend()} S={s} A={a} C={c} "
          f"L={tmap.num_lanes} canonical={bool(canonical)}")

    # warm the state with a few live CBVs
    state = state.replace(
        is_cbv=state.is_cbv.at[:, 1:3].set(state.alive[:, 1:3]),
        goal=state.goal.at[:, 1:3].set(state.pos[:, 1:3] + 50.0),
        goal_valid=state.goal_valid.at[:, 1:3].set(state.alive[:, 1:3]),
    )

    # --- individual stages
    if not stages:
        _run_chunks(r, tmap, spec, state, crit, c, chunk, train)
        return
    timeit("env_step (world+criteria+recog+churn)", env_step, tmap, spec, state,
           crit, max_cbvs=c)

    timeit("recognize_cbvs", recognize_cbvs, tmap, spec, state, c)

    slots = cbv_slot_assignment(state.is_cbv, c)
    map_tok = r._map_tokens()
    if canonical:
        bf = jax.jit(lambda st: build_cbv_features(
            tmap, st, slots, spec, canonical=True
        ))
        (feats, _, shared), _ = timeit("build_cbv_features (canonical)", bf, state)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), feats)
        flat = dict(flat)
        flat["shared"] = {
            **shared,
            "scen_idx": jnp.repeat(jnp.arange(s), c),
            **({"map_tok": map_tok} if map_tok is not None else {}),
        }
    else:
        feats_valid, _ = timeit(
            "build_cbv_features", build_cbv_features, tmap, state, slots, spec
        )
        feats = feats_valid[0]
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), feats)

    fwd = jax.jit(lambda p, b: r.model.apply(p, b))
    timeit("pluto forward (B=S*C)", fwd, r.params, flat)

    timeit("pluto_cbv_act eval", pluto_cbv_act, r.model, r.params, tmap, spec,
           state, max_cbvs=c, train=False, canonical=bool(canonical),
           map_tok=map_tok)
    timeit("pluto_cbv_act train (incl evaluator)", pluto_cbv_act, r.model,
           r.params, tmap, spec, state, max_cbvs=c, train=True,
           canonical=bool(canonical), map_tok=map_tok)

    _run_chunks(r, tmap, spec, state, crit, c, chunk, train,
                bool(canonical), map_tok)


def _run_chunks(r, tmap, spec, state, crit, c, chunk, train,
                canonical=False, map_tok=None):
    from rift_tpu.rollout import rollout_chunk

    s = state.alive.shape[0]

    def chunk_eval(st, cr):
        st, cr, _ = rollout_chunk(r.model, r.params, tmap, spec, st, cr,
                                  max_cbvs=c, num_steps=chunk,
                                  canonical=canonical, map_tok=map_tok)
        return st, cr

    def chunk_world(st, cr):
        st, cr, _ = rollout_chunk(r.model, r.params, tmap, spec, st, cr,
                                  max_cbvs=c, num_steps=chunk, with_policy=False)
        return st, cr

    def chunk_train(st, cr):
        st, cr, ex = rollout_chunk(r.model, r.params, tmap, spec, st, cr,
                                   max_cbvs=c, num_steps=chunk, train=True,
                                   canonical=canonical, map_tok=map_tok)
        return st, cr, ex

    _, dt = timeit(f"chunk x{chunk} world-only", chunk_world, state, crit, n=5)
    print(f"  -> {chunk * s / dt:,.0f} env-steps/s")
    _, dt = timeit(f"chunk x{chunk} eval", chunk_eval, state, crit, n=5)
    print(f"  -> {chunk * s / dt:,.0f} env-steps/s")
    if train:
        _, dt = timeit(f"chunk x{chunk} train", chunk_train, state, crit, n=3)
        print(f"  -> {chunk * s / dt:,.0f} env-steps/s")


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kw[k] = int(v)
    main(**kw)
