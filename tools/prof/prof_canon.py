"""Per-stage timing of the CANONICAL-token eval/train path (bench defaults).

Mirrors tools/prof/prof_eval.py but through the frame-invariant pipeline
(models/pluto/features.py canonical_*): precomputed map tokens, shared
per-tick history encoding, per-CBV gather + forward. Identifies the next
perf lever after the round-3 canonical/PointsEncoder wins.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp

from rift_tpu.utils import enable_compilation_cache

enable_compilation_cache()
from rift_tpu.map import make_grid_town
from rift_tpu.models.pluto.features import (
    build_cbv_features,
    canonical_map_features,
    shared_history_features,
)
from rift_tpu.models.pluto.policy import pluto_cbv_act
from rift_tpu.rollout import rollout_chunk
from rift_tpu.runner import Runner, RunnerConfig
from rift_tpu.scenario.env import env_step
from rift_tpu.scenario.recognition import cbv_slot_assignment

S, A, C = 64, 24, 3
tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(
    num_scenarios=S, num_agents=A, max_cbvs=C, encoder_depth=4, decoder_depth=4
)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()
params, model = r.params, r.model
map_tok = r._map_tokens()


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):  # best-of-3 trials vs chip contention
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:36s} {best*1e3:9.2f} ms  ({S/best:,.0f} env-steps/s equiv)")
    return out


# 0. world only
timeit("env_step (world only)", jax.jit(partial(env_step, max_cbvs=C)),
       tmap, spec, state, crit)

# 1. shared per-tick history encoding (once per world agent)
f_hist = jax.jit(shared_history_features)
timeit("shared_history_features", f_hist, state)

# 2. full canonical feature build
slots = jax.jit(partial(cbv_slot_assignment, max_cbvs=C))(state.is_cbv)
f_feat = jax.jit(
    lambda st, sl: build_cbv_features(tmap, st, sl, spec, canonical=True)
)
feats, slot_valid, shared = timeit("build_cbv_features canonical", f_feat,
                                   state, slots)

# 3. forward with gathered tokens
flat = jax.tree.map(lambda x: x.reshape((S * C,) + x.shape[2:]), feats)
model_in = dict(flat)
model_in["shared"] = {**shared, "scen_idx": jnp.repeat(jnp.arange(S), C),
                      "map_tok": map_tok}
f_fwd = jax.jit(lambda p, mi: model.apply(p, mi))
out = timeit("model.apply canonical (B=192)", f_fwd, params, model_in)

# 4. full act eval / train
f_act = jax.jit(lambda p, st: pluto_cbv_act(
    model, p, tmap, spec, st, max_cbvs=C, train=False, canonical=True,
    map_tok=map_tok))
timeit("pluto_cbv_act eval canonical", f_act, params, state)
f_act_t = jax.jit(lambda p, st: pluto_cbv_act(
    model, p, tmap, spec, st, max_cbvs=C, train=True, canonical=True,
    map_tok=map_tok))
timeit("pluto_cbv_act train canonical", f_act_t, params, state, n=10)

# 5. fused chunks
for train in (False, True):
    def f_chunk(st, cr, train=train):
        s2, c2, _ = rollout_chunk(
            model, params, tmap, spec, st, cr, max_cbvs=C, num_steps=10,
            train=train, canonical=True, map_tok=map_tok)
        return s2, c2
    o = timeit(f"rollout_chunk(10) {'train' if train else 'eval'}",
               f_chunk, state, crit, n=5)
