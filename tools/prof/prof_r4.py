"""Round-4 per-stage profile of the CANONICAL-mode eval/train tick.

Best-of-N standalone timings at the bench config (S=64, A=24, C=3) —
run on the real chip; relative comparisons only (shared device).

    python tools/prof/prof_r4.py [ticks]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from rift_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from rift_tpu.map import make_grid_town  # noqa: E402
from rift_tpu.models.pluto.features import (  # noqa: E402
    build_cbv_features,
    shared_history_features,
)
from rift_tpu.models.pluto.policy import (  # noqa: E402
    canonical_map_tokens,
    pluto_cbv_act,
)
from rift_tpu.rollout import rollout_chunk  # noqa: E402
from rift_tpu.runner import Runner, RunnerConfig  # noqa: E402
from rift_tpu.scenario.env import env_step  # noqa: E402
from rift_tpu.scenario.recognition import cbv_slot_assignment  # noqa: E402

S, A, C = 64, 24, 3
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 20

tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(
    num_scenarios=S, num_agents=A, max_cbvs=C,
    encoder_depth=4, decoder_depth=4, canonical=True,
)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()
params, model = r.params, r.model
map_tok = canonical_map_tokens(model, params, tmap)


def timeit(name, fn, *args, n=10, trials=4, per_tick=1, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    ms = best * 1e3 / per_tick
    print(f"{name:44s} {ms:9.3f} ms/tick   (compile+1st {c:.1f}s)",
          flush=True)
    return out


# ---- end-to-end chunks (the bench numbers) --------------------------------
def mk(train, with_policy=True):
    def fn(s, c):
        s, c, _ = rollout_chunk(
            model, params, tmap, spec, s, c, max_cbvs=C, num_steps=CHUNK,
            train=train, with_policy=with_policy, canonical=True,
            map_tok=map_tok,
        )
        return s, c
    return fn


timeit(f"rollout_chunk world-only (K={CHUNK})", mk(False, False), state, crit,
       per_tick=CHUNK, n=3)
timeit(f"rollout_chunk eval (K={CHUNK})", mk(False), state, crit,
       per_tick=CHUNK, n=3)
timeit(f"rollout_chunk train (K={CHUNK})", mk(True), state, crit,
       per_tick=CHUNK, n=2)

# ---- per-stage standalone --------------------------------------------------
f_world = jax.jit(partial(env_step, max_cbvs=C))
timeit("env_step standalone", f_world, tmap, spec, state, crit)

slots = jax.jit(lambda m: cbv_slot_assignment(m, C))(state.is_cbv)

f_feat = jax.jit(
    lambda st, sl: build_cbv_features(
        tmap, st, sl, spec, canonical=True, with_sample_feats=False
    )
)
feats, slot_valid, shared = timeit("build_cbv_features canonical", f_feat,
                                   state, slots)

f_hist = jax.jit(shared_history_features)
hf = timeit("shared_history_features", f_hist, state)

# the canonical forward exactly as pluto_cbv_act assembles it
flat = jax.tree.map(lambda x: x.reshape((S * C,) + x.shape[2:]), feats)
model_in = dict(flat)
model_in["shared"] = {**shared, "scen_idx": jnp.repeat(jnp.arange(S), C)}
model_in["shared"]["map_tok"] = map_tok
f_fwd = jax.jit(lambda p, x: model.apply(p, x))
out = timeit("model.apply canonical (B=192)", f_fwd, params, model_in)

# HistoryEncoder isolated at canonical row count [S*A, 20, 9]
from rift_tpu.models.pluto.layers import HistoryEncoder  # noqa: E402
from rift_tpu.utils.cache import init_params_on_cpu  # noqa: E402

he = HistoryEncoder(embed_dim=32, dtype=jnp.bfloat16)
x_hist = shared["hist_feat"].reshape(S * A, 20, 9)
p_he = init_params_on_cpu(lambda x: he.init(jax.random.PRNGKey(0), x), x_hist)
f_he = jax.jit(lambda p, x: he.apply(p, x))
timeit("HistoryEncoder [S*A=1536, 20, 9]", f_he, p_he, x_hist)

# forward minus history: feed precomputed hist tokens? -> knockout by
# replacing hist_feat with zeros has same cost; instead time the decoder-ish
# remainder via act eval vs act train deltas below.
f_act = jax.jit(
    lambda p, st: pluto_cbv_act(
        model, p, tmap, spec, st, max_cbvs=C, train=False,
        canonical=True, map_tok=map_tok,
    )
)
res = timeit("pluto_cbv_act eval", f_act, params, state)

f_act_t = jax.jit(
    lambda p, st: pluto_cbv_act(
        model, p, tmap, spec, st, max_cbvs=C, train=True,
        canonical=True, map_tok=map_tok,
    )
)
timeit("pluto_cbv_act train", f_act_t, params, state, n=5)

f_step2 = jax.jit(partial(env_step, max_cbvs=C))
timeit("env_step with cbv traj", f_step2, tmap, spec, state, crit,
       cbv_traj=res["traj"], cbv_traj_mask=res["mask"])
