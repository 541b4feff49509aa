import time, jax, jax.numpy as jnp
from functools import partial
from rift_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from rift_tpu.map import make_grid_town
from rift_tpu.runner import Runner, RunnerConfig
from rift_tpu.scenario.recognition import cbv_slot_assignment
from rift_tpu.models.pluto.features import build_cbv_features

S, A, C = 64, 24, 3
tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(num_scenarios=S, num_agents=A, max_cbvs=C)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()
slots = jax.jit(lambda m: cbv_slot_assignment(m, C))(state.is_cbv)
feats, _ = jax.jit(lambda st, sl: build_cbv_features(tmap, st, sl, spec))(state, slots)
flat = jax.tree.map(lambda x: x.reshape((S*C,)+x.shape[2:]), feats)
f = jax.jit(lambda p, x: r.model.apply(p, x))
f(r.params, flat)["probability"].block_until_ready()

jax.profiler.start_trace("/tmp/jaxtrace")
for _ in range(10):
    out = f(r.params, flat)
jax.block_until_ready(out["probability"])
jax.profiler.stop_trace()
print("trace done")
