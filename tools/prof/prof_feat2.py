import time, jax, jax.numpy as jnp
from functools import partial
from rift_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from rift_tpu.map import make_grid_town
from rift_tpu.runner import Runner, RunnerConfig
from rift_tpu.scenario.recognition import cbv_slot_assignment
from rift_tpu.models.pluto.features import build_cbv_features
from rift_tpu.models.pluto.policy import pluto_cbv_act

S, A, C = 64, 24, 3
tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(num_scenarios=S, num_agents=A, max_cbvs=C)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()

def timeit(name, fn, *args, n=30, trials=3):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:36s} {best*1e3:9.3f} ms (best of {trials})")
    return out

slots = jax.jit(partial(cbv_slot_assignment, max_cbvs=C))(state.is_cbv)
f_feat = jax.jit(lambda st, sl: build_cbv_features(tmap, st, sl, spec))
timeit("build_cbv_features (new refs)", f_feat, state, slots)
f_act = jax.jit(lambda p, st: pluto_cbv_act(r.model, p, tmap, spec, st, max_cbvs=C, train=False))
timeit("pluto_cbv_act eval", f_act, r.params, state)
f_act_t = jax.jit(lambda p, st: pluto_cbv_act(r.model, p, tmap, spec, st, max_cbvs=C, train=True))
timeit("pluto_cbv_act train", f_act_t, r.params, state, n=10)
