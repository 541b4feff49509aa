import time, jax, jax.numpy as jnp
from functools import partial
from rift_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from rift_tpu.map import make_grid_town
from rift_tpu.runner import Runner, RunnerConfig
from rift_tpu.models.pluto.policy import pluto_cbv_act
from rift_tpu.models.pluto.features import build_cbv_features
from rift_tpu.scenario.recognition import cbv_slot_assignment
from rift_tpu.scenario.env import env_step

S, A, C = 64, 24, 3
tmap = make_grid_town(blocks=2, num_lanes=2)
print("lanes:", tmap.centerline.shape if hasattr(tmap, "centerline") else {k: getattr(tmap, k).shape for k in tmap.__dataclass_fields__ if hasattr(getattr(tmap, k), "shape")})
cfg = RunnerConfig(num_scenarios=S, num_agents=A, max_cbvs=C, encoder_depth=4, decoder_depth=4)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()
params = r.params
model = r.model


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt*1e3:9.2f} ms  ({S*1/dt:,.0f} env-steps/s equiv)")
    return out

# 1. world-only step
f_world = jax.jit(partial(env_step, max_cbvs=C))
timeit("env_step (world only)", f_world, tmap, spec, state, crit)

# 2. slot assignment
f_slots = jax.jit(partial(cbv_slot_assignment, max_cbvs=C))
slots = timeit("cbv_slot_assignment", f_slots, state.is_cbv)

# 3. features
f_feat = jax.jit(lambda st, sl: build_cbv_features(tmap, st, sl, spec))
feats, slot_valid = timeit("build_cbv_features", f_feat, state, slots)

# 4. model forward
flat_feats = jax.tree.map(lambda x: x.reshape((S * C,) + x.shape[2:]), feats)
f_fwd = jax.jit(lambda p, f: model.apply(p, f))
out = timeit("model.apply (B=192)", f_fwd, params, flat_feats)
for k, v in out.items():
    print("   out:", k, v.shape, v.dtype)

# 5. full act eval
f_act = jax.jit(lambda p, st: pluto_cbv_act(model, p, tmap, spec, st, max_cbvs=C, train=False))
res = timeit("pluto_cbv_act eval", f_act, params, state)

# 6. env_step with traj
f_step2 = jax.jit(partial(env_step, max_cbvs=C))
timeit("env_step (with traj)", f_step2, tmap, spec, state, crit, cbv_traj=res["traj"], cbv_traj_mask=res["mask"])

# 7. act train mode
f_act_t = jax.jit(lambda p, st: pluto_cbv_act(model, p, tmap, spec, st, max_cbvs=C, train=True))
timeit("pluto_cbv_act train", f_act_t, params, state, n=10)

# 8. fused rollout_chunk eval
from rift_tpu.rollout import rollout_chunk
def f_chunk(st, cr):
    s2, c2, _ = rollout_chunk(model, params, tmap, spec, st, cr, max_cbvs=C, num_steps=10, train=False)
    return s2, c2
out = timeit("rollout_chunk(10) eval", f_chunk, state, crit, n=5)
print("   (per tick:", end=" ")

# 9. manual scan of act+step only
import jax
def manual(st, cr):
    def body(carry, _):
        st, cr = carry
        res = pluto_cbv_act(model, params, tmap, spec, st, max_cbvs=C, train=False)
        st2, cr2 = env_step(tmap, spec, st, cr, cbv_traj=res["traj"], cbv_traj_mask=res["mask"], max_cbvs=C)
        return (st2, cr2), None
    (st, cr), _ = jax.lax.scan(body, (st, cr), None, length=10)
    return st, cr
f_manual = jax.jit(manual)
timeit("manual scan(act+step) x10", f_manual, state, crit, n=5)

# 10. python loop of act+step (no outer scan)
def pyloop(st, cr):
    for _ in range(10):
        res = f_act(params, st)
        st, cr = f_step2(tmap, spec, st, cr, cbv_traj=res["traj"], cbv_traj_mask=res["mask"])
    return st, cr
timeit("python loop(act+step) x10", pyloop, state, crit, n=5)
