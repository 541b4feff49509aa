import time, jax, jax.numpy as jnp
from functools import partial
from rift_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from rift_tpu.map import make_grid_town
from rift_tpu.runner import Runner, RunnerConfig
from rift_tpu.scenario.recognition import cbv_slot_assignment, recognize_cbvs
from rift_tpu.map.reference_lines import reference_lines_from_chains
from rift_tpu.sim.world import step as world_step
from rift_tpu.scenario.criteria import update_criteria
from rift_tpu.ego.rule_ego import rule_ego_waypoints

S, A, C = 64, 24, 3
tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(num_scenarios=S, num_agents=A, max_cbvs=C, encoder_depth=4, decoder_depth=4)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()
params, model = r.params, r.model

def timeit(name, fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1e3:9.3f} ms")
    return out

slots = jax.jit(partial(cbv_slot_assignment, max_cbvs=C))(state.is_cbv)
scen = jnp.broadcast_to(jnp.arange(S)[:, None], (S, C))
sl = jnp.maximum(slots, 0)

# ---- feature sub-parts ----
cpos = state.pos[scen, sl]  # [S, C, 2]
flatp = cpos.reshape(S * C, 2)

f_q = jax.jit(lambda p: jax.vmap(lambda q: tmap.query_proximal(q, 120.0, 64))(p))
li, lin = timeit("query_proximal x192", f_q, flatp)

f_gather = jax.jit(lambda li: (tmap.centerline[jnp.maximum(li,0)], tmap.left_edge[jnp.maximum(li,0)], tmap.right_edge[jnp.maximum(li,0)]))
timeit("edge gathers [192,64,21,2]x3", f_gather, li)

cur_lane = state.lane[scen, sl]
def refs_one(ch, lane, p):
    return reference_lines_from_chains(tmap, ch, lane, p, num_refs=4, num_points=120)
f_refs = jax.jit(lambda lanes, ps: jax.vmap(jax.vmap(refs_one))(spec.lane_chains[jnp.broadcast_to(jnp.arange(S)[:,None],(S,C))] if False else jnp.broadcast_to(spec.lane_chains[:,None],(S,C)+spec.lane_chains.shape[1:]), lanes, ps))
timeit("reference_lines x192", f_refs, cur_lane, cpos)

# history gather part
def agents_one(scenario, agent):
    pos = state.pos[scenario]
    d = jnp.linalg.norm(pos - pos[agent], axis=-1)
    neg, nbr = jax.lax.top_k(-d, 23)
    order = jnp.concatenate([agent[None], nbr])
    return state.hist_pos[scenario][order], state.hist_heading[scenario][order], state.hist_vel[scenario][order]
f_ag = jax.jit(lambda sc, sl: jax.vmap(jax.vmap(agents_one))(sc, sl))
timeit("agent history gathers", f_ag, scen, sl)

# ---- env_step sub-parts ----
f_ego = jax.jit(lambda st: rule_ego_waypoints(spec, st, 0.1, tmap=tmap))
ego_traj = timeit("rule_ego_waypoints", f_ego, state)

T = ego_traj.shape[-2]
traj = jnp.zeros((S, A, T, 2)).at[:, 0].set(ego_traj)
traj_mask = jnp.zeros((S, A), bool).at[:, 0].set(True)
ctrl = jnp.zeros((S, A, 3))
ctrl_mask = jnp.zeros((S, A), bool)
f_world = jax.jit(lambda st: world_step(tmap, spec, st, traj=traj, traj_mask=traj_mask, ctrl=ctrl, ctrl_mask=ctrl_mask, dt=0.1))
st2 = timeit("world_step", f_world, state)

f_crit = jax.jit(lambda c, st: update_criteria(c, st, spec, 0.1, tmap=tmap))
timeit("update_criteria", f_crit, crit, state)

f_recog = jax.jit(lambda st: recognize_cbvs(tmap, spec, st, C))
timeit("recognize_cbvs", f_recog, state)

# ---- model parts ----
from rift_tpu.models.pluto.features import build_cbv_features
feats, _ = jax.jit(lambda st, sl: build_cbv_features(tmap, st, sl, spec))(state, slots)
flat = jax.tree.map(lambda x: x.reshape((S*C,)+x.shape[2:]), feats)
f_fwd = jax.jit(lambda p, f: model.apply(p, f))
timeit("model.apply full", f_fwd, params, flat)
