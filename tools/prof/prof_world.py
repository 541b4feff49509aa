import time, jax, jax.numpy as jnp
from functools import partial
from rift_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from rift_tpu.map import make_grid_town
from rift_tpu.runner import Runner, RunnerConfig
from rift_tpu.sim.world import autopilot_waypoints, autopilot_target_speed
from rift_tpu.sim.autopilot import find_leaders, lane_follow_waypoints
from rift_tpu.sim.pid import track_step
from rift_tpu.geometry.obb import obb_overlap
from rift_tpu.sim.world import step as world_step

S, A, C = 64, 24, 3
tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(num_scenarios=S, num_agents=A, max_cbvs=C)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()

def timeit(name, fn, *args, n=30, trials=4):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{name:36s} {best*1e3:9.3f} ms")
    return out

timeit("world_step full", jax.jit(partial(world_step, dt=0.1)), tmap, spec, state)
timeit("autopilot_target_speed", jax.jit(lambda st: autopilot_target_speed(tmap, st)), state)
timeit("autopilot_waypoints", jax.jit(lambda st: autopilot_waypoints(tmap, st, 0.1)), state)
wp = autopilot_waypoints(tmap, state, 0.1)
timeit("track_step (PID)", jax.jit(lambda st, w: track_step(st.tracker, w, st.speed)), state, wp)
timeit("find_leaders", jax.jit(lambda st: find_leaders(st.pos, st.heading, st.speed, st.shape, st.alive)), state)
timeit("nearest_lane", jax.jit(lambda st: tmap.nearest_lane(st.pos, st.heading)), state)
timeit("on_road", jax.jit(lambda st: tmap.on_road(st.pos)), state)
timeit("obb_overlap AxA", jax.jit(lambda st: obb_overlap(st.pos[:,:,None], st.heading[:,:,None], st.shape[:,:,None], st.pos[:,None,:], st.heading[:,None,:], st.shape[:,None,:])), state)
timeit("route progress", jax.jit(lambda st: jnp.argmin(jnp.sum((spec.ego_route[...,:2]-st.pos[:,0,None])**2,-1),-1)), state)
