import time, jax
from rift_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from rift_tpu.map import make_grid_town
from rift_tpu.runner import Runner, RunnerConfig
from rift_tpu.rollout import rollout_chunk

S, A, C = 64, 24, 3
tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(num_scenarios=S, num_agents=A, max_cbvs=C, encoder_depth=4, decoder_depth=4)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()

def chunk(st, cr, n):
    s2, c2, _ = rollout_chunk(r.model, r.params, tmap, spec, st, cr, max_cbvs=C, num_steps=n, train=False)
    return s2, c2

for nsteps in (10, 50):
    # warm compile
    s, c = chunk(state, crit, nsteps)
    jax.block_until_ready(s.pos)

    # independent calls
    t0 = time.perf_counter()
    for _ in range(5):
        s, c = chunk(state, crit, nsteps)
    jax.block_until_ready(s.pos)
    dt_i = time.perf_counter() - t0
    print(f"CHUNK={nsteps:3d} independent: {dt_i/5*1e3:8.1f} ms/call -> {5*nsteps*S/dt_i:8.0f} steps/s")

    # dependent chain
    s, c = state, crit
    t0 = time.perf_counter()
    for _ in range(5):
        s, c = chunk(s, c, nsteps)
    jax.block_until_ready(s.pos)
    dt_d = time.perf_counter() - t0
    print(f"CHUNK={nsteps:3d} dependent:   {dt_d/5*1e3:8.1f} ms/call -> {5*nsteps*S/dt_d:8.0f} steps/s")

print("--- per-call timing, dependent chain, CHUNK=10 ---")
s, c = chunk(state, crit, 10)
jax.block_until_ready(s.pos)
s, c = state, crit
for i in range(8):
    t0 = time.perf_counter()
    s, c = chunk(s, c, 10)
    t_disp = time.perf_counter() - t0
    jax.block_until_ready(s.pos)
    t_tot = time.perf_counter() - t0
    print(f"call {i}: dispatch {t_disp*1e3:8.1f} ms  total {t_tot*1e3:8.1f} ms")

print("--- world-only dependent chain ---")
def wchunk(st, cr, n):
    s2, c2, _ = rollout_chunk(r.model, r.params, tmap, spec, st, cr, max_cbvs=C, num_steps=n, train=False, with_policy=False)
    return s2, c2
s, c = wchunk(state, crit, 10)
jax.block_until_ready(s.pos)
s, c = state, crit
for i in range(5):
    t0 = time.perf_counter()
    s, c = wchunk(s, c, 10)
    t_disp = time.perf_counter() - t0
    jax.block_until_ready(s.pos)
    print(f"call {i}: dispatch {t_disp*1e3:8.1f} ms  total {(time.perf_counter()-t0)*1e3:8.1f} ms")
