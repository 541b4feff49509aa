import time, jax, jax.numpy as jnp
from rift_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from rift_tpu.rl.evaluator import rollout_candidates, forecast_neighbors, ref_line_matrices, grpo_advantage, derive_kinematics
from rift_tpu.geometry.obb import obb_overlap
import numpy as np

B = 192  # S*C CBVs
G = 48   # R*M candidates
T = 40
rng = np.random.default_rng(0)
ref_pos = jnp.asarray(np.cumsum(rng.normal(0.5, 0.2, (B, G, T, 2)), axis=2).astype(np.float32))
ref_h = jnp.asarray(rng.normal(0, 0.1, (B, G, T)).astype(np.float32))
v0 = jnp.asarray(rng.uniform(0, 10, (B,)).astype(np.float32))

def timeit(name, fn, *args, n=20, trials=3):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:36s} {best*1e3:9.3f} ms", flush=True)
    return out

f_roll = jax.jit(lambda rp, rh, v: jax.vmap(rollout_candidates)(rp, rh, v))
out = timeit("rollout_candidates x192", f_roll, ref_pos, ref_h, v0)

c, h, s = out
f_kin = jax.jit(lambda h, s: derive_kinematics(h, s))
timeit("derive_kinematics", f_kin, h, s)

nbr_pos = jnp.asarray(rng.normal(0, 30, (B, 8, 2)).astype(np.float32))
nbr_h = jnp.zeros((B, 8)); nbr_v = jnp.ones((B, 8)) * 5
nbr_c = jnp.zeros((B, 8, 3)); nbr_s = jnp.ones((B, 8, 2)) * 2
nbr_va = jnp.ones((B, 8), bool)
f_fore = jax.jit(lambda p, hh, v, ct, sh, va: jax.vmap(forecast_neighbors)(p, hh, v, ct, sh, va))
nb = timeit("forecast_neighbors x192", f_fore, nbr_pos, nbr_h, nbr_v, nbr_c, nbr_s, nbr_va)

nb_c, nb_h, nb_s, nb_v = nb
shape = jnp.ones((B, 2)) * 2
f_obb = jax.jit(lambda c, h, nc, nh, ns: obb_overlap(
    c[:, :, None], h[:, :, None], jnp.broadcast_to(shape[:, None, None, None], c.shape[:2] + (T, 2))[:, :, None].squeeze(2)[:, :, None] if False else jnp.broadcast_to(shape[:, None, None], (B, G, T, 2))[:, :, None],
    nc[:, None], nh[:, None], ns[:, None]))
# simpler: reshape to [B*G, ...] vs [B*8...]
def obb_call(c, h, nc, nh, ns):
    return obb_overlap(
        c[:, :, None], h[:, :, None],
        jnp.broadcast_to(shape[:, None, None, :], (B, G, T, 2))[:, :, None],
        nc[:, None], nh[:, None], ns[:, None])
f_obb = jax.jit(obb_call)
timeit("obb collisions [B,G,8,T]", f_obb, c, h, nb_c, nb_h, nb_s)

rl_pos = jnp.asarray(rng.normal(0, 50, (B, 4, 120, 2)).astype(np.float32))
rl_h = jnp.zeros((B, 4, 120)); rl_v = jnp.ones((B, 4, 120), bool)
cand = jnp.asarray(rng.normal(0, 20, (B, 4, 12, T, 2)).astype(np.float32))
cand_h = jnp.zeros((B, 4, 12, T))
f_rlm = jax.jit(lambda cp, ch, rp, rh, rv: jax.vmap(ref_line_matrices)(cp, ch, rp, rh, rv))
timeit("ref_line_matrices x192", f_rlm, cand, cand_h, rl_pos, rl_h, rl_v)
