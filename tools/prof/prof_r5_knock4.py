"""Round-5 knockouts, part 4: feature-build internals, in-chunk.

    python tools/prof/prof_r5_knock4.py [chunk]
"""

import sys
import time

import jax
import jax.numpy as jnp

from rift_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from rift_tpu.map import make_grid_town  # noqa: E402
from rift_tpu.runner import Runner, RunnerConfig  # noqa: E402

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


def run_chunk(chunk=CHUNK):
    from rift_tpu.models.pluto.policy import canonical_map_tokens
    from rift_tpu.rollout import rollout_chunk

    map_tok = canonical_map_tokens(model, params, tmap)

    def fn(s, c):
        s, c, _ = rollout_chunk(
            model, params, tmap, spec, s, c, max_cbvs=C, num_steps=chunk,
            train=False, with_policy=True, canonical=True, map_tok=map_tok,
        )
        return s, c
    return fn


def timeit(name, n=4, trials=3, chunk=CHUNK):
    jax.clear_caches()
    fn = run_chunk(chunk)
    t0 = time.perf_counter()
    s, c = fn(state, crit)
    jax.block_until_ready(s.pos)
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        s, c = state, crit
        for _ in range(n):
            s, c = fn(s, c)
            jax.block_until_ready(s.pos)
        best = min(best, (time.perf_counter() - t0) / n)
    ms = best * 1e3 / chunk
    print(f"{name:44s} {ms:9.3f} ms/tick   (compile {comp:.1f}s)", flush=True)
    return ms


from rift_tpu.map.tensor_map import TensorMap  # noqa: E402
import rift_tpu.map.reference_lines as RL  # noqa: E402
import rift_tpu.models.pluto.features as F  # noqa: E402

base = timeit("baseline")

# query_proximal -> first max_objects valid lanes, no distance sort
orig_qp = TensorMap.query_proximal
def cheap_qp(self, point, radius, max_objects):
    idx = jnp.arange(max_objects, dtype=jnp.int32)
    idx = jnp.broadcast_to(idx, point.shape[:-1] + (max_objects,))
    return idx, jnp.ones(point.shape[:-1] + (max_objects,), bool)
TensorMap.query_proximal = cheap_qp
timeit("-query_proximal (fixed 64 lanes)")
TensorMap.query_proximal = orig_qp

# reference lines -> straight dummy
orig_rl = RL.reference_lines_from_chains
def cheap_rl(tmap_, chains_s, cur_lane, position, num_refs=4,
             num_points=120, max_length=120.0):
    t = jnp.arange(num_points, dtype=jnp.float32)
    pos = jnp.stack([position[0] + t, jnp.full((num_points,), position[1])],
                    axis=-1)
    pos = jnp.broadcast_to(pos[None], (num_refs, num_points, 2))
    return {
        "position": pos,
        "vector": jnp.ones((num_refs, num_points, 2)),
        "orientation": jnp.zeros((num_refs, num_points)),
        "valid_mask": jnp.ones((num_refs, num_points), bool),
    }
RL.reference_lines_from_chains = cheap_rl
timeit("-reference lines")
RL.reference_lines_from_chains = orig_rl

# neighbor selection -> identity order (no top_k)
import rift_tpu.models.pluto.features as FF  # noqa: E402

orig_bfa = FF.build_features_for_agent
src_topk = jax.lax.top_k
def no_topk(x, k):
    # first-k instead of top-k (shape-compatible)
    idx = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32), x.shape[:-1] + (k,)
    )
    vals = jnp.take_along_axis(x, idx, axis=-1)
    return vals, idx
jax.lax.top_k = no_topk
timeit("-ALL top_k (first-k)")
jax.lax.top_k = src_topk

# shared history features -> zeros
orig_shf = F.shared_history_features
def cheap_shf(state_):
    S_, A_, H_ = state_.hist_valid.shape
    return jnp.zeros((S_, A_, H_ - 1, 9))
F.shared_history_features = cheap_shf
import rift_tpu.models.pluto.policy as POL  # noqa: E402
timeit("-shared_history_features")
F.shared_history_features = orig_shf

# on_route / chain compare -> all true
orig_orm = TensorMap.on_route_mask
TensorMap.on_route_mask = lambda self, rr, rl_: jnp.ones(
    (self.num_lanes,), bool
)
timeit("-on_route_mask")
TensorMap.on_route_mask = orig_orm

# project (used by ref lines s0 + autopilot + junction yield)
orig_proj = TensorMap.project
def cheap_proj(self, lane_idx, point):
    z = jnp.zeros(jnp.broadcast_shapes(
        jnp.shape(lane_idx), point.shape[:-1]
    ))
    return z, z, z
TensorMap.project = cheap_proj
timeit("-tmap.project (all callers)")
TensorMap.project = orig_proj
