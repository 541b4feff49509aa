"""Round-5 KNOCKOUT profile of the fused rollout chunk.

Standalone per-stage timings are tunnel-polluted (each tiny dispatch pays
tunnel latency and loses cross-stage CSE). The truth is the marginal cost
of a stage INSIDE rollout_chunk: patch the stage to a cheap shape-preserving
stub, retrace (jax.clear_caches), and measure the delta on the full chunk.

    python tools/prof/prof_r5_knock.py [eval|train|world] [chunk]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from rift_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from rift_tpu.map import make_grid_town  # noqa: E402
from rift_tpu.runner import Runner, RunnerConfig  # noqa: E402

S, A, C = 64, 24, 3
MODE = sys.argv[1] if len(sys.argv) > 1 else "eval"
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 20

tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(
    num_scenarios=S, num_agents=A, max_cbvs=C,
    encoder_depth=4, decoder_depth=4, canonical=True,
)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()
params, model = r.params, r.model


def run_chunk():
    from rift_tpu.models.pluto.policy import canonical_map_tokens
    from rift_tpu.rollout import rollout_chunk

    map_tok = canonical_map_tokens(model, params, tmap)

    def fn(s, c):
        s, c, _ = rollout_chunk(
            model, params, tmap, spec, s, c, max_cbvs=C, num_steps=CHUNK,
            train=(MODE == "train"), with_policy=(MODE != "world"),
            canonical=True, map_tok=map_tok,
        )
        return s, c
    return fn


def timeit(name, n=4, trials=3):
    jax.clear_caches()
    fn = run_chunk()
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
    ms = best * 1e3 / CHUNK
    print(f"{name:36s} {ms:9.3f} ms/tick   (compile {comp:.1f}s)", flush=True)
    return ms


import rift_tpu.models.pluto.policy as POL  # noqa: E402
import rift_tpu.rl.evaluator as EV  # noqa: E402
import rift_tpu.scenario.env as ENV  # noqa: E402
import rift_tpu.sim.world as W  # noqa: E402

base = timeit("baseline")

# ---- env_step internals ---------------------------------------------------
orig_wp = W.autopilot_waypoints
def cheap_wp(tmap_, st, dt):
    # straight-ahead constant-spacing waypoints, no IDM/lights/junctions
    n = W.LOOKAHEAD_WAYPOINTS
    t = jnp.arange(1, n + 1, dtype=jnp.float32)
    d = jnp.maximum(st.speed * dt, 1e-3)
    x = d[..., None] * t
    fwd = jnp.stack([jnp.cos(st.heading), jnp.sin(st.heading)], -1)
    return x[..., None] * fwd[..., None, :]
W.autopilot_waypoints = cheap_wp
timeit("-autopilot (IDM/lights/yield/wp)")
W.autopilot_waypoints = orig_wp

from rift_tpu.map.tensor_map import TensorMap  # noqa: E402

orig_nl = TensorMap.nearest_lane
TensorMap.nearest_lane = lambda self, p, heading=None: jnp.zeros(
    p.shape[:-1], jnp.int32
)
timeit("-nearest_lane (world lane bind)")
TensorMap.nearest_lane = orig_nl

orig_onroad = TensorMap.on_road
TensorMap.on_road = lambda self, p, margin=0.3: jnp.ones(p.shape[:-1], bool)
timeit("-on_road")
TensorMap.on_road = orig_onroad

orig_crit = ENV.update_criteria
ENV.update_criteria = lambda crit_, st, sp, dt, tmap=None: crit_
timeit("-criteria")
ENV.update_criteria = orig_crit

orig_recog = ENV.recognize_cbvs
def no_recog(tmap_, sp, st, max_cbvs):
    return (
        st.is_cbv, st.goal, st.goal_valid,
        jnp.full_like(st.lane, -1), jnp.zeros_like(st.is_cbv),
    )
ENV.recognize_cbvs = no_recog
timeit("-recognition")
ENV.recognize_cbvs = orig_recog

from rift_tpu.geometry import obb as OBB  # noqa: E402

orig_obb = W.obb_overlap
W.obb_overlap = lambda p1, h1, s1, p2, h2, s2: jnp.zeros(
    jnp.broadcast_shapes(p1.shape[:-1], p2.shape[:-1]), bool
)
timeit("-collisions (world obb)")
W.obb_overlap = orig_obb

if MODE != "world":
    # ---- policy internals -------------------------------------------------
    orig_feat = POL.build_cbv_features
    def cheap_feats(tmap_, st, slots, sp, canonical=False,
                    with_sample_feats=False, **kw):
        out = orig_feat(tmap_, st, slots, sp, canonical=canonical,
                        with_sample_feats=with_sample_feats, **kw)
        # zero the leaves but keep shapes/dtypes (and downstream model cost)
        z = jax.tree.map(lambda x: jnp.zeros_like(x), out[0])
        if canonical:
            return z, out[1], jax.tree.map(lambda x: jnp.zeros_like(x), out[2])
        return z, out[1]
    POL.build_cbv_features = cheap_feats
    timeit("-feature CONTENT (shapes kept)")
    POL.build_cbv_features = orig_feat

    # knock the whole model forward: emit zero outputs with correct shapes
    from rift_tpu.models.pluto import model as MODMOD

    orig_call = type(model).__call__
    R_, M_, T_ = 4, 12, 80
    def cheap_model(self, data):
        if isinstance(data, dict) and data.get("map_tokens_only"):
            return orig_call(self, data)
        B = data["current_state"].shape[0]
        return {
            "trajectory": jnp.zeros((B, R_, M_, T_, 6)),
            "candidate_trajectories": jnp.zeros((B, R_, M_, T_, 3)),
            "probability": jnp.zeros((B, R_, M_)),
            "output_ref_free_trajectory": jnp.zeros((B, T_, 3)),
        }
    type(model).__call__ = cheap_model
    timeit("-model forward")
    type(model).__call__ = orig_call

if MODE == "train":
    orig_adv = POL.grpo_advantage_batched
    def cheap_adv(tmap_, traj_rm, *args, debug=False, **kw):
        B, R, M = traj_rm.shape[:3]
        return {
            "advantage": jnp.zeros((B, R, M)),
            "valid_mask": jnp.ones((B, R, M), bool),
            "rollout_return": jnp.zeros((B, R, M)),
        }
    POL.grpo_advantage_batched = cheap_adv
    timeit("-grpo advantage (all)")
    POL.grpo_advantage_batched = orig_adv

    # inside the evaluator: the re-tracking rollout only
    orig_retrack = EV.rollout_candidates
    def cheap_retrack(ref_pos, ref_heading, init_speed, dt=0.1,
                      num_frames=EV.NUM_FRAMES):
        G = ref_pos.shape[0]
        return (
            ref_pos[:, :num_frames],
            ref_heading[:, :num_frames],
            jnp.broadcast_to(
                jnp.broadcast_to(init_speed, (G,))[:, None], (G, num_frames)
            ),
        )
    try:
        EV.rollout_candidates = cheap_retrack
        timeit("-retrack rollout (open-loop copy)")
    finally:
        EV.rollout_candidates = orig_retrack

    orig_fore = EV.forecast_neighbors
    def cheap_fore(*args, **kw):
        out = orig_fore(*args, **kw)
        return jax.tree.map(lambda x: jnp.zeros_like(x), out)
    EV.forecast_neighbors = cheap_fore
    timeit("-neighbor forecast content")
    EV.forecast_neighbors = orig_fore

    import rift_tpu.ops.refline as RFL

    orig_rlm = RFL.refline_matrices_pallas
    def cheap_rlm(cand_pos, cand_heading, ref_pos, ref_heading, ref_valid):
        z = jnp.zeros(cand_pos.shape[:-1], cand_pos.dtype)
        return z, z
    RFL.refline_matrices_pallas = cheap_rlm
    timeit("-refline matrices (pallas)")
    RFL.refline_matrices_pallas = orig_rlm

    orig_teacher = W.autopilot_steady_speed
    W.autopilot_steady_speed = lambda tmap_, st: jnp.zeros_like(st.speed)
    timeit("-teacher steady speed")
    W.autopilot_steady_speed = orig_teacher
