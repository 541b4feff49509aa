"""Round-5 knockouts, part 2: split feature-build vs model cost, model
internals, and scan/dispatch overhead.

    python tools/prof/prof_r5_knock2.py [chunk]
"""

import sys
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

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
    print(f"{name:40s} {ms:9.3f} ms/tick   (compile {comp:.1f}s)", flush=True)
    return ms


import rift_tpu.models.pluto.layers as L  # noqa: E402

base = timeit("baseline")
timeit("baseline K=50 (dispatch check)", chunk=50)

# cheap INPUT-DEPENDENT model: keeps the feature build alive through DCE
orig_call = type(model).__call__
R_, M_, T_ = 4, 12, 80
def sum_model(self, data):
    if isinstance(data, dict) and data.get("map_tokens_only"):
        return orig_call(self, data)
    B = data["current_state"].shape[0]
    leaves = [
        x.astype(jnp.float32).sum()
        for x in jax.tree.leaves(
            {k: v for k, v in data.items() if k != "shared"}
        )
    ] + [data["shared"]["hist_feat"].sum()]
    t = sum(leaves) * 1e-9
    return {
        "trajectory": jnp.zeros((B, R_, M_, T_, 6)) + t,
        "candidate_trajectories": jnp.zeros((B, R_, M_, T_, 3)) + t,
        "probability": jnp.zeros((B, R_, M_)) + t,
        "output_ref_free_trajectory": jnp.zeros((B, T_, 3)) + t,
    }
type(model).__call__ = sum_model
timeit("-model only (features stay live)")
type(model).__call__ = orig_call

# ---- model internals ------------------------------------------------------
orig_hist = L.HistoryEncoder.__call__
def cheap_hist(self, x, deterministic=True):
    return nn.Dense(self.embed_dim * 4, dtype=self.dtype)(x).mean(-2)
L.HistoryEncoder.__call__ = cheap_hist
timeit("-HistoryEncoder")
L.HistoryEncoder.__call__ = orig_hist

orig_pts = L.PointsEncoder.__call__
def cheap_pts(self, x, mask):
    h = nn.Dense(self.out_dim, dtype=self.dtype)(x)
    return jnp.where(mask[..., None], h, -1e9).max(axis=-2)
L.PointsEncoder.__call__ = cheap_pts
timeit("-PointsEncoder (refline rows)")
L.PointsEncoder.__call__ = orig_pts

orig_tel = L.TransformerEncoderLayer.__call__
def cheap_tel(self, x, key_padding_mask=None, deterministic=True):
    return x + nn.Dense(self.dim, dtype=self.dtype)(x)
L.TransformerEncoderLayer.__call__ = cheap_tel
timeit("-encoder layers (4x)")
L.TransformerEncoderLayer.__call__ = orig_tel

import rift_tpu.models.pluto.model as MM  # noqa: E402

orig_dec = MM.DecoderLayer.__call__
def cheap_dec(self, tgt, memory, r_key_padding, memory_key_padding, m_pos,
              deterministic=True):
    return tgt + nn.Dense(self.dim, dtype=self.dtype)(tgt)
MM.DecoderLayer.__call__ = cheap_dec
timeit("-decoder layers (4x)")
MM.DecoderLayer.__call__ = orig_dec

orig_pred = MM.AgentPredictor.__call__
def cheap_pred(self, x):
    B, N, _ = x.shape
    return jnp.zeros((B, N, self.future_steps, 6), x.dtype)
MM.AgentPredictor.__call__ = cheap_pred
timeit("-AgentPredictor aux head")
MM.AgentPredictor.__call__ = orig_pred

orig_mlp = L.MLPLayer.__call__
def cheap_mlp(self, x):
    return nn.Dense(self.out, dtype=self.dtype)(x)
L.MLPLayer.__call__ = cheap_mlp
timeit("-MLP heads (loc/yaw/vel/pi/rf)")
L.MLPLayer.__call__ = orig_mlp

orig_f = L.FourierEmbedding.__call__
def cheap_four(self, x):
    return nn.Dense(self.dim, dtype=self.dtype)(x)
L.FourierEmbedding.__call__ = cheap_four
timeit("-FourierEmbedding")
L.FourierEmbedding.__call__ = orig_f

orig_sae = L.StateAttentionEncoder.__call__
def cheap_sae(self, x, deterministic=True):
    return nn.Dense(self.dim, dtype=self.dtype)(x)
L.StateAttentionEncoder.__call__ = cheap_sae
timeit("-StateAttentionEncoder")
L.StateAttentionEncoder.__call__ = orig_sae
