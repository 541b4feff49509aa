"""Round-5 final: model-internal knockouts on the eval chunk (param-free
stubs), for the round-6 roadmap.

    python tools/prof/prof_r5_model.py [chunk]
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
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 40

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
import rift_tpu.models.pluto.model as MM  # noqa: E402

base = timeit("baseline")

orig_hist = L.HistoryEncoder.__call__
def cheap_hist(self, x, deterministic=True):
    out_dim = self.embed_dim * 4
    base_ = x.mean(axis=(-1, -2))[..., None]
    return jnp.broadcast_to(base_, base_.shape[:-1] + (out_dim,)).astype(
        self.dtype or jnp.float32
    )
L.HistoryEncoder.__call__ = cheap_hist
timeit("-HistoryEncoder")
L.HistoryEncoder.__call__ = orig_hist

orig_pts = L.PointsEncoder.__call__
def cheap_pts(self, x, mask):
    base_ = jnp.where(mask, x.mean(-1), -1e9).max(-1)[..., None]
    return jnp.broadcast_to(
        base_, base_.shape[:-1] + (self.out_dim,)
    ).astype(self.dtype or jnp.float32)
L.PointsEncoder.__call__ = cheap_pts
timeit("-PointsEncoder (refline rows)")
L.PointsEncoder.__call__ = orig_pts

orig_dec = MM.DecoderLayer.__call__
def cheap_dec(self, tgt, memory, r_key_padding, memory_key_padding, m_pos,
              deterministic=True):
    return tgt + memory.mean(1)[:, None, None, :].astype(tgt.dtype)
MM.DecoderLayer.__call__ = cheap_dec
timeit("-decoder layers (4x)")
MM.DecoderLayer.__call__ = orig_dec

orig_tel = L.TransformerEncoderLayer.__call__
def cheap_tel(self, x, key_padding_mask=None, deterministic=True):
    return x + x.mean(-1, keepdims=True)
L.TransformerEncoderLayer.__call__ = cheap_tel
timeit("-encoder layers (4x)")
L.TransformerEncoderLayer.__call__ = orig_tel

orig_mlp = L.MLPLayer.__call__
def cheap_mlp(self, x):
    base_ = x.mean(-1, keepdims=True)
    return jnp.broadcast_to(
        base_, x.shape[:-1] + (self.out,)
    ).astype(x.dtype)
L.MLPLayer.__call__ = cheap_mlp
timeit("-MLP heads (loc/yaw/vel/pi/rf)")
L.MLPLayer.__call__ = orig_mlp
