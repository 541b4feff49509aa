import time, jax, jax.numpy as jnp
from flax import linen as nn
from rift_tpu.utils import enable_compilation_cache
from rift_tpu.utils.cache import init_params_on_cpu
enable_compilation_cache()
from rift_tpu.map import make_grid_town
from rift_tpu.runner import Runner, RunnerConfig
from rift_tpu.models.pluto.features import build_cbv_features
from rift_tpu.scenario.recognition import cbv_slot_assignment
from rift_tpu.models.pluto import model as M
from rift_tpu.models.pluto import layers as L

S, A, C = 64, 24, 3
tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(num_scenarios=S, num_agents=A, max_cbvs=C)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()
slots = jax.jit(lambda m: cbv_slot_assignment(m, C))(state.is_cbv)
feats, _ = jax.jit(lambda st, sl: build_cbv_features(tmap, st, sl, spec))(state, slots)
flat = jax.tree.map(lambda x: x.reshape((S * C,) + x.shape[2:]), feats)

def timeit(name, fn, *args, n=30, trials=4):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:40s} {best*1e3:9.3f} ms", flush=True)

def measure(name):
    m = M.PlutoModel()
    p = init_params_on_cpu(lambda f: m.init(jax.random.PRNGKey(0), f), flat)
    f = jax.jit(lambda p, x: m.apply(p, x))
    timeit(name, f, p, flat)

# baseline
measure("full")

# knockout HistoryEncoder
orig_hist = L.HistoryEncoder.__call__
def cheap_hist(self, x, deterministic=True):
    h = nn.Dense(128, dtype=self.dtype)(x)
    return h.mean(axis=-2)
L.HistoryEncoder.__call__ = cheap_hist
measure("-HistoryEncoder")
L.HistoryEncoder.__call__ = orig_hist

# knockout PointsEncoder (map + r_encoder)
orig_pts = L.PointsEncoder.__call__
def cheap_pts(self, x, mask):
    h = nn.Dense(self.out_dim, dtype=self.dtype)(x)
    return jnp.where(mask[..., None], h, 0.0).max(axis=-2)
L.PointsEncoder.__call__ = cheap_pts
measure("-PointsEncoder")
L.PointsEncoder.__call__ = orig_pts

# knockout all Attention (enc+dec+state)
orig_attn = L.Attention.__call__
def cheap_attn(self, q, k=None, v=None, key_padding_mask=None, deterministic=True, attn_bias=None):
    return nn.Dense(self.dim, dtype=self.dtype)(q)
L.Attention.__call__ = cheap_attn
measure("-Attention(all)")
L.Attention.__call__ = orig_attn

# knockout big MLP heads
orig_mlp = L.MLPLayer.__call__
def cheap_mlp(self, x):
    return nn.Dense(self.out, dtype=self.dtype)(x)
import inspect
fields = [f for f in L.MLPLayer.__dataclass_fields__]
print("# MLPLayer fields:", fields)
L.MLPLayer.__call__ = cheap_mlp
try:
    measure("-MLPLayer heads")
except Exception as e:
    print("head knockout failed:", type(e).__name__, str(e)[:200])
L.MLPLayer.__call__ = orig_mlp

# knockout FourierEmbedding
orig_f = L.FourierEmbedding.__call__
def cheap_four(self, x):
    return nn.Dense(self.dim, dtype=self.dtype)(x)
L.FourierEmbedding.__call__ = cheap_four
measure("-FourierEmbedding")
L.FourierEmbedding.__call__ = orig_f
