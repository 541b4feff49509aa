import time, jax, jax.numpy as jnp
from rift_tpu.utils import enable_compilation_cache
from rift_tpu.utils.cache import init_params_on_cpu
enable_compilation_cache()
from rift_tpu.map import make_grid_town
from rift_tpu.runner import Runner, RunnerConfig
from rift_tpu.models.pluto.model import PlutoModel
from rift_tpu.models.pluto.features import build_cbv_features
from rift_tpu.scenario.recognition import cbv_slot_assignment

S, A, C = 64, 24, 3
tmap = make_grid_town(blocks=2, num_lanes=2)
cfg = RunnerConfig(num_scenarios=S, num_agents=A, max_cbvs=C)
r = Runner(tmap, cfg)
state, crit, spec = r.init_params()
slots = jax.jit(lambda m: cbv_slot_assignment(m, C))(state.is_cbv)
feats, _ = jax.jit(lambda st, sl: build_cbv_features(tmap, st, sl, spec))(state, slots)
flat = jax.tree.map(lambda x: x.reshape((S * C,) + x.shape[2:]), feats)

def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{name:44s} {best*1e3:9.3f} ms")

for name, kw in [
    ("full e4 d4", dict()),
    ("e0 d4", dict(encoder_depth=0)),
    ("e4 d0", dict(decoder_depth=0)),
    ("e0 d0 (embedders+heads only)", dict(encoder_depth=0, decoder_depth=0)),
    ("e0 d0 no hidden/ref-free", dict(encoder_depth=0, decoder_depth=0, use_hidden_proj=False, ref_free_traj=False)),
    ("full fp32", dict(dtype=None)),
]:
    m = PlutoModel(**kw)
    p = init_params_on_cpu(lambda f: m.init(jax.random.PRNGKey(0), f), flat)
    f = jax.jit(lambda p, x: m.apply(p, x))
    timeit(name, f, p, flat)

# ---- submodule timing ----
from rift_tpu.models.pluto.model import AgentEncoder, MapEncoder, StaticObjectsEncoder, AgentPredictor, PlanningDecoder
from rift_tpu.models.pluto.layers import FourierEmbedding, HistoryEncoder, PointsEncoder
import jax.numpy as jnp

bf = jnp.bfloat16
mods = []
ag = AgentEncoder(dtype=bf)
mods.append(("AgentEncoder", ag, lambda m, p: m.apply(p, flat)))
mp_ = MapEncoder(dtype=bf)
mods.append(("MapEncoder", mp_, lambda m, p: m.apply(p, flat)))
x_tok = jnp.zeros((192, 97, 128), bf)
pos3 = jnp.zeros((192, 97, 3))
fe = FourierEmbedding(128, 64, dtype=bf)
mods.append(("FourierEmbedding(pos,97tok)", fe, lambda m, p: m.apply(p, pos3)))
he = HistoryEncoder(embed_dim=32, dtype=bf)
hx = jnp.zeros((192 * 32, 20, 9))
mods.append(("HistoryEncoder[6144,20,9]", he, lambda m, p: m.apply(p, hx)))
ap = AgentPredictor(dtype=bf)
ax = jnp.zeros((192, 31, 128), bf)
mods.append(("AgentPredictor", ap, lambda m, p: m.apply(p, ax)))
pd = PlanningDecoder(depth=0, dtype=bf)
mods.append(("PlanningDecoder d0", pd, lambda m, p: m.apply(p, flat, x_tok, jnp.zeros((192, 97), bool))))
pd4 = PlanningDecoder(depth=4, dtype=bf)
mods.append(("PlanningDecoder d4", pd4, lambda m, p: m.apply(p, flat, x_tok, jnp.zeros((192, 97), bool))))

for name, m, call in mods:
    try:
        p = init_params_on_cpu(lambda: None and None) if False else None
        import jax as _j
        with _j.default_device(_j.devices("cpu")[0]):
            if name.startswith("AgentEncoder") or name.startswith("MapEncoder"):
                p = m.init(_j.random.PRNGKey(0), _j.tree.map(lambda x: x[:2], flat))
            elif "PlanningDecoder" in name:
                p = m.init(_j.random.PRNGKey(0), _j.tree.map(lambda x: x[:2], flat), x_tok[:2], jnp.zeros((2, 97), bool))
            elif "Fourier" in name:
                p = m.init(_j.random.PRNGKey(0), pos3[:2])
            elif "History" in name:
                p = m.init(_j.random.PRNGKey(0), hx[:2])
            else:
                p = m.init(_j.random.PRNGKey(0), ax[:2])
        p = jax.device_put(p)
        f = jax.jit(lambda pp: call(m, pp))
        timeit(name, f, p)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}")
