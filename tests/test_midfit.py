"""Mid-episode buffer-full fits in the fused CLI path.

The reference fine-tunes on EVERY buffer-full event (rlft_pluto.py:206-247);
with many scenarios per device a single episode fills the 4096 buffer
several times, so run_episode_fused must fit BETWEEN chunks (and keep
rolling out with the updated params) instead of once at episode end —
otherwise the ring buffer wraps and the experience is silently lost.
"""

import jax.numpy as jnp

from rift_tpu.map import make_straight_town
from rift_tpu.policies import CBV_POLICY_LIST
from rift_tpu.rl import TrainConfig
from rift_tpu.scenario import TrafficEnv, wake_all_bvs


class _PdmEgoStub:
    name = "pdm_lite"


# not in the quick tier: the rollout_chunk + fit compiles alone take
# ~5 min warm, which would blow the sub-10-minute quick budget


def test_fit_hook_fires_on_every_buffer_fill():
    from rift_tpu.run import run_episode_fused

    tm = make_straight_town(length=300.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=8, max_cbvs=2, seed=7)
    cfg = {
        "max_cbvs": 2,
        "buffer_capacity": 40,  # tiny: ~4 valid samples/tick fills it fast
        "encoder_depth": 1, "decoder_depth": 1,
        "train": TrainConfig(epochs=1, warmup_epochs=1, batch_size=8),
    }
    pol = CBV_POLICY_LIST["rift_pluto"](tm, cfg)
    state, crit, spec = env.reset()
    state = wake_all_bvs(state)
    state = state.replace(
        is_cbv=state.is_cbv.at[:, 1].set(state.alive[:, 1]),
        goal=state.goal.at[:, 1].set(state.pos[:, 1] + jnp.array([80.0, 0.0])),
        goal_valid=state.goal_valid.at[:, 1].set(state.alive[:, 1]),
    )

    fits = []

    def fit_hook():
        fits.append(pol.train_round())

    run_episode_fused(
        env, _PdmEgoStub(), pol, state, crit, spec,
        max_ticks=60, train=True, chunk=10, fit_hook=fit_hook,
    )
    # 60 ticks x 2 scenarios x ~2 CBVs >> 40-cap buffer: several fills
    assert len(fits) >= 2, f"expected >=2 mid-episode fits, got {len(fits)}"
    assert all(len(l) > 0 and jnp.isfinite(jnp.asarray(l)).all() for l in fits)
    assert pol.train_rounds == len(fits)
    # buffer was reset after the last fit and keeps collecting
    assert pol.buffer is not None and int(pol.buffer.size) < 40
