"""Classic RL stack: relative-state observations, MLP actor-critic PPO,
(acc, steer) action conversion, full-train rewards.

Covers the reference's non-Pluto RL components:
  * CBVNormalObservation — 3-agent relative-state matrix + goal row
    (rift/gym_carla/observation/base_observation.py:170-254)
  * EgoNormalObservation — analogous for the ego with a route row
  * rl-type action conversion (acc, steer) -> throttle/steer/brake with
    acc/3 throttle, -acc/8 brake (rift/gym_carla/action/cbv_action.py:28-77)
  * CBVFullTrainReward — goal-progress delta + 15 * (reach-goal - collision)
    (rift/gym_carla/reward/cbv_reward.py:30-80)
  * ego shaped reward (rift/gym_carla/reward/ego_reward.py:23-50)
  * ActorPPO/CriticPPO MLPs + PPO update (rift/cbv/planning/rl/ppo.py:23-325,
    rift/ego/rl/ppo.py:31-270) — gaussian policy on (acc, steer), GAE, clip.

All functions are vectorized over [S, A] / batch and jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..geometry.se2 import wrap_angle
from ..sim.state import SimState
from .losses import gae

OBS_AGENTS = 3  # rows: self, ego, nearest other (reference max_agent)
OBS_DIM = 6  # [x, y, bbox_x, bbox_y, yaw, forward speed]
ACC_MAX, STEER_MAX = 3.0, 0.3  # action scaling (gym_carla action config)
GOAL_RADIUS = 3.0


# ---------------------------------------------------------------------------
# Observations
# ---------------------------------------------------------------------------
def _relative_rows(state: SimState, scenario, center, others):
    """Rows of [x, y, half_len, half_wid, rel_yaw, speed] in center frame."""
    cp = state.pos[scenario, center]
    ch = state.heading[scenario, center]
    c, s = jnp.cos(-ch), jnp.sin(-ch)

    def one(a):
        rel = state.pos[scenario, a] - cp
        x = rel[0] * c - rel[1] * s
        y = rel[0] * s + rel[1] * c
        return jnp.stack(
            [
                x,
                y,
                state.shape[scenario, a, 1] * 0.5,
                state.shape[scenario, a, 0] * 0.5,
                wrap_angle(state.heading[scenario, a] - ch),
                state.speed[scenario, a],
            ]
        )

    return jax.vmap(one)(others)


def cbv_normal_obs(state: SimState, scenario, cbv_slot):
    """[OBS_AGENTS + 1, OBS_DIM]: self, ego, nearest other, goal row."""
    pos = state.pos[scenario]
    A = pos.shape[0]
    d = jnp.linalg.norm(pos - pos[cbv_slot], axis=-1)
    d = jnp.where(
        state.alive[scenario]
        & (jnp.arange(A) != cbv_slot)
        & (jnp.arange(A) != 0),
        d,
        jnp.inf,
    )
    nearest = jnp.argmin(d)
    rows = _relative_rows(
        state, scenario, cbv_slot, jnp.stack([cbv_slot, 0, nearest])
    )
    rows = rows.at[2].multiply(jnp.isfinite(d[nearest]).astype(jnp.float32))

    # goal row: [x, y, r, r, rel_yaw(0), distance]
    cp = state.pos[scenario, cbv_slot]
    ch = state.heading[scenario, cbv_slot]
    rel = state.goal[scenario, cbv_slot] - cp
    c, s = jnp.cos(-ch), jnp.sin(-ch)
    gx = rel[0] * c - rel[1] * s
    gy = rel[0] * s + rel[1] * c
    goal_row = jnp.stack(
        [gx, gy, GOAL_RADIUS, GOAL_RADIUS, 0.0, jnp.linalg.norm(rel)]
    )
    return jnp.concatenate([rows, goal_row[None]], axis=0)


def ego_normal_obs(state: SimState, route_next_wp):
    """[S, OBS_AGENTS + 1, OBS_DIM]: ego, two nearest agents, route row."""
    S, A = state.alive.shape

    def one(scenario):
        pos = state.pos[scenario]
        d = jnp.linalg.norm(pos - pos[0], axis=-1)
        d = jnp.where(state.alive[scenario] & (jnp.arange(A) != 0), d, jnp.inf)
        k = min(2, A)
        _, idx = jax.lax.top_k(-d, k)
        rows = _relative_rows(
            state, scenario, jnp.asarray(0), jnp.concatenate([jnp.zeros(1, idx.dtype), idx])
        )
        cp = state.pos[scenario, 0]
        ch = state.heading[scenario, 0]
        rel = route_next_wp[scenario] - cp
        c, s = jnp.cos(-ch), jnp.sin(-ch)
        route_row = jnp.stack(
            [
                rel[0] * c - rel[1] * s,
                rel[0] * s + rel[1] * c,
                0.0,
                0.0,
                0.0,
                jnp.linalg.norm(rel),
            ]
        )
        return jnp.concatenate([rows, route_row[None]], axis=0)

    return jax.vmap(one)(jnp.arange(S))


# ---------------------------------------------------------------------------
# Action conversion (acc, steer) in [-1, 1]^2 -> throttle/steer/brake
# ---------------------------------------------------------------------------
def rl_action_to_control(action: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) normalized (acc, steer) -> (..., 3) throttle/steer/brake.

    No-reverse branch of convert_rl_action (cbv_action.py:48-58):
    throttle = clip(acc/3), brake = clip(-acc/8)."""
    acc = jnp.clip(action[..., 0] * ACC_MAX, -ACC_MAX, ACC_MAX)
    steer = jnp.clip(action[..., 1] * STEER_MAX, -STEER_MAX, STEER_MAX)
    throttle = jnp.clip(acc / 3.0, 0.0, 1.0)
    brake = jnp.clip(-acc / 8.0, 0.0, 1.0)
    return jnp.stack([throttle, steer, brake], axis=-1)


def control_to_rl_action(control: jnp.ndarray) -> jnp.ndarray:
    """Inverse for data collection (cbv_action.py:66-77)."""
    throttle, steer, brake = (
        control[..., 0],
        control[..., 1],
        control[..., 2],
    )
    acc = jnp.where(brake > 0, -brake * 8.0, throttle * 3.0)
    return jnp.stack([acc / ACC_MAX, steer / STEER_MAX], axis=-1)


# ---------------------------------------------------------------------------
# Rewards
# ---------------------------------------------------------------------------
def cbv_full_train_reward(
    goal_dist_prev: jnp.ndarray,
    goal_dist_now: jnp.ndarray,
    collided_with_other: jnp.ndarray,  # bool, collision not involving the ego
    reached_goal: jnp.ndarray,  # bool
) -> jnp.ndarray:
    delta = jnp.clip(goal_dist_prev - goal_dist_now, -1.0, 1.0)
    return (
        delta
        - 15.0 * collided_with_other.astype(jnp.float32)
        + 15.0 * reached_goal.astype(jnp.float32)
    )


def ego_shaped_reward(
    speed_lon: jnp.ndarray,
    steer: jnp.ndarray,
    lane_dist: jnp.ndarray,
    collided: jnp.ndarray,
    desired_speed: float = 8.0,
    out_lane_thres: float = 4.0,
) -> jnp.ndarray:
    """ego_reward.py:23-50 (per the cited latent-DRL paper's shaping)."""
    r_collision = -10.0 * collided.astype(jnp.float32)
    r_steer = -5.0 * steer**2
    r_out = -1.0 * (jnp.abs(lane_dist) > out_lane_thres).astype(jnp.float32)
    r_fast = -10.0 * (speed_lon > desired_speed).astype(jnp.float32)
    r_lat = -0.2 * jnp.abs(steer) * speed_lon**2
    return r_collision + speed_lon + r_fast + r_out + r_steer + r_lat - 0.1


# ---------------------------------------------------------------------------
# MLP actor-critic (net.py ActorPPO/CriticPPO equivalents)
# ---------------------------------------------------------------------------
class ActorPPO(nn.Module):
    hidden: int = 128
    action_dim: int = 2

    @nn.compact
    def __call__(self, obs):
        x = obs.reshape(obs.shape[:-2] + (-1,))
        for _ in range(2):
            x = nn.tanh(nn.Dense(self.hidden)(x))
        mean = nn.Dense(self.action_dim)(x)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.action_dim,)
        )
        return jnp.tanh(mean), log_std


class CriticPPO(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, obs):
        x = obs.reshape(obs.shape[:-2] + (-1,))
        for _ in range(2):
            x = nn.tanh(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)[..., 0]


class PPOParams(NamedTuple):
    actor: dict
    critic: dict


def gaussian_log_prob(mean, log_std, action):
    var = jnp.exp(2 * log_std)
    return (
        -0.5 * jnp.sum((action - mean) ** 2 / var, axis=-1)
        - jnp.sum(log_std)
        - 0.5 * action.shape[-1] * jnp.log(2 * jnp.pi)
    )


class ClassicPPO:
    """PPO trainer for the MLP policies (rl/ppo.py semantics: gamma 0.98,
    GAE lambda 0.95, clip 0.2, entropy bonus)."""

    def __init__(
        self,
        obs_rows: int = OBS_AGENTS + 1,
        lr: float = 3e-4,
        clip: float = 0.2,
        gamma: float = 0.98,
        lam: float = 0.95,
        entropy_coef: float = 0.01,
        epochs: int = 10,
        seed: int = 0,
    ):
        self.actor = ActorPPO()
        self.critic = CriticPPO()
        self.clip = clip
        self.gamma = gamma
        self.lam = lam
        self.entropy_coef = entropy_coef
        self.epochs = epochs
        rng = jax.random.PRNGKey(seed)
        obs0 = jnp.zeros((1, obs_rows, OBS_DIM))
        self.params = PPOParams(
            actor=self.actor.init(rng, obs0),
            critic=self.critic.init(jax.random.fold_in(rng, 1), obs0),
        )
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self._train_step = jax.jit(self._make_train_step())

    def act(self, params, obs, rng, deterministic=False):
        mean, log_std = self.actor.apply(params.actor, obs)
        if deterministic:
            return mean, gaussian_log_prob(mean, log_std, mean)
        noise = jax.random.normal(rng, mean.shape) * jnp.exp(log_std)
        action = jnp.clip(mean + noise, -1.0, 1.0)
        return action, gaussian_log_prob(mean, log_std, action)

    def value(self, params, obs):
        return self.critic.apply(params.critic, obs)

    def _make_train_step(self):
        def loss_fn(params, batch):
            mean, log_std = self.actor.apply(params.actor, batch["obs"])
            log_p = gaussian_log_prob(mean, log_std, batch["action"])
            ratio = jnp.exp(log_p - batch["old_log_prob"])
            adv = batch["advantage"]
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            surrogate = jnp.minimum(
                adv * ratio,
                adv * jnp.clip(ratio, 1 - self.clip, 1 + self.clip),
            ).mean()
            entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            value = self.critic.apply(params.critic, batch["obs"])
            v_loss = jnp.mean((value - batch["returns"]) ** 2)
            return -(surrogate + self.entropy_coef * entropy) + 0.5 * v_loss

        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step

    def compute_gae(self, rewards, values, dones):
        """Per-trajectory GAE: rewards [T], values [T+1], dones [T]."""
        return gae(rewards, values, dones, self.gamma, self.lam)

    def train(self, batch) -> list[float]:
        losses = []
        for _ in range(self.epochs):
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, batch
            )
            losses.append(float(loss))
        return losses
