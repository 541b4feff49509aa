"""Policy-gradient losses over the Pluto candidate distribution.

The action space is the flattened R*M candidate set; the policy distribution
is softmax over the decoder's `pi` logits with invalid reference lines masked
to -1e8. One loss per fine-tuning algorithm of the reference:

  rift_loss       — PPO clip [0.8, 1.2] + dual clip 3A for A<0
                    (rift/cbv/planning/fine_tuner/rlft/rift_pluto/
                     rift_trainer.py:140-182)
  grpo_loss       — PPO clip + 0.2 * KL(pi || pi_ref)
                    (rlft/grpo_pluto/grpo_trainer.py:140-196)
  reinforce_loss  — log-prob of executed candidate x return
                    (rlft/reinforce_pluto/reinforce_trainer.py:120-170; the
                     rs_pluto variant feeds a shaped return instead,
                     sft/rs_pluto/rs_trainer.py:120-154)
  ppo_candidate_loss — clipped surrogate on the chosen candidate + entropy
                    bonus + SmoothL1 value loss
                    (rlft/ppo_pluto/ppo_trainer.py:126-184)
  rtr_loss        — lambda_rl * ppo-on-chosen + teacher cross-entropy
                    (sft/rtr_pluto/rtr_trainer.py:130-173)
  sft_loss        — cross-entropy against the teacher-selected candidate
                    (sft/sft_pluto/sft_trainer.py:123-200)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLIP_LO, CLIP_HI = 0.8, 1.2
DUAL_CLIP = 3.0
KL_COEF = 0.2


def masked_log_softmax(probability: jnp.ndarray, r_padding: jnp.ndarray):
    """(bs, R, M) logits + (bs, R) padding -> (bs, R*M) log-probs."""
    bs, R, M = probability.shape
    logits = jnp.where(r_padding[:, :, None], -1e8, probability)
    return jax.nn.log_softmax(logits.reshape(bs, R * M), axis=-1)


def rift_loss(
    probability: jnp.ndarray,  # (bs, R, M) current pi logits
    r_padding: jnp.ndarray,  # (bs, R) True = invalid reference line
    old_logits: jnp.ndarray,  # (bs, R, M) behavior-policy logits
    advantage: jnp.ndarray,  # (bs, R, M) group-relative advantage
    valid_mask: jnp.ndarray,  # (bs, R, M)
) -> jnp.ndarray:
    bs, R, M = probability.shape
    log_p = masked_log_softmax(probability, r_padding)
    log_p_old = masked_log_softmax(old_logits, r_padding)
    adv = advantage.reshape(bs, R * M)

    ratio = jnp.exp(log_p - log_p_old)
    unclipped = adv * ratio
    clipped = adv * jnp.clip(ratio, CLIP_LO, CLIP_HI)
    min_obj = jnp.minimum(unclipped, clipped)
    # dual clip: bound how negative the objective can get for A < 0
    max_obj = jnp.maximum(min_obj, adv * DUAL_CLIP)
    objective = jnp.where(adv < 0, max_obj, min_obj)

    m = valid_mask.reshape(bs, R * M)
    n = jnp.maximum(m.sum(), 1)
    surrogate = jnp.sum(objective * m) / n
    return -surrogate


def grpo_loss(
    probability: jnp.ndarray,
    r_padding: jnp.ndarray,
    old_logits: jnp.ndarray,
    ref_logits: jnp.ndarray,  # (bs, R, M) frozen pretrain-policy logits
    advantage: jnp.ndarray,
    valid_mask: jnp.ndarray,
    kl_coef: float = KL_COEF,
) -> jnp.ndarray:
    bs, R, M = probability.shape
    log_p = masked_log_softmax(probability, r_padding)
    log_p_old = masked_log_softmax(old_logits, r_padding)
    ref_p = jnp.exp(masked_log_softmax(ref_logits, r_padding))
    adv = advantage.reshape(bs, R * M)

    # elementwise KL(ref || pi) terms: q * (log q - log p)
    kl = ref_p * (jnp.log(jnp.maximum(ref_p, 1e-12)) - log_p)

    ratio = jnp.exp(log_p - log_p_old)
    objective = (
        jnp.minimum(adv * ratio, adv * jnp.clip(ratio, CLIP_LO, CLIP_HI))
        - kl_coef * kl
    )
    m = valid_mask.reshape(bs, R * M)
    n = jnp.maximum(m.sum(), 1)
    return -jnp.sum(objective * m) / n


def reinforce_loss(
    probability: jnp.ndarray,  # (bs, R, M)
    r_padding: jnp.ndarray,  # (bs, R)
    chosen_idx: jnp.ndarray,  # (bs,) flattened R*M index of the executed cand
    returns: jnp.ndarray,  # (bs,) discounted (or shaped) return
) -> jnp.ndarray:
    log_p = masked_log_softmax(probability, r_padding)
    bs = log_p.shape[0]
    chosen = log_p[jnp.arange(bs), chosen_idx]
    return -jnp.mean(chosen * jax.lax.stop_gradient(returns))


def ppo_candidate_loss(
    probability: jnp.ndarray,
    r_padding: jnp.ndarray,
    chosen_idx: jnp.ndarray,  # (bs,)
    old_log_prob: jnp.ndarray,  # (bs,)
    advantage: jnp.ndarray,  # (bs,) GAE advantage
    value_pred: jnp.ndarray,  # (bs,) value-head output
    reward_sum: jnp.ndarray,  # (bs,) return target
    clip_epsilon: float = 0.2,
    lambda_entropy: float = 0.01,
) -> jnp.ndarray:
    log_p = jnp.maximum(masked_log_softmax(probability, r_padding), -1e6)
    bs = log_p.shape[0]
    cur_log_prob = log_p[jnp.arange(bs), chosen_idx]
    entropy = -jnp.sum(jnp.exp(log_p) * log_p, axis=-1)

    adv = jax.lax.stop_gradient(advantage)
    ratio = jnp.exp(cur_log_prob - jax.lax.stop_gradient(old_log_prob))
    surrogate = jnp.minimum(
        adv * ratio, adv * jnp.clip(ratio, 1 - clip_epsilon, 1 + clip_epsilon)
    ).mean()
    actor_loss = -(surrogate + entropy.mean() * lambda_entropy)
    value_loss = smooth_l1(value_pred, jax.lax.stop_gradient(reward_sum)).mean()
    return actor_loss + value_loss


def sft_loss(
    probability: jnp.ndarray,
    r_padding: jnp.ndarray,
    teacher_idx: jnp.ndarray,  # (bs,) flattened index of the teacher's choice
    teacher_valid: jnp.ndarray | None = None,  # (bs,)
) -> jnp.ndarray:
    log_p = masked_log_softmax(probability, r_padding)
    bs = log_p.shape[0]
    ce = -log_p[jnp.arange(bs), teacher_idx]
    if teacher_valid is not None:
        n = jnp.maximum(teacher_valid.sum(), 1)
        return jnp.sum(ce * teacher_valid) / n
    return ce.mean()


def rtr_loss(
    probability: jnp.ndarray,
    r_padding: jnp.ndarray,
    chosen_idx: jnp.ndarray,
    old_log_prob: jnp.ndarray,
    advantage: jnp.ndarray,
    value_pred: jnp.ndarray,
    reward_sum: jnp.ndarray,
    teacher_idx: jnp.ndarray,
    lambda_rl: float = 5.0,
) -> jnp.ndarray:
    ppo = ppo_candidate_loss(
        probability, r_padding, chosen_idx, old_log_prob, advantage,
        value_pred, reward_sum,
    )
    teacher = sft_loss(probability, r_padding, teacher_idx)
    return lambda_rl * ppo + teacher


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def gae(
    rewards: jnp.ndarray,  # [T]
    values: jnp.ndarray,  # [T+1]
    dones: jnp.ndarray,  # [T] episode-termination flags
    gamma: float = 0.98,
    lam: float = 0.95,
):
    """Generalized advantage estimation over one trajectory (lax.scan).

    Replaces the Python loops of the reference's PPO datamodules
    (rlft/ppo_pluto/ppo_datamodule.py, cbv/planning/rl/ppo.py).
    """
    not_done = 1.0 - dones.astype(jnp.float32)
    deltas = rewards + gamma * values[1:] * not_done - values[:-1]

    def body(carry, x):
        delta, nd = x
        carry = delta + gamma * lam * nd * carry
        return carry, carry

    _, adv_rev = jax.lax.scan(
        body, jnp.zeros(()), (deltas[::-1], not_done[::-1])
    )
    adv = adv_rev[::-1]
    return adv, adv + values[:-1]
