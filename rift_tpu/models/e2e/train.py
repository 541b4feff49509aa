"""Behavior-cloning trainer for the E2E camera stacks.

The reference trains UniAD/VAD/SparseDrive offline on nuScenes/Bench2Drive
logs; closed-loop they run frozen (rift/ego/b2d/e2e_agent.py). Here the
bootstrap is the same as PlanT's (models/plant/train.py): roll the
privileged PDM expert closed-loop, render the synthetic cameras at every
tick, and clone the realized future ego motion, with a detection
auxiliary supervised by the privileged agent boxes (the stand-in for the
reference stacks' perception pretraining).

    from rift_tpu.models.e2e import bc_train
    params, losses = bc_train("vad", tmap, spec, state, crit, ...)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...sim.state import CLASS_VEHICLE
from .model import (
    BEV_H,
    BEV_W,
    BEV_X0,
    BEV_X1,
    BEV_Y0,
    BEV_Y1,
    E2EModel,
    PRED_LEN,
)
from .policy import e2e_inputs

WP_TICK_STRIDE = 5  # 0.5 s between label waypoints at 10 fps


def bc_rollout(tmap, spec, state, crit, ticks: int):
    """Roll the PDM expert `ticks` steps; returns the per-tick state list
    (device pytrees) for dataset building."""
    from ...ego.pdm_ego import pdm_ego_waypoints
    from ...scenario.env import env_step

    states = []
    for _ in range(ticks):
        traj = pdm_ego_waypoints(spec, state, tmap)
        state, crit = env_step(tmap, spec, state, crit, ego_traj=traj)
        states.append(state)
    return states


def _to_ego_frame(points, origin, heading):
    rel = points - origin
    c, s = jnp.cos(-heading), jnp.sin(-heading)
    return jnp.stack(
        [rel[..., 0] * c - rel[..., 1] * s, rel[..., 0] * s + rel[..., 1] * c],
        -1,
    )


def bc_dataset(tmap, spec, states, stride: int = WP_TICK_STRIDE):
    """states (length T) -> dict of host arrays flattened over [T', S]:
    imgs, target, speed, wp [PRED_LEN, 2], plus detection targets
    boxes [A, 5] / box_mask [A] in the ego frame."""
    horizon = PRED_LEN * stride
    feats, targets, speeds, wps, det_b, det_m = [], [], [], [], [], []
    for t in range(0, len(states) - horizon):
        st = states[t]
        imgs, target, speed = e2e_inputs(spec, st, tmap)
        ego_pos, ego_heading = st.pos[:, 0], st.heading[:, 0]
        future = jnp.stack(
            [states[t + stride * (k + 1)].pos[:, 0] for k in range(PRED_LEN)],
            axis=1,
        )  # [S, PRED_LEN, 2]
        wp = _to_ego_frame(future, ego_pos[:, None], ego_heading[:, None])

        # privileged detection targets: alive non-ego vehicles in BEV range
        A = st.alive.shape[1]
        centers = _to_ego_frame(st.pos, ego_pos[:, None], ego_heading[:, None])
        yaw_rel = st.heading - ego_heading[:, None]
        boxes = jnp.concatenate(
            [centers, st.shape, yaw_rel[..., None]], -1
        )  # [S, A, 5] (cx, cy, w, l, yaw) — shape is (width, length)
        in_bev = (
            (centers[..., 0] > BEV_X0) & (centers[..., 0] < BEV_X1)
            & (centers[..., 1] > BEV_Y0) & (centers[..., 1] < BEV_Y1)
        )
        mask = (
            st.alive & in_bev
            & (jnp.arange(A) != 0)
            & (st.agent_class == CLASS_VEHICLE)
        )
        feats.append(np.asarray(imgs))
        targets.append(np.asarray(target))
        speeds.append(np.asarray(speed))
        wps.append(np.asarray(wp))
        det_b.append(np.asarray(boxes))
        det_m.append(np.asarray(mask))

    cat = lambda xs: np.concatenate(xs, axis=0)
    return {
        "imgs": cat(feats),
        "target": cat(targets),
        "speed": cat(speeds),
        "wp": cat(wps),
        "det_boxes": cat(det_b),
        "det_mask": cat(det_m),
    }


def _dense_det_loss(pred_boxes, pred_score, gt_boxes, gt_mask):
    """Cell-assignment detection loss for the BEV heads: each truth
    supervises the cell containing its center; empty cells -> score 0."""
    cell_x = (BEV_X1 - BEV_X0) / BEV_W
    cell_y = (BEV_Y1 - BEV_Y0) / BEV_H
    ix = jnp.clip(((gt_boxes[..., 0] - BEV_X0) / cell_x).astype(jnp.int32), 0, BEV_W - 1)
    iy = jnp.clip(((gt_boxes[..., 1] - BEV_Y0) / cell_y).astype(jnp.int32), 0, BEV_H - 1)
    cell = iy * BEV_W + ix  # [B, A]

    B, Q = pred_score.shape
    occ = jnp.zeros((B, Q))
    occ = jax.vmap(lambda o, c, m: o.at[c].max(m.astype(jnp.float32)))(
        occ, cell, gt_mask
    )
    score_loss = optax.sigmoid_binary_cross_entropy(pred_score, occ).mean()

    matched = jnp.take_along_axis(pred_boxes, cell[..., None], axis=1)
    reg = jnp.abs(matched[..., :4] - gt_boxes[..., :4]).sum(-1)
    ang = 1.0 - jnp.cos(matched[..., 4] - gt_boxes[..., 4])
    reg_loss = (jnp.where(gt_mask, reg + ang, 0.0)).sum() / jnp.maximum(
        gt_mask.sum(), 1
    )
    return score_loss + 0.2 * reg_loss


def _sparse_det_loss(pred_boxes, pred_score, gt_boxes, gt_mask):
    """Nearest-anchor assignment (stop-grad) for the sparse head."""
    d = jnp.linalg.norm(
        jax.lax.stop_gradient(pred_boxes[:, :, None, :2]) - gt_boxes[:, None, :, :2],
        axis=-1,
    )  # [B, Q, A]
    d = jnp.where(gt_mask[:, None, :], d, jnp.inf)
    assign = jnp.argmin(d, axis=1)  # [B, A] anchor per truth
    B, Q = pred_score.shape
    occ = jnp.zeros((B, Q))
    occ = jax.vmap(lambda o, c, m: o.at[c].max(m.astype(jnp.float32)))(
        occ, assign, gt_mask
    )
    score_loss = optax.sigmoid_binary_cross_entropy(pred_score, occ).mean()
    matched = jnp.take_along_axis(pred_boxes, assign[..., None], axis=1)
    reg = jnp.abs(matched[..., :4] - gt_boxes[..., :4]).sum(-1)
    ang = 1.0 - jnp.cos(matched[..., 4] - gt_boxes[..., 4])
    reg_loss = (jnp.where(gt_mask, reg + ang, 0.0)).sum() / jnp.maximum(
        gt_mask.sum(), 1
    )
    return score_loss + 0.2 * reg_loss


def bc_loss(model: E2EModel, params, batch):
    out = model.apply(
        params, batch["imgs"], batch["target"], batch["speed"]
    )
    wp = batch["wp"]
    loss = jnp.abs(out["pred_wp"] - wp).mean()
    if "pred_wp_soft" in out:  # vad: vocabulary CE + soft blend
        loss = loss + jnp.abs(out["pred_wp_soft"] - wp).mean()
        modes = params["params"]["traj_modes"]
        d = jnp.abs(modes[None] - wp[:, None]).sum((-1, -2))  # [B, K]
        tgt = jnp.argmin(d, -1)
        loss = loss + 0.2 * optax.softmax_cross_entropy_with_integer_labels(
            out["mode_logits"], tgt
        ).mean()
    det = (
        _sparse_det_loss if model.variant == "sparsedrive" else _dense_det_loss
    )(out["det_boxes"], out["det_scores"], batch["det_boxes"], batch["det_mask"])
    return loss + 0.5 * det


def bc_train(
    variant: str,
    tmap,
    spec,
    state,
    crit,
    ticks: int = 120,
    epochs: int = 4,
    batch_size: int = 16,
    lr: float = 3e-4,
    seed: int = 0,
):
    """Closed-loop BC bootstrap; returns (params, loss history)."""
    model = E2EModel(variant=variant)
    states = bc_rollout(tmap, spec, state, crit, ticks)
    data = bc_dataset(tmap, spec, states)
    n = data["imgs"].shape[0]

    k = jax.random.PRNGKey(seed)
    params = model.init(
        k, jnp.asarray(data["imgs"][:1]), jnp.asarray(data["target"][:1]),
        jnp.asarray(data["speed"][:1]),
    )
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adamw(lr))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: bc_loss(model, p, batch)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            batch = {k2: jnp.asarray(v[idx]) for k2, v in data.items()}
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
    return params, losses
