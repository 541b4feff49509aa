"""PlanT behavior-cloning trainer + the trained recognition scorer.

The reference trains PlanT offline with a Lightning module on collected
box datasets (rift/ego/plant/lit_module.py + data_agent_boxes.py): object
tokens -> transformer -> GRU waypoints, L1 waypoint loss, optional
forecast auxiliary. Here the dataset is the CollectBuffer HDF5 stream of
SimState snapshots (rl/collect.py) plus the episode-static ego route;
tokens are rebuilt with the SAME online builder (policy.build_plant_tokens)
so trained weights drop straight into the PlanTEgo policy and into
attention-based CBV recognition (scenario/recognition.py:
attn_recognize_cbvs — reference attn_cbv.py ranks candidates by a
PlanT-style transformer's attention over ego+vehicle tokens).

Usage:
    python -m rift_tpu.run --mode collect_data ...
    python -m rift_tpu.models.plant.train log/collect_data/<tag>/<name>.hdf5
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...sim.state import ScenarioSpec, SimState, init_sim_state_host
from .model import PlanTModel
from .policy import MAX_VEHICLE_TOKENS, build_plant_tokens

WAYPOINT_STRIDE = 5  # ticks between label waypoints (0.5 s at 10 fps)


def _spec_from_h5(data: dict) -> ScenarioSpec | None:
    if "static_ego_route" not in data:
        return None
    route = np.asarray(data["static_ego_route"])
    n = np.asarray(data["static_ego_route_len"])
    S, W, _ = route.shape
    L = 4
    return ScenarioSpec(
        ego_route=route,
        ego_route_len=n,
        route_road_ids=np.full((S, 4), -1, np.int32),
        route_lane_ids=np.zeros((S, 4), np.int32),
        ego_target_speed=np.full((S,), 8.0, np.float32),
        timeout_ticks=np.full((S,), 10 ** 6, np.int32),
        route_lane_mask=np.zeros((S, L), bool),
        lane_chains=np.full((S, L, 2, 2), -1, np.int32),
        lane_route_dist=np.full((S, L), 1e9, np.float32),
        lane_route_join=np.zeros((S, L), np.float32),
    )


def plant_bc_dataset(
    data: dict, pred_len: int = 4, stride: int = WAYPOINT_STRIDE
):
    """CollectBuffer arrays -> (tokens [N, O, 7], target [N, 2],
    light [N, 1], wp_labels [N, pred_len, 2]).

    Labels are the ego's REAL future positions (data_agent_boxes label
    semantics), expressed in the ego frame at the sample tick.
    """
    spec = _spec_from_h5(data)
    if spec is None:
        raise ValueError("h5 lacks static_ego_route (re-collect with "
                         "set_static; run.py collect_episode does this)")
    pos = np.asarray(data["pos"])  # [T, S, A, 2]
    heading = np.asarray(data["heading"])
    speed = np.asarray(data["speed"])
    shape = np.asarray(data["shape"])
    alive = np.asarray(data["alive"])
    cursor = np.asarray(data["ego_route_cursor"])
    T, S, A = heading.shape

    tok_list, tp_list, wp_list = [], [], []
    horizon = pred_len * stride
    for t in range(0, T - horizon, stride):
        st = init_sim_state_host(S, A)
        st = st.replace(
            pos=pos[t], heading=heading[t], speed=speed[t], shape=shape[t],
            alive=alive[t], ego_route_cursor=cursor[t],
        )
        st = jax.tree.map(jnp.asarray, st)
        tokens, target, light = jax.tree.map(
            np.asarray, build_plant_tokens(jax.tree.map(jnp.asarray, spec), st)
        )
        # future ego positions in the tick-t ego frame
        ego_p = pos[t, :, 0]
        c = np.cos(-heading[t, :, 0])
        sn = np.sin(-heading[t, :, 0])
        wps = []
        for k in range(1, pred_len + 1):
            rel = pos[t + k * stride, :, 0] - ego_p
            wps.append(
                np.stack(
                    [rel[:, 0] * c - rel[:, 1] * sn,
                     rel[:, 0] * sn + rel[:, 1] * c], axis=-1
                )
            )
        tok_list.append(tokens)
        tp_list.append(target)
        wp_list.append(np.stack(wps, axis=1))  # [S, pred_len, 2]
    tokens = np.concatenate(tok_list)
    targets = np.concatenate(tp_list)
    wps = np.concatenate(wp_list)
    light = np.zeros((tokens.shape[0], 1), np.float32)
    return (
        jnp.asarray(tokens), jnp.asarray(targets), jnp.asarray(light),
        jnp.asarray(wps),
    )


def fit_plant(
    model: PlanTModel,
    params,
    dataset,
    lr: float = 1e-4,
    epochs: int = 10,
    batch_size: int = 64,
    seed: int = 0,
):
    """L1 waypoint BC (lit_module.py training_step). Returns (params,
    losses per epoch)."""
    tokens, targets, light, wps = dataset
    N = tokens.shape[0]
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, tk, tp, lh, wp):
        def loss_fn(p):
            out = model.apply(p, tk, tp, lh)
            return jnp.abs(out["pred_wp"] - wp).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    nb = max(N // batch_size, 1)
    for _ in range(epochs):
        order = rng.permutation(N)
        ep_loss = 0.0
        for b in range(nb):
            ix = jnp.asarray(order[b * batch_size : (b + 1) * batch_size])
            params, opt_state, loss = step(
                params, opt_state, tokens[ix], targets[ix], light[ix], wps[ix]
            )
            ep_loss += float(loss)
        losses.append(ep_loss / nb)
    return params, losses


def plant_attn_scores(model: PlanTModel, params, spec: ScenarioSpec, state: SimState):
    """[S, A] per-agent relevance: the PlanT CLS-attention over vehicle
    tokens, scattered back to agent slots (reference attn_cbv.py:20-30 ranks
    candidates the same way). Traceable — callable inside env_step's
    recognition cond with `params` as a traced pytree."""
    S, A = state.alive.shape
    tokens, target, light, veh_idx = build_plant_tokens(
        spec, state, return_vehicle_index=True
    )
    out = model.apply(params, tokens, target, light)
    att = out["attn_scores"][:, :MAX_VEHICLE_TOKENS]  # vehicle tokens
    scores = jnp.full((S, A), -jnp.inf)
    s_ix = jnp.arange(S)[:, None]
    scores = scores.at[s_ix, jnp.maximum(veh_idx, 0)].max(
        jnp.where(veh_idx >= 0, att, -jnp.inf)
    )
    return scores


# canonical flat-npz params format (shared with the Pluto pretrain artifact)
from ...utils.params_io import load_params_npz as load_plant_params  # noqa: E402
from ...utils.params_io import save_params_npz as save_plant_params  # noqa: E402


def make_attn_scores_fn(model: PlanTModel, params, spec: ScenarioSpec):
    """Returns `attn_scores_fn(state) -> [S, A]` for attn_recognize_cbvs."""

    @partial(jax.jit, static_argnames=())
    def scores_fn(state: SimState) -> jnp.ndarray:
        return plant_attn_scores(model, params, spec, state)

    return scores_fn


def main(argv=None):
    import argparse

    from ...rl.collect import CollectBuffer
    from ...utils.cache import init_params_on_cpu

    p = argparse.ArgumentParser("train_plant")
    p.add_argument("h5")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out", default="plant_params.npz")
    # PlanT_medium dims by default (configs/plant.yaml; the reference's
    # PlanT_medium HF config, rift/ego/plant/model.py:22) — the npz must
    # match the ego cfg it is loaded into (--ego_weights)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--num_heads", type=int, default=8)
    args = p.parse_args(argv)

    data = CollectBuffer.load(args.h5)
    dataset = plant_bc_dataset(data)
    model = PlanTModel(
        dim=args.dim, num_layers=args.num_layers, num_heads=args.num_heads
    )
    params = init_params_on_cpu(
        lambda tk, tp, lh: model.init(jax.random.PRNGKey(0), tk, tp, lh),
        dataset[0][:2], dataset[1][:2], dataset[2][:2],
    )
    params, losses = fit_plant(
        model, params, dataset, lr=args.lr, epochs=args.epochs
    )
    print("losses:", [round(l, 4) for l in losses])
    save_plant_params(params, args.out)
    print("saved", args.out)
    return losses


if __name__ == "__main__":
    main()
