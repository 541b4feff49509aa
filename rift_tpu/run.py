"""CLI entry: mode dispatch over the policy zoos.

The scripts/run.py + carla_runner.py equivalent (reference
scripts/run.py:122-232, rift/carla_runner.py:410-487) without the CARLA
server lifecycle. All four modes work end to end:

  eval          closed-loop benchmark + leaderboard statistics
                (carla_runner.py:311-362)
  train_cbv     fine-tune the CBV policy — buffer-full -> fit -> param swap
                for the Pluto family, GAE PPO rounds for the classic rl
                CBVs (carla_runner.py:185-247)
  train_ego     PPO on the rl-type ego via env_step's ego_ctrl input
                (carla_runner.py:249-309, rift/ego/rl/ppo.py)
  collect_data  offline dataset -> HDF5 via CollectBuffer with
                skip-existing resume (carla_runner.py:364-408)

    python -m rift_tpu.run --mode eval --ego_cfg pdm_lite --cbv_cfg rift_pluto \
        --num_scenario 4 --num_episodes 3 --town grid

Routes come from the synthetic towns or a Bench2Drive XML (--routes
<file.xml>), iterated through the Eval/TrainDataLoader with non-overlap
batching and resume (scenario_data_loader.py semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .map import make_grid_town, make_straight_town
from .policies import CBV_POLICY_LIST, EGO_POLICY_LIST
from .scenario import TrafficEnv
from .scenario.statistics import StatisticsManager
from .utils import enable_compilation_cache
from .utils.checkpoint import CheckpointManager
from .utils.config import apply_overrides, load_config

PAD_ROUTE_LANES = 256  # fixed lane padding for per-route junction maps


def build_map(args):
    """Returns (tmap or None, route_configs or None)."""
    if args.routes:
        from .scenario.routes import parse_routes_file

        configs = parse_routes_file(args.routes, args.routes_subset)
        return None, configs
    if args.town == "grid":
        return make_grid_town(blocks=args.blocks, num_lanes=2), None
    return make_straight_town(length=600.0, num_lanes=2), None


def _step_kwargs(ego_out, cbv_out):
    """Route policy outputs into env_step's control inputs."""
    kw = {}
    if isinstance(ego_out, dict):
        kw["ego_ctrl"] = ego_out["ctrl"]
    elif ego_out.ndim == 3:  # [S, T, 2] waypoints
        kw["ego_traj"] = ego_out
    elif ego_out.ndim == 2:  # [S, 3] raw control
        kw["ego_ctrl"] = ego_out
    if "traj" in cbv_out:
        kw["cbv_traj"] = cbv_out["traj"]
        kw["cbv_traj_mask"] = cbv_out["mask"]
    elif "ctrl" in cbv_out:
        kw["cbv_ctrl"] = cbv_out["ctrl"]
        kw["cbv_ctrl_mask"] = cbv_out["mask"]
    return kw


def _ego_act(ego, spec, state, train):
    try:
        return ego.act(spec, state, train=train)
    except TypeError:
        return ego.act(spec, state)


FLUSH_K = 16  # fine-tune extras window (returns/GAE horizon per flush)

# egos whose waypoint fns run inside rollout_chunk's scan (fused CLI path)
FUSED_EGO_KIND = {
    "pdm_lite": "pdm",
    "expert": "expert",  # pdm + privileged lane changes
    "behavior": "rule",
    "plant": "plant",
    "vad": "e2e",
    "uniad": "e2e",
    "sparsedrive": "e2e",
}
FUSED_CHUNK = 20  # ticks per fused device program


def run_episode_fused(
    env, ego, cbv, state, crit, spec, max_ticks, train=False,
    chunk=FUSED_CHUNK, fit_hook=None,
):
    """Fused tick loop: policy-act + env-step scanned `chunk` ticks per
    device dispatch (rollout.rollout_chunk) — the CLI reaches the same
    throughput as bench.py instead of paying a host round-trip per tick.
    Usable whenever no per-tick host callback is needed (no --render /
    collect) and the ego is in FUSED_EGO_KIND.

    `fit_hook` (train mode): called after any chunk that fills the
    policy's buffer — the reference fine-tunes on EVERY buffer-full
    event (rlft_pluto.py:206-247), and at many scenarios per device a
    single episode fills the 4096-sample buffer several times over;
    without the hook the ring buffer wraps and that experience is lost.
    Subsequent chunks roll out with the just-updated cbv.params, so the
    collect->fit->collect alternation happens inside one episode."""
    from .rollout import rollout_chunk

    ego_kind = FUSED_EGO_KIND[ego.name]
    ego_model = ego_params = None
    if ego_kind in ("plant", "e2e"):
        if ego.params is None:
            ego.act(spec, state)  # lazy init
        ego_model, ego_params = ego.model, ego.params

    with_policy = hasattr(cbv, "model")  # Pluto family
    if with_policy and hasattr(cbv, "maybe_init"):
        cbv.maybe_init(spec, state)
    train_extras = train and with_policy and getattr(cbv, "trainable", False)
    store = getattr(cbv, "store_chunk", None) if train_extras else None

    n_chunks = max((max_ticks + chunk - 1) // chunk, 1)
    for _ in range(n_chunks):
        state, crit, extras = rollout_chunk(
            cbv.model if with_policy else None,
            cbv.params if with_policy else None,
            env.tmap, spec, state, crit,
            max_cbvs=env.max_cbvs, num_steps=chunk,
            train=train_extras, with_policy=with_policy,
            ego=ego_kind, ego_model=ego_model, ego_params=ego_params,
            recog_model=env.recog_model, recog_params=env.recog_params,
            canonical=getattr(cbv, "canonical", False),
            map_tok=cbv.map_tokens()
            if hasattr(cbv, "map_tokens") else None,
            execute_teacher=getattr(cbv, "execute_teacher", False),
        )
        if store is not None and extras is not None:
            store(extras)
            if fit_hook is not None and cbv.buffer_full():
                fit_hook()
        if env.all_done(crit):
            break
    return state, crit


def run_episode(
    env, ego, cbv, state, crit, spec, max_ticks,
    train=False, on_tick=None,
):
    """Generic tick loop. `on_tick(prev_state, state, crit, ego_out,
    cbv_out)` observes every transition (training collectors, data
    collection, rendering)."""
    from .rollout import flush_pending, tick_extras

    pending = []
    store = getattr(cbv, "store_chunk", None)
    for _ in range(max_ticks):
        ego_out = _ego_act(ego, spec, state, train)
        cbv_out = cbv.act(spec, state, train=train)
        kw = _step_kwargs(ego_out, cbv_out)
        prev_state = state
        state, crit = env.step(state, crit, **kw)
        if train and store is not None and "old_logits" in cbv_out:
            pending.append(tick_extras(env.tmap, cbv_out, state, crit))
            if len(pending) >= FLUSH_K:
                flush_pending(store, pending)
        if on_tick is not None:
            on_tick(prev_state, state, crit, ego_out, cbv_out)
        if env.all_done(crit):
            break
    if store is not None:
        flush_pending(store, pending)
    return state, crit


# ---------------------------------------------------------------------------
# GAE batch assembly for the classic PPO paths
# ---------------------------------------------------------------------------
def _gae_batch(ppo, traj, bootstrap_value):
    """traj: dict of [T, B, ...] numpy stacks (obs, action, logp, value,
    reward, done, valid). Returns the flattened train batch over steps where
    the agent was valid and its episode not yet over."""
    from .rl.losses import gae

    rewards = jnp.asarray(traj["reward"])  # [T, B]
    values = jnp.concatenate(
        [jnp.asarray(traj["value"]), jnp.asarray(bootstrap_value)[None]], axis=0
    )  # [T+1, B]
    dones = jnp.asarray(traj["done"])  # [T, B]

    adv, ret = jax.vmap(
        lambda r, v, d: gae(r, v, d, ppo.gamma, ppo.lam),
        in_axes=1, out_axes=1,
    )(rewards, values, dones)

    live = np.asarray(traj["valid"], bool)  # [T, B]
    # drop steps after the episode finished: keep up to & incl. first done
    done_np = np.asarray(dones, bool)
    after_done = np.concatenate(
        [np.zeros((1,) + done_np.shape[1:], bool), np.cumsum(done_np, 0)[:-1] > 0]
    )
    keep = live & ~after_done
    flat = lambda x: np.asarray(x)[keep]
    return {
        "obs": jnp.asarray(flat(traj["obs"])),
        "action": jnp.asarray(flat(traj["action"])),
        "old_log_prob": jnp.asarray(flat(traj["logp"])),
        "advantage": jnp.asarray(flat(np.asarray(adv))),
        "returns": jnp.asarray(flat(np.asarray(ret))),
    }, int(keep.sum())


def _buf_size(cbv) -> int:
    buf = getattr(cbv, "buffer", None)
    return 0 if buf is None else int(buf.size)


def _check_new_samples(cbv, pre_size: int, ep: int, streak: int = 0) -> int:
    """Loud invariant (VERDICT r2 weak#2): train_cbv episodes that add
    zero valid samples mean the recognition/advantage plumbing is broken
    (e.g. forced CBVs on pooled, not-yet-awake agents).

    ONE empty episode is legitimate — a sparse route batch can recognize
    no CBVs within 300 ticks (the reference also logs CBV-less episodes,
    carla_env.py:180-208) — so this warns and only raises after
    3 CONSECUTIVE empty episodes. Returns the updated streak."""
    if not hasattr(cbv, "buffer"):
        return 0
    post = _buf_size(cbv)
    if post > pre_size or post >= getattr(cbv, "buffer_capacity", 1):
        return 0
    import warnings

    warnings.warn(
        f"train_cbv episode {ep} added no valid buffer samples "
        f"(size {pre_size} -> {post}, consecutive empties: {streak + 1})",
        stacklevel=2,
    )
    if streak + 1 >= 3:
        raise RuntimeError(
            f"3 consecutive train_cbv episodes added no valid buffer "
            f"samples (last: episode {ep}, size {post}): no CBV produced "
            "a valid advantage — check recognition cadence, adv_valid, "
            "and that spawned agents are awake (scenario/env.py lazy "
            "BV pool)"
        )
    return streak + 1


def train_ego_episode(env, ego, cbv, state, crit, spec, max_ticks, tmap):
    """Collect one batched episode of ego transitions, then PPO-update the
    ego (reference ego/rl/ppo.py:31-270 semantics: shaped reward, GAE)."""
    from .rl.classic import ego_shaped_reward

    traj = {k: [] for k in ("obs", "action", "logp", "value", "reward", "done", "valid")}
    last_out = None

    def on_tick(prev_state, state, crit_now, ego_out, cbv_out):
        nonlocal last_out
        last_out = ego_out
        lane_s, lane_lat, _ = tmap.project(state.lane[:, 0], state.pos[:, 0])
        r = ego_shaped_reward(
            speed_lon=state.speed[:, 0],
            steer=ego_out["ctrl"][:, 1],
            lane_dist=lane_lat,
            collided=state.collision[:, 0],
        )
        traj["obs"].append(np.asarray(ego_out["obs"]))
        traj["action"].append(np.asarray(ego_out["action"]))
        traj["logp"].append(np.asarray(ego_out["logp"]))
        traj["value"].append(np.asarray(ego_out["value"]))
        traj["reward"].append(np.asarray(r))
        traj["done"].append(np.asarray(crit_now.done))
        traj["valid"].append(np.ones(state.alive.shape[0], bool))

    state, crit = run_episode(
        env, ego, cbv, state, crit, spec, max_ticks, train=True, on_tick=on_tick
    )
    if not traj["obs"]:
        return state, crit, []
    stacked = {k: np.stack(v) for k, v in traj.items()}
    boot = ego.ppo.value(ego.ppo.params, jnp.asarray(stacked["obs"][-1]))
    batch, n = _gae_batch(ego.ppo, stacked, boot)
    losses = ego.train_round(batch) if n > 0 else []
    return state, crit, losses


def train_classic_cbv_episode(env, ego, cbv, state, crit, spec, max_ticks):
    """Collect per-CBV transitions for the classic rl CBVs, then PPO-update
    (reference cbv/planning/rl/ppo.py + CBVFullTrainReward semantics)."""
    from .rl.classic import GOAL_RADIUS, cbv_full_train_reward

    traj = {k: [] for k in ("obs", "action", "logp", "value", "reward", "done", "valid")}
    prev_slots = None
    prev_goal_dist = None

    def on_tick(prev_state, state, crit_now, ego_out, cbv_out):
        nonlocal prev_slots, prev_goal_dist
        slots = np.asarray(cbv_out["cbv_slots"])  # [S, C]
        valid = slots >= 0
        sl = np.maximum(slots, 0)
        s_ix = np.arange(slots.shape[0])[:, None]
        goal = np.asarray(state.goal)[s_ix, sl]
        pos = np.asarray(state.pos)[s_ix, sl]
        goal_dist = np.linalg.norm(goal - pos, axis=-1)
        if prev_goal_dist is None or prev_slots is None:
            gd_prev = goal_dist
            same = np.ones_like(valid)
        else:
            same = prev_slots == slots
            gd_prev = np.where(same, prev_goal_dist, goal_dist)
        collided = np.asarray(state.collision)[s_ix, sl] & valid
        # collision not involving the ego (reference cbv_reward.py:44-52)
        with_other = collided & (np.asarray(state.collided_with)[s_ix, sl] != 0)
        reached = (goal_dist < GOAL_RADIUS) & valid
        r = cbv_full_train_reward(
            jnp.asarray(gd_prev), jnp.asarray(goal_dist),
            jnp.asarray(with_other), jnp.asarray(reached),
        )
        done = (
            collided | reached
            | np.asarray(crit_now.done)[:, None]
            | ~same
        )
        traj["obs"].append(np.asarray(cbv_out["obs"]))
        traj["action"].append(np.asarray(cbv_out["action"]))
        traj["logp"].append(np.asarray(cbv_out["logp"]))
        traj["value"].append(np.asarray(cbv_out["value"]))
        traj["reward"].append(np.asarray(r))
        traj["done"].append(done)
        traj["valid"].append(valid)
        prev_slots, prev_goal_dist = slots, goal_dist

    state, crit = run_episode(
        env, ego, cbv, state, crit, spec, max_ticks, train=True, on_tick=on_tick
    )
    if not traj["obs"]:
        return state, crit, []
    # flatten the CBV axis into the batch axis: [T, S, C, ...] -> [T, S*C, ...]
    stacked = {
        k: np.stack(v).reshape((len(v), -1) + np.asarray(v[0]).shape[2:])
        for k, v in traj.items()
    }
    boot_obs = jnp.asarray(stacked["obs"][-1])
    boot = cbv.ppo.value(cbv.ppo.params, boot_obs)
    batch, n = _gae_batch(cbv.ppo, stacked, boot)
    losses = cbv.train_round(batch) if n > 0 else []
    return state, crit, losses


def collect_episode(env, ego, cbv, state, crit, spec, max_ticks, buffer):
    """Store per-tick SimState snapshots (reference collect_buffer.py:130)."""
    buffer.set_static(
        {"ego_route": spec.ego_route, "ego_route_len": spec.ego_route_len}
    )

    def on_tick(prev_state, state, crit_now, ego_out, cbv_out):
        buffer.store(state)

    return run_episode(
        env, ego, cbv, state, crit, spec, max_ticks, train=False, on_tick=on_tick
    )


# ---------------------------------------------------------------------------
def main(argv=None):
    if os.environ.get("RIFT_TPU_FORCE_CPU") == "1":
        # subprocess CPU mode (ego_zoo --cpu smoke runs): must land before
        # any backend initialises; assert like ego_zoo's in-process check
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        assert _jax.default_backend() == "cpu", (
            "RIFT_TPU_FORCE_CPU=1 but a non-CPU backend already initialised"
        )
    p = argparse.ArgumentParser("rift_tpu")
    p.add_argument("--mode", default="eval",
                   choices=["train_cbv", "train_ego", "eval", "collect_data"])
    p.add_argument("--ego_cfg", default="pdm_lite")
    p.add_argument("--cbv_cfg", default="rift_pluto")
    p.add_argument("--num_scenario", type=int, default=4)
    p.add_argument("--num_agents", type=int, default=16)
    p.add_argument("--num_episodes", type=int, default=2)
    p.add_argument("--max_ticks", type=int, default=600)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--town", default="grid")
    p.add_argument("--blocks", type=int, default=2)
    p.add_argument("--routes", default="")
    p.add_argument("--routes_subset", default="")
    p.add_argument("--repetitions", type=int, default=1)
    p.add_argument("--out_dir", default="log")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num_walkers", type=int, default=-1,
                   help="crossing pedestrians per scenario (-1 = auto: 2 in "
                        "eval, 0 otherwise) — exercises the 0.5-penalty "
                        "collision class (statistics_manager.py:27-44)")
    p.add_argument("--num_statics", type=int, default=-1,
                   help="static obstacles per scenario (-1 = auto: 2 in "
                        "eval, 0 otherwise) — the 0.65-penalty class")
    p.add_argument("--stop_ratio", type=float, default=0.25,
                   help="fraction of route-map junctions converted to "
                        "all-way-stop (stop-sign criteria, penalty 0.8)")
    p.add_argument("--max_cbvs", type=int, default=-1,
                   help="max CBVs per scenario. Recognition-level, policy-"
                        "independent (reference rule.yaml:28 max_agent_num: "
                        "-1 = auto: 2 in eval, 3 otherwise) — standard mode "
                        "promotes CBVs too, it just drives them with the "
                        "autopilot (carla_env.py:180-208)")
    p.add_argument("--lights", default="green", choices=["green", "cycle"],
                   help="traffic-light regime. 'green' freezes every light "
                        "green — the reference's protocol (env_wrapper.py:91 "
                        "set_all_traffic_light(Green, freeze)), required for "
                        "its 3-second ActorBlockedTest to make sense; "
                        "'cycle' runs real phases (sim/traffic_lights.py)")
    p.add_argument("--cbv_recog", default="rule",
                   choices=["rule", "attention"],
                   help="CBV recognition (CBV_RECOGNITION_LIST equivalent): "
                        "rule interaction matching or the PlanT attention "
                        "scorer (attn_cbv.py:20-30)")
    p.add_argument("--recog_weights", default="",
                   help="npz of trained PlanT scorer params "
                        "(models/plant/train.py) for --cbv_recog attention")
    p.add_argument("--ego_weights", default="",
                   help="npz of trained ego params (PlanT via "
                        "models/plant/train.py, E2E stacks via train_ego's "
                        "saved *_bc.npz) loaded into the ego before the "
                        "run — the reference's team_code checkpoint load "
                        "(e2e_agent.py:20-142, plant_agent.py:29)")
    p.add_argument("--pretrain", default="",
                   help="npz of pretrained Pluto params (utils/params_io "
                        "format) loaded into the Pluto-family CBV before "
                        "running — the reference's pluto_1M_aux_cil.ckpt "
                        "load path (pluto.py:130-137); also anchors GRPO's "
                        "KL reference")
    p.add_argument("--save_pretrain", default="",
                   help="after the run, save the CBV's params as a "
                        "canonical pretrain npz (bootstrap-pretrain stage "
                        "of tools/quality_experiment.py)")
    p.add_argument("--shared_town", action="store_true",
                   help="compile ALL of the run's routes into ONE "
                        "persistent TensorMap up front (routes within "
                        "CROSS_EPS keep true relative town geometry; "
                        "transversal crossings become shared signalised "
                        "junctions) instead of rebuilding a per-batch "
                        "corridor map every episode — the reference's "
                        "one-CarlaMap-per-town contract "
                        "(nuplan_map_utils.py:46-66)")
    p.add_argument("--no_fused", action="store_true",
                   help="force the per-tick host loop (debugging); by "
                        "default eval/train_cbv run fused chunks")
    p.add_argument("--render", action="store_true",
                   help="record a BEV GIF of scenario 0 with the executed "
                        "CBV trajectories overlaid (visualization/: "
                        "bev_render.py + nuplan_scenario_render.py)")
    p.add_argument("overrides", nargs="*", help="hydra-style key=value")
    args = p.parse_args(argv)

    enable_compilation_cache()

    ego_cfg = apply_overrides(load_config(args.ego_cfg), [])
    cbv_cfg = apply_overrides(load_config(args.cbv_cfg), args.overrides)

    # CBV count is recognition config, not policy config (rule.yaml:28
    # max_agent_num: train 3 / eval 2); an explicit --max_cbvs or a
    # max_cbvs=N override wins
    if args.max_cbvs >= 0:
        max_cbvs = args.max_cbvs
    else:
        max_cbvs = cbv_cfg.get(
            "max_cbvs", 2 if args.mode == "eval" else 3
        )
    cbv_cfg["max_cbvs"] = max_cbvs  # policies size their slot axis from it

    def _apply_lights(tm):
        """Reference protocol: every light frozen green
        (env_wrapper.py:91). light_group -1 = unsignalised = always green."""
        if args.lights == "green" and tm is not None:
            import jax.numpy as _jnp

            tm = tm.replace(light_group=_jnp.full_like(tm.light_group, -1))
        return tm

    tmap, route_configs = build_map(args)
    tmap = _apply_lights(tmap)  # None-safe (route towns build below)
    loader = None
    shared_paths = None  # config-index -> lane path on the shared town
    cfg_route_idx: dict[int, int] = {}
    route_pad = [PAD_ROUTE_LANES]  # grows if a batch needs more lanes
    if tmap is None:
        from .map.from_route import map_from_routes, shared_map_from_routes
        from .scenario.routes import EvalDataLoader, TrainDataLoader

        # data loader over the shipped routes (scenario_data_loader.py)
        if args.mode == "eval":
            loader = EvalDataLoader(route_configs, args.num_scenario)
        else:
            loader = TrainDataLoader(route_configs, args.num_scenario,
                                     seed=args.seed)
        if args.shared_town:
            tmap, shared_paths = shared_map_from_routes(
                [c.keypoints for c in route_configs],
                num_lanes=2, stop_ratio=args.stop_ratio,
            )
            cfg_route_idx = {id(c): i for i, c in enumerate(route_configs)}
        else:
            tmap, _ = map_from_routes(
                [c.keypoints for c in route_configs[: args.num_scenario]],
                num_lanes=2, pad_lanes_to=PAD_ROUTE_LANES,
                stop_ratio=args.stop_ratio,
            )
        tmap = _apply_lights(tmap)
        if not args.shared_town:
            # map_from_routes grows the pad for junction-heavy batches;
            # carry the grown value forward so episode maps keep ONE
            # compiled shape for the whole run
            route_pad[0] = max(route_pad[0], len(tmap.road_id))

    # auto defaults: eval ships with the full criteria surface on
    num_walkers = args.num_walkers
    num_statics = args.num_statics
    if num_walkers < 0:
        num_walkers = 2 if args.mode == "eval" else 0
    if num_statics < 0:
        num_statics = 2 if args.mode == "eval" else 0

    env = TrafficEnv(
        tmap,
        num_scenarios=args.num_scenario,
        num_agents=args.num_agents,
        max_cbvs=max_cbvs,
        seed=args.seed,
        num_walkers=num_walkers,
        num_statics=num_statics,
    )
    ego = EGO_POLICY_LIST[ego_cfg.get("policy", args.ego_cfg)](tmap, ego_cfg)
    cbv = CBV_POLICY_LIST[cbv_cfg.get("policy", args.cbv_cfg)](tmap, cbv_cfg)
    if args.ego_weights:
        assert hasattr(ego, "load"), f"{ego.name} ego takes no weights"
        ego.load(args.ego_weights)
        print(f"loaded ego weights {args.ego_weights}")

    if args.cbv_recog == "attention":
        from .models.plant import PlanTModel
        from .models.plant.train import load_plant_params

        recog_model = PlanTModel(dim=128, num_layers=4, num_heads=4)
        if args.recog_weights:
            recog_params = load_plant_params(args.recog_weights)
        else:
            import warnings

            warnings.warn(
                "--cbv_recog attention without --recog_weights: scoring "
                "with a randomly-initialised PlanT (train one via "
                "python -m rift_tpu.models.plant.train <collect.h5>)",
                stacklevel=1,
            )
            from .models.plant import build_plant_tokens
            from .utils.cache import init_params_on_cpu

            _state, _crit, _spec = env.reset()
            tk, tp, lh = build_plant_tokens(_spec, _state)
            recog_params = init_params_on_cpu(
                recog_model.init, jax.random.PRNGKey(args.seed), tk, tp, lh,
            )
        env.set_recognition(recog_model, recog_params)

    tag = f"{ego.name}-{cbv.name}-seed{args.seed}"
    out_dir = os.path.join(args.out_dir, args.mode, tag)
    os.makedirs(out_dir, exist_ok=True)
    stats = StatisticsManager(
        os.path.join(out_dir, "simulation_results.json"), resume=args.resume
    )
    ckpt = CheckpointManager(os.path.join(out_dir, "model_ckpt"))

    start_ep = 0
    if args.resume:
        if args.mode == "eval":
            start_ep = stats.resume_index // args.num_scenario
            if loader is not None:
                loader.configs = loader.configs[stats.resume_index:]
        elif hasattr(cbv, "load") and getattr(cbv, "params", None) is not None:
            ep = cbv.load(ckpt)
            start_ep = ep or 0

    collect_buffer = None
    if args.mode == "collect_data":
        from .rl.collect import CollectBuffer

        collect_buffer = CollectBuffer(out_dir, ego.name, cbv.name)
        if collect_buffer.exists() and args.resume:
            print(f"collect_data: {collect_buffer.h5_path} exists, skipping")
            return collect_buffer.h5_path

    def reset_env(ep):
        """Per-episode reset; with a route loader, rebuild the corridor map
        for the sampled batch (fixed lane padding -> no recompilation) and
        run each scenario on its own route.

        Returns (state, crit, spec, batch_configs): batch_configs holds the
        REAL sampled routes only — the scenario axis is padded by repeating
        the last route, and those duplicates must not become statistics
        records (scenario_data_loader.py:109-140 sizes the final batch
        honestly)."""
        if loader is None:
            return (*env.reset(), None)
        from .map import route_waypoints
        from .map.from_route import map_from_routes

        batch = loader.sampler()
        if not batch:
            return (*env.reset(), None)
        real = list(batch)
        while len(batch) < args.num_scenario:  # pad the final partial batch
            batch.append(batch[-1])
        if shared_paths is not None:
            # persistent shared town: the map never changes — episodes
            # only select which precompiled lane paths to drive
            lane_paths = [
                shared_paths[cfg_route_idx[id(c)]]
                for c in batch[: args.num_scenario]
            ]
            routes = [route_waypoints(env.tmap, p) for p in lane_paths]
        else:
            new_tmap, lane_paths = map_from_routes(
                [c.keypoints for c in batch[: args.num_scenario]],
                num_lanes=2, pad_lanes_to=route_pad[0],
                stop_ratio=args.stop_ratio,
            )
            new_tmap = _apply_lights(new_tmap)
            route_pad[0] = max(route_pad[0], len(new_tmap.road_id))
            env.tmap = new_tmap
            for pol in (ego, cbv):
                if hasattr(pol, "tmap"):
                    pol.tmap = new_tmap
            routes = [route_waypoints(new_tmap, p) for p in lane_paths]
        st, cr, sp = env.reset(routes=routes, lane_paths=lane_paths)
        # weather -> sensor visibility (E2E camera bridge; the reference's
        # UE4 cameras see rain/fog, ego/sensors.py applies it as range cut)
        vis = np.asarray(
            [
                c.weather.visibility()
                for c in batch[: args.num_scenario]
            ],
            np.float32,
        )
        sp = sp.replace(visibility=jnp.asarray(vis))
        return st, cr, sp, real

    train_cbv_mode = args.mode == "train_cbv"
    ego_is_rl = getattr(ego, "type", "") == "rl"
    cbv_is_classic_rl = getattr(cbv, "type", "") == "rl"
    can_fuse = (
        not args.no_fused
        and not args.render
        and args.mode in ("eval", "train_cbv")
        and not cbv_is_classic_rl
        and ego.name in FUSED_EGO_KIND
    )

    # experiment tracking: one offline run dir per invocation (the
    # reference's offline-wandb contract, training_builder.py:101-118;
    # browse/compare with tools/runs.py)
    from .utils.tracking import init_run

    track = init_run(
        args.mode,
        name=f"{ego.name}-{cbv.name}-seed{args.seed}",
        config=vars(args),
        base_dir=os.path.join(out_dir, "runs"),
    )

    empty_streak = 0
    # RIFT_TPU_TIMING=1: per-episode phase breakdown (reset/rollout/fit/
    # save/stats) for diagnosing tunnel-stall regressions
    timing = os.environ.get("RIFT_TPU_TIMING", "") == "1"
    t_phase = {"reset": 0.0, "rollout": 0.0, "fit": 0.0, "save": 0.0,
               "stats": 0.0}
    _t = [time.perf_counter()]

    def _mark(phase):
        now = time.perf_counter()
        t_phase[phase] += now - _t[0]
        _t[0] = now

    for ep in range(start_ep, args.num_episodes):
        ep_losses = []
        _mark("stats")
        state, crit, spec, batch_cfgs = reset_env(ep)
        _mark("reset")
        if (
            args.pretrain
            and hasattr(cbv, "load_pretrain")
            and getattr(cbv, "params", None) is None
        ):
            cbv.maybe_init(spec, state)
            cbv.load_pretrain(args.pretrain)
            print(f"loaded pretrain {args.pretrain}")
        if args.mode == "train_ego" and ego_is_rl:
            state, crit, losses = train_ego_episode(
                env, ego, cbv, state, crit, spec, args.max_ticks, tmap
            )
            if losses:
                ep_losses = losses
                print(f"episode {ep}: ego PPO losses {losses[:3]}...")
            if hasattr(ego, "save"):
                ego.save(ckpt, ep)
        elif args.mode == "train_ego" and hasattr(ego, "train_bc"):
            # il-type egos (vad/uniad/sparsedrive): clone the PDM expert
            # closed-loop (models/e2e/train.py; the reference trains these
            # stacks offline on logged sensor data)
            losses = ego.train_bc(spec, state, crit, ticks=args.max_ticks)
            ep_losses = losses
            print(
                f"episode {ep}: {ego.name} BC loss "
                f"{losses[0]:.4f} -> {losses[-1]:.4f}"
            )
            npz = os.path.join(out_dir, "model_ckpt", f"{ego.name}_bc.npz")
            os.makedirs(os.path.dirname(npz), exist_ok=True)
            ego.save(npz)
        elif train_cbv_mode and cbv_is_classic_rl:
            state, crit, losses = train_classic_cbv_episode(
                env, ego, cbv, state, crit, spec, args.max_ticks
            )
            if losses:
                ep_losses = losses
                print(f"episode {ep}: classic CBV PPO losses {losses[:3]}...")
            if hasattr(cbv, "save"):
                cbv.save(ckpt, ep)
        elif args.mode == "collect_data":
            state, crit = collect_episode(
                env, ego, cbv, state, crit, spec, args.max_ticks, collect_buffer
            )
        elif can_fuse:
            pre_size = _buf_size(cbv) if train_cbv_mode else 0
            fit_losses: list = []
            fit_hook = None
            ep_fit_t = [0.0]
            if train_cbv_mode and hasattr(cbv, "buffer_full"):
                def fit_hook():
                    t0 = time.perf_counter()
                    fit_losses.extend(cbv.train_round())
                    ep_fit_t[0] += time.perf_counter() - t0
            state, crit = run_episode_fused(
                env, ego, cbv, state, crit, spec, args.max_ticks,
                train=train_cbv_mode, fit_hook=fit_hook,
            )
            if train_cbv_mode and hasattr(cbv, "buffer_full") and cbv.buffer_full():
                t0 = time.perf_counter()
                fit_losses.extend(cbv.train_round())
                ep_fit_t[0] += time.perf_counter() - t0
            _mark("rollout")
            t_phase["rollout"] -= ep_fit_t[0]
            t_phase["fit"] += ep_fit_t[0]
            if train_cbv_mode:
                # a mid-episode fit proves samples were collected even
                # though the buffer was reset afterwards
                empty_streak = 0 if fit_losses else _check_new_samples(
                    cbv, pre_size, ep, empty_streak
                )
            if fit_losses:
                ep_losses = fit_losses
                rounds = getattr(cbv, "train_rounds", "?")
                print(
                    f"episode {ep}: fine-tune losses {fit_losses[:4]}... "
                    f"({len(fit_losses)} this episode, {rounds} rounds total)"
                )
                if hasattr(cbv, "save"):
                    cbv.save(ckpt, ep)
                    _mark("save")
        else:
            on_tick = None
            recorder = None
            if args.render:
                from .viz import VideoRecorder

                recorder = VideoRecorder(
                    env.tmap, os.path.join(out_dir, f"video_ep{ep}"),
                    every_n_ticks=5,
                )
                route0 = np.asarray(spec.ego_route)[0, : int(spec.ego_route_len[0]), :2]
                weather0 = batch_cfgs[0].weather if batch_cfgs else None

                def on_tick(prev_state, st, crit_now, ego_out, cbv_out):
                    cands = None
                    if "traj" in cbv_out:
                        # executed CBV trajectories, local -> world frame
                        mask = np.asarray(cbv_out["mask"][0])
                        if mask.any():
                            tr = np.asarray(cbv_out["traj"][0][mask])  # [K, T, 2]
                            hd = np.asarray(prev_state.heading[0])[mask]
                            ps = np.asarray(prev_state.pos[0])[mask]
                            c, s = np.cos(hd)[:, None], np.sin(hd)[:, None]
                            cands = np.stack(
                                [
                                    tr[..., 0] * c - tr[..., 1] * s + ps[:, None, 0],
                                    tr[..., 0] * s + tr[..., 1] * c + ps[:, None, 1],
                                ],
                                axis=-1,
                            )
                    w = None
                    if weather0 is not None:
                        pct = 100.0 * float(st.ego_route_cursor[0]) / max(
                            float(spec.ego_route_len[0]), 1.0
                        )
                        w = weather0.at(pct)
                    recorder.maybe_capture(
                        st, 0, route=route0, candidates=cands, weather=w
                    )

            pre_size = _buf_size(cbv) if train_cbv_mode else 0
            state, crit = run_episode(
                env, ego, cbv, state, crit, spec, args.max_ticks,
                train=train_cbv_mode, on_tick=on_tick,
            )
            if recorder is not None:
                print(f"episode {ep}: wrote {recorder.save(f'ep{ep}')}")
            if train_cbv_mode:
                empty_streak = _check_new_samples(cbv, pre_size, ep, empty_streak)
            if train_cbv_mode and hasattr(cbv, "buffer_full") and cbv.buffer_full():
                losses = cbv.train_round()
                ep_losses = losses
                print(f"episode {ep}: fine-tune losses {losses}")
                if hasattr(cbv, "save"):
                    cbv.save(ckpt, ep)
        if batch_cfgs is not None:
            stats.register_episode(
                crit, state, spec,
                route_ids=[c.name for c in batch_cfgs],
                num_valid=len(batch_cfgs),
                weathers=[c.weather for c in batch_cfgs],
            )
            n_new = len(batch_cfgs)
        else:
            stats.register_episode(crit, state, spec)
            n_new = args.num_scenario
        # live, human-readable status (statistics_manager.py:306-423
        # write_live_results semantics)
        from .utils.logger import Logger

        Logger(out_dir).write_live_results(stats.live_results_text())
        ds = float(np.mean([r.driving_score for r in stats.records[-n_new:]]))
        track.log(
            {"episode": ep, "driving_score": ds,
             **({"loss": float(ep_losses[-1])} if ep_losses else {})},
            step=ep,
        )
        print(f"episode {ep}: DS={ds:.1f}")
        if timing:
            _mark("stats")
            print("  timing " + " ".join(
                f"{k}={v:.1f}s" for k, v in t_phase.items()))
            for k in t_phase:
                t_phase[k] = 0.0

    if collect_buffer is not None:
        path = collect_buffer.save()
        print(f"collect_data: wrote {path}")
        track.finish()
        return path

    if args.save_pretrain and hasattr(cbv, "save_pretrain"):
        cbv.save_pretrain(args.save_pretrain)
        print(f"saved pretrain {args.save_pretrain}")

    g = stats.compute_global_statistics()
    track.summary.update(
        {k: v for k, v in g.__dict__.items() if isinstance(v, (int, float))}
    )
    track.finish()
    print(json.dumps(g.__dict__, indent=2))
    return g


if __name__ == "__main__":
    main()
