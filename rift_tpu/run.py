"""CLI entry: mode dispatch over the policy zoos.

The scripts/run.py + carla_runner.py equivalent (reference
scripts/run.py:122-232, rift/carla_runner.py:410-487) without the CARLA
server lifecycle: modes train_cbv / train_ego / eval / collect_data over any
(ego policy x CBV policy x recognition) combination, with checkpoint/resume
and leaderboard statistics.

    python -m rift_tpu.run --mode eval --ego_cfg pdm_lite --cbv_cfg rift_pluto \
        --num_scenario 4 --num_episodes 3 --town grid

Routes can come from the synthetic towns or a Bench2Drive XML
(--routes <file.xml>, corridor maps compiled per route).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from .map import make_grid_town, make_straight_town
from .policies import CBV_POLICY_LIST, EGO_POLICY_LIST
from .scenario import TrafficEnv
from .scenario.statistics import StatisticsManager
from .utils import enable_compilation_cache
from .utils.checkpoint import CheckpointManager
from .utils.config import apply_overrides, load_config


def build_map(args):
    if args.routes:
        from .map.from_route import map_from_route
        from .scenario.routes import parse_routes_file

        configs = parse_routes_file(args.routes, args.routes_subset)
        return None, configs  # per-route corridor maps built at reset
    if args.town == "grid":
        return make_grid_town(blocks=args.blocks, num_lanes=2), None
    return make_straight_town(length=600.0, num_lanes=2), None


def run_episode(env, ego, cbv, state, crit, spec, max_ticks, train=False):
    extras_log = []
    for _ in range(max_ticks):
        ego_out = ego.act(spec, state)
        cbv_out = cbv.act(spec, state, train=train)
        kw = {}
        if ego_out.ndim == 3:  # [S, T, 2] waypoints
            kw["ego_traj"] = ego_out
        if "traj" in cbv_out:
            kw["cbv_traj"] = cbv_out["traj"]
            kw["cbv_traj_mask"] = cbv_out["mask"]
        state, crit = env.step(state, crit, **kw)
        if train and hasattr(cbv, "store_chunk") and "old_logits" in cbv_out:
            S, C = cbv_out["cbv_slots"].shape
            flat = lambda x: x.reshape((1, S * C) + x.shape[2:])
            cbv.store_chunk(
                {
                    "features": jax.tree.map(flat, cbv_out["features"]),
                    "old_logits": flat(cbv_out["old_logits"]),
                    "advantage": flat(cbv_out["advantage"]),
                    "valid": flat(cbv_out["adv_valid"]),
                    "sample_valid": flat(cbv_out["cbv_slots"] >= 0)
                    & flat(cbv_out["adv_valid"]).any(axis=(-2, -1)),
                }
            )
        if env.all_done(crit):
            break
    return state, crit, extras_log


def main(argv=None):
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
    p.add_argument("--out_dir", default="log")
    p.add_argument("--resume", action="store_true")
    p.add_argument("overrides", nargs="*", help="hydra-style key=value")
    args = p.parse_args(argv)

    enable_compilation_cache()

    ego_cfg = apply_overrides(load_config(args.ego_cfg), [])
    cbv_cfg = apply_overrides(load_config(args.cbv_cfg), args.overrides)

    tmap, route_configs = build_map(args)
    if tmap is None:
        from .map.from_route import map_from_route

        tmap = map_from_route(route_configs[0].keypoints, num_lanes=2)

    env = TrafficEnv(
        tmap,
        num_scenarios=args.num_scenario,
        num_agents=args.num_agents,
        max_cbvs=cbv_cfg.get("max_cbvs", 3),
        seed=args.seed,
    )
    ego = EGO_POLICY_LIST[ego_cfg.get("policy", args.ego_cfg)](tmap, ego_cfg)
    cbv = CBV_POLICY_LIST[cbv_cfg.get("policy", args.cbv_cfg)](tmap, cbv_cfg)

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
        elif hasattr(cbv, "load") and getattr(cbv, "params", None) is not None:
            ep = cbv.load(ckpt)
            start_ep = ep or 0

    train = args.mode == "train_cbv"
    for ep in range(start_ep, args.num_episodes):
        state, crit, spec = env.reset()
        state, crit, _ = run_episode(
            env, ego, cbv, state, crit, spec, args.max_ticks, train=train
        )
        stats.register_episode(crit, state, spec)
        if train and hasattr(cbv, "buffer_full") and cbv.buffer_full():
            losses = cbv.train_round()
            print(f"episode {ep}: fine-tune losses {losses}")
            if hasattr(cbv, "save"):
                cbv.save(ckpt, ep)
        print(
            f"episode {ep}: DS="
            f"{np.mean([r.driving_score for r in stats.records[-args.num_scenario:]]):.1f}"
        )

    g = stats.compute_global_statistics()
    print(json.dumps(g.__dict__, indent=2))
    return g


if __name__ == "__main__":
    main()
