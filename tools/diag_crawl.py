#!/usr/bin/env python
"""Diagnose why CBVs crawl (~0.4 m/s) in the quality eval (r3 table).

Replicates the quality-eval setup (dev10 routes, pdm_lite ego, frozen
pretrained Pluto CBVs) and prints, per tick window: CBV speed, the model's
chosen-candidate displacement (what the planner asked for), and the PID's
realized motion — to separate "planner asks for slow" from "tracker can't
follow".
"""
from __future__ import annotations

import os
import sys

import jax
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from rift_tpu.map import route_waypoints  # noqa: E402
from rift_tpu.map.from_route import map_from_routes  # noqa: E402
from rift_tpu.policies import CBV_POLICY_LIST, EGO_POLICY_LIST  # noqa: E402
from rift_tpu.scenario import TrafficEnv  # noqa: E402
from rift_tpu.scenario.routes import parse_routes_file  # noqa: E402
from rift_tpu.utils import enable_compilation_cache  # noqa: E402
from rift_tpu.utils.config import load_config  # noqa: E402

ROUTES_XML = (
    "/root/reference/rift/scenario/route/"
    "drivetransformer_bench2drive_dev10.xml"
)
PRETRAIN = "/tmp/r4/pluto_pretrain.npz"


def main():
    enable_compilation_cache()
    configs = parse_routes_file(ROUTES_XML, "")
    S, A = 5, 16
    tmap, lane_paths = map_from_routes(
        [c.keypoints for c in configs[:S]], num_lanes=2, pad_lanes_to=256,
        stop_ratio=0.25,
    )
    # protocol parity: lights frozen green (env_wrapper.py:91)
    import jax.numpy as jnp

    tmap = tmap.replace(light_group=jnp.full_like(tmap.light_group, -1))
    env = TrafficEnv(tmap, num_scenarios=S, num_agents=A, max_cbvs=3,
                     seed=0, num_walkers=2, num_statics=2)
    routes = [route_waypoints(tmap, p) for p in lane_paths]
    state, crit, spec = env.reset(routes=routes, lane_paths=lane_paths)

    ego_cfg = load_config("pdm_lite")
    cbv_cfg = load_config("pluto")
    ego = EGO_POLICY_LIST[ego_cfg.get("policy", "pdm_lite")](tmap, ego_cfg)
    cbv = CBV_POLICY_LIST[cbv_cfg.get("policy", "pluto")](tmap, cbv_cfg)
    cbv.maybe_init(spec, state)
    if os.path.exists(PRETRAIN):
        cbv.load_pretrain(PRETRAIN)
        print(f"loaded {PRETRAIN}")
    else:
        print("!! no pretrain found, random params")

    from rift_tpu.run import _step_kwargs, _ego_act

    for t in range(240):
        ego_out = _ego_act(ego, spec, state, False)
        cbv_out = cbv.act(spec, state, train=False)
        kw = _step_kwargs(ego_out, cbv_out)
        prev = state
        state, crit = env.step(state, crit, **kw)
        if t % 20 == 0 or t == 239:
            st = jax.device_get(state)
            co = jax.device_get(cbv_out)
            is_cbv = st.is_cbv & st.alive
            n = int(is_cbv.sum())
            ego_v = np.asarray(st.speed[:, 0])
            if n:
                cbv_v = np.asarray(st.speed)[np.asarray(is_cbv)]
                # chosen-candidate displacement: local traj [S, A, T, 2]
                tr = np.asarray(co["traj"])
                msk = np.asarray(co["mask"])
                # displacement over the first 10 waypoints (1 s)
                d10 = np.linalg.norm(tr[..., 9, :] - tr[..., 0, :], axis=-1)
                dend = np.linalg.norm(tr[..., -1, :] - tr[..., 0, :], axis=-1)
                d10 = d10[msk]
                dend = dend[msk]
                gd = np.linalg.norm(
                    np.asarray(st.goal) - np.asarray(st.pos), axis=-1
                )[np.asarray(is_cbv & st.goal_valid)]
                print(
                    f"t={t:3d} CBVs={n:2d} v={cbv_v.mean():5.2f}"
                    f"±{cbv_v.std():4.2f} traj_d1s={d10.mean():5.2f}"
                    f" traj_dend={dend.mean():5.2f}"
                    f" goal_d={gd.mean() if len(gd) else -1:6.1f}"
                    f" ego_v={ego_v.mean():4.2f}"
                    f" done={int(np.asarray(crit.done).sum())}"
                )
            else:
                print(f"t={t:3d} CBVs=0 ego_v={ego_v.mean():4.2f} "
                      f"done={int(np.asarray(jax.device_get(crit).done).sum())}")
    # final: ego blocked causes
    c = jax.device_get(crit)
    print("blocked:", np.asarray(c.blocked).tolist())
    print("complete:", np.asarray(c.route_complete).tolist())
    print("cbv_progress:", np.asarray(c.cbv_progress_m).round(1).tolist())
    print("reach_goal:", np.asarray(c.cbv_reach_goal).tolist())
    print("promotions:", np.asarray(c.cbv_new_count).tolist())




def probe_tracker():
    """Per-tick, single-CBV: executed speed, the tracker's implied desired
    speed from the commanded waypoints (world clips to LOOKAHEAD=30, samples
    every 10), and the applied control."""
    enable_compilation_cache()
    configs = parse_routes_file(ROUTES_XML, "")
    S, A = 2, 12
    tmap, lane_paths = map_from_routes(
        [c.keypoints for c in configs[:S]], num_lanes=2, pad_lanes_to=256,
        stop_ratio=0.25,
    )
    import jax.numpy as jnp

    tmap = tmap.replace(light_group=jnp.full_like(tmap.light_group, -1))
    env = TrafficEnv(tmap, num_scenarios=S, num_agents=A, max_cbvs=2, seed=0)
    routes = [route_waypoints(tmap, p) for p in lane_paths]
    state, crit, spec = env.reset(routes=routes, lane_paths=lane_paths)

    ego_cfg = load_config("pdm_lite")
    cbv_cfg = load_config("pluto")
    ego = EGO_POLICY_LIST["pdm_lite"](tmap, ego_cfg)
    cbv = CBV_POLICY_LIST["pluto"](tmap, cbv_cfg)
    cbv.max_cbvs = 2
    cbv.maybe_init(spec, state)
    cbv.load_pretrain(PRETRAIN)
    from rift_tpu.run import _step_kwargs, _ego_act

    for t in range(140):
        ego_out = _ego_act(ego, spec, state, False)
        cbv_out = cbv.act(spec, state, train=False)
        kw = _step_kwargs(ego_out, cbv_out)
        state, crit = env.step(state, crit, **kw)
        if t >= 50 and t % 5 == 0:
            st = jax.device_get(state)
            co = jax.device_get(cbv_out)
            msk = np.asarray(co["mask"])
            if not msk.any():
                continue
            s_i, a_i = np.argwhere(msk)[0]
            tr = np.asarray(co["traj"])[s_i, a_i]  # [T, 2]
            wp30 = tr[:30][9::10]  # world's sampled window
            seg = np.diff(wp30, axis=0)
            desired = np.linalg.norm(seg, axis=-1).mean() if len(seg) else 0.0
            ctl = np.asarray(st.control)[s_i, a_i]
            v = float(np.asarray(st.speed)[s_i, a_i])
            print(
                f"t={t:3d} cbv=({s_i},{a_i}) v={v:5.2f} desired~{desired:5.2f}"
                f" thr={ctl[0]:4.2f} steer={ctl[1]:+5.2f} brk={ctl[2]:3.1f}"
                f" wp9={tr[9].round(1)} wp19={tr[19].round(1)}"
                f" wp29={tr[29].round(1)} wp79={tr[79].round(1)}"
            )


if __name__ == "__main__":
    import sys as _s
    probe_tracker() if "--tracker" in _s.argv else main()
