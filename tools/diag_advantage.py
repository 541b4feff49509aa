#!/usr/bin/env python
"""Diagnose the RL fine-tune signal chain (quality-experiment efficacy).

Round-3 finding to explain: SFT (pi_head CE to the teacher label) moves
closed-loop DS by +21 while every RL variant (rift/grpo/ppo/rs/reinforce)
leaves behavior ~unchanged — all of them train the same pi_head, so the
re-ranking headroom exists and the suspect is the learning SIGNAL, not
capacity (reference objective: rift_trainer.py:140-182 over the
TrajEvaluator group advantage, traj_evaluator.py:422-475).

This probe collects a real fine-tune buffer from the pretrained model and
answers, numerically:
  1. Is the group advantage informative? (within-group return spread,
     valid fraction)
  2. Does it agree with the privileged teacher? (advantage percentile of
     the teacher-labelled candidate; correlation with teacher distance)
  3. Does one train_round move selection toward high-advantage candidates?
     (argmax flip rate, advantage percentile of the picks before/after)

Usage:
  python tools/diag_advantage.py --pretrain log/quality/artifacts/pluto_pretrain.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ROUTES_XML = (
    "/root/reference/rift/scenario/route/"
    "drivetransformer_bench2drive_dev10.xml"
)


def pct_rank(values: np.ndarray, idx: np.ndarray, valid: np.ndarray):
    """Percentile rank (0..1) of values[i, idx[i]] among valid candidates."""
    n = np.maximum(valid.sum(-1), 1)
    picked = np.take_along_axis(values, idx[:, None], axis=1)[:, 0]
    below = ((values < picked[:, None]) & valid).sum(-1)
    return below / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain", required=True)
    p.add_argument("--cbv", default="rift_pluto")
    p.add_argument("--num_scenario", type=int, default=5)
    p.add_argument("--num_agents", type=int, default=16)
    p.add_argument("--ticks", type=int, default=300)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the image's sitecustomize "
                        "overrides JAX_PLATFORMS, so an env var is not "
                        "enough — mirror tests/conftest.py)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rift_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from rift_tpu.map.from_route import map_from_routes
    from rift_tpu.policies import CBV_POLICY_LIST, EGO_POLICY_LIST, _teacher_label
    from rift_tpu.run import PAD_ROUTE_LANES, run_episode_fused
    from rift_tpu.scenario.env import TrafficEnv
    from rift_tpu.scenario.routes import parse_routes_file
    from rift_tpu.utils.config import load_config as load_cfg

    route_configs = parse_routes_file(ROUTES_XML)
    tmap, lane_paths = map_from_routes(
        [c.keypoints for c in route_configs[: args.num_scenario]],
        num_lanes=2, pad_lanes_to=PAD_ROUTE_LANES, stop_ratio=0.25,
    )
    env = TrafficEnv(
        tmap, num_scenarios=args.num_scenario, num_agents=args.num_agents,
        max_cbvs=3, seed=0,
    )
    cbv_cfg = load_cfg(args.cbv)
    cbv = CBV_POLICY_LIST[cbv_cfg.get("policy", args.cbv)](tmap, cbv_cfg)
    ego = EGO_POLICY_LIST["pdm_lite"](tmap, load_cfg("pdm_lite"))

    from rift_tpu.map import route_waypoints

    routes = [route_waypoints(tmap, p) for p in lane_paths]
    state, crit, spec = env.reset(routes=routes, lane_paths=lane_paths)
    cbv.maybe_init(spec, state)
    cbv.load_pretrain(args.pretrain)
    print(f"loaded pretrain {args.pretrain}")

    # ---- collect one buffer ------------------------------------------------
    state, crit = run_episode_fused(
        env, ego, cbv, state, crit, spec, args.ticks, train=True
    )
    buf = cbv.buffer
    size = int(buf.size)
    print(f"buffer size after {args.ticks} ticks: {size}")
    assert size > 64, "too few samples to diagnose"

    take = lambda x: np.asarray(x[:size])
    adv = take(buf.data["advantage"]).reshape(size, -1)  # [n, R*M]
    val = take(buf.data["valid"]).reshape(size, -1).astype(bool)
    old = take(buf.data["old_logits"])  # [n, R, M]
    ret = take(buf.data["rollout_return"]).reshape(size, -1)
    chosen = take(buf.data["chosen_idx"])
    t_speed = take(buf.data["teacher_speed"])
    t_pos = take(buf.data["teacher_pos"]) if "teacher_pos" in buf.data else None
    feats = jax.tree.map(lambda x: x[:size], buf.data["features"])

    nvalid = val.sum(-1)
    print("\n=== 1. advantage signal ===")
    print(f"valid candidates/sample: mean {nvalid.mean():.1f} "
          f"min {nvalid.min()} max {nvalid.max()}")
    spread = np.where(
        nvalid > 1,
        np.array([r[m].std() if m.sum() > 1 else 0.0
                  for r, m in zip(ret, val)]),
        0.0,
    )
    print(f"within-group return std: mean {spread.mean():.3f} "
          f"median {np.median(spread):.3f} frac<0.1 {(spread < 0.1).mean():.2f}")
    print(f"advantage abs mean {np.abs(adv[val]).mean():.3f}")

    # ---- 2. teacher agreement ---------------------------------------------
    def batched_apply(params, feats, bs=512):
        outs = []
        n = size
        for i in range(0, n, bs):
            chunk = jax.tree.map(lambda x: x[i : i + bs], feats)
            o = cbv.model.apply(params, chunk)
            outs.append({k: o[k] for k in ("probability", "trajectory")})
        return {
            k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]
        }

    out = batched_apply(cbv.params, feats)
    prob = np.asarray(out["probability"])
    r_pad = ~np.asarray(
        feats["reference_line"]["valid_mask"].any(-1)
    )
    teacher = np.asarray(_teacher_label(
        jnp.asarray(prob), jnp.asarray(r_pad), out["trajectory"],
        jnp.asarray(t_speed), jnp.asarray(t_pos) if t_pos is not None else None,
    ))
    # replay consistency: the ratio-based losses (rift/grpo/ppo/rtr) assume
    # model(buffered features) reproduces the collection-time logits, so the
    # first epoch starts at ratio == 1. If it does not, those losses train
    # on clipped noise while SFT's teacher CE is unaffected — exactly the
    # "SFT works, RL flat" failure mode.
    from rift_tpu.rl.losses import masked_log_softmax

    lp_new = np.asarray(masked_log_softmax(out["probability"], jnp.asarray(r_pad)))
    lp_old = np.asarray(masked_log_softmax(jnp.asarray(old), jnp.asarray(r_pad)))
    dlp = np.abs(lp_new - lp_old)[val]
    ratio = np.exp(np.clip(lp_new - lp_old, -20, 20))[val]
    in_clip = ((ratio > 0.8) & (ratio < 1.2)).mean()
    print("\n=== 0. replay consistency (ratio sanity) ===")
    print(f"|log p(replay) - log p(collect)|: mean {dlp.mean():.4f} "
          f"p95 {np.percentile(dlp, 95):.4f} max {dlp.max():.4f}")
    print(f"fraction of valid candidates with ratio inside [0.8, 1.2]: "
          f"{in_clip:.3f}  (should be ~1.0)")

    print("\n=== 2. teacher vs advantage ===")
    t_pct = pct_rank(adv, teacher, val)
    print(f"advantage percentile of teacher pick: mean {t_pct.mean():.3f} "
          f"(1.0 = advantage agrees with teacher, 0.5 = uncorrelated)")
    old_pick = np.asarray(old).reshape(size, -1)
    old_pick = np.where(val, old_pick, -1e9).argmax(-1)
    o_pct = pct_rank(adv, old_pick, val)
    print(f"advantage percentile of current-policy argmax: {o_pct.mean():.3f}")
    c_pct = pct_rank(adv, chosen.astype(int), val)
    print(f"advantage percentile of EXECUTED candidate:    {c_pct.mean():.3f}")

    # speed correlation
    traj = np.asarray(out["trajectory"])  # [n, R, M, T, 6]
    step_d = np.linalg.norm(np.diff(traj[..., :10, :2], axis=-2), axis=-1)
    cand_speed = (step_d.mean(-1) / 0.1).reshape(size, -1)
    m = val & (np.abs(adv) > 0)
    if m.sum() > 10:
        corr = np.corrcoef(cand_speed[m], adv[m])[0, 1]
        print(f"corr(candidate implied speed, advantage): {corr:+.3f}")

    # ---- 3. does one fit move selection toward advantage? ------------------
    print("\n=== 3. one train_round ===")
    import jax.flatten_util as fu

    flat0 = fu.ravel_pytree(cbv.params)[0]
    losses = cbv.train_round()
    flat1 = fu.ravel_pytree(cbv.params)[0]
    print(f"losses: first {losses[0]:.4f} last {losses[-1]:.4f}")
    print(f"|delta params| = {float(jnp.linalg.norm(flat1 - flat0)):.4f}")

    out2 = batched_apply(cbv.params, feats)
    prob2 = np.asarray(out2["probability"]).reshape(size, -1)
    new_pick = np.where(val, prob2, -1e9).argmax(-1)
    flips = (new_pick != old_pick).mean()
    n_pct = pct_rank(adv, new_pick, val)
    print(f"argmax flip rate after fit: {flips:.3f}")
    print(f"advantage percentile of new argmax: {n_pct.mean():.3f} "
          f"(was {o_pct.mean():.3f})")
    t2 = pct_rank(
        np.where(val, prob2, -np.inf), teacher, val
    )
    print(f"policy logit percentile of teacher pick after fit: {t2.mean():.3f}")

    # ---- 4. what the advantage is made of --------------------------------
    # fresh mid-episode state -> evaluator with reward-component attribution
    print("\n=== 4. advantage attribution (reward components) ===")
    from rift_tpu.models.pluto.policy import pluto_cbv_act

    state4, crit4, _ = env.reset(routes=routes, lane_paths=lane_paths)
    state4, crit4 = run_episode_fused(
        env, ego, cbv, state4, crit4, spec, 60, train=False
    )
    res = pluto_cbv_act(
        cbv.model, cbv.params, cbv.tmap, spec, state4,
        max_cbvs=cbv.max_cbvs, train=True, canonical=cbv.canonical,
        map_tok=cbv.map_tokens(), adv_debug=True,
    )
    Sx, Cx, Rx, Mx = np.asarray(res["adv_valid"]).shape
    SC = Sx * Cx
    v4 = np.asarray(res["adv_valid"]).reshape(SC, Rx * Mx)
    a4 = np.asarray(res["advantage"]).reshape(SC, -1)
    live = v4.any(-1)
    print(f"live CBV samples: {live.sum()}/{SC}")
    comps = {
        k[4:]: np.asarray(res[k]).reshape(SC, -1)
        for k in res if k.startswith("dbg_")
    }
    m4 = v4 & live[:, None]
    for k, c in sorted(comps.items()):
        cm = c[m4]
        if k in ("collided",):
            print(f"  {k:>14}: fired on {cm.mean():.3f} of candidates")
            continue
        if k in ("offroad_frac",):
            print(f"  {k:>14}: mean {cm.mean():.3f} frac>0 {(cm > 0).mean():.3f}")
            continue
        corr = (
            np.corrcoef(cm, a4[m4])[0, 1] if cm.std() > 1e-9 else float("nan")
        )
        print(f"  {k:>14}: mean {cm.mean():+8.3f} std {cm.std():7.3f} "
              f"corr(adv) {corr:+.3f}")


if __name__ == "__main__":
    main()
