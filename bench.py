"""Headline benchmark: closed-loop env-steps/sec/chip at 64 parallel scenarios.

The reference runs CARLA sync mode at 10 fps with 1-2 scenarios per
GPU-process, i.e. order 10-20 env-steps/s (BASELINE.md "Throughput context");
`vs_baseline` is measured against the 15 env-steps/s midpoint. Each env step
here is a full closed-loop tick: IDM background traffic, rule ego, Pluto CBV
planner forward + candidate selection + PID tracking, collision/off-road
checks and leaderboard criteria, across all scenarios at once. Ticks run in
fused chunks of CHUNK steps (rift_tpu.rollout.rollout_chunk) so per-dispatch
latency amortizes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax

from rift_tpu.utils import enable_compilation_cache

enable_compilation_cache()

BASELINE_ENV_STEPS_PER_S = 15.0
CHUNK = 10


def main(
    num_scenarios: int = 64,
    num_agents: int = 24,
    max_cbvs: int = 3,
    chunks: int = 10,
    warmup_chunks: int = 1,
):
    from rift_tpu.map import make_grid_town
    from rift_tpu.rollout import rollout_chunk
    from rift_tpu.runner import Runner, RunnerConfig

    tmap = make_grid_town(blocks=2, num_lanes=2)
    cfg = RunnerConfig(
        num_scenarios=num_scenarios,
        num_agents=num_agents,
        max_cbvs=max_cbvs,
        encoder_depth=4,
        decoder_depth=4,
    )
    r = Runner(tmap, cfg)
    state, crit, spec = r.init_params()

    def tick_chunk(state, crit):
        state, crit, _ = rollout_chunk(
            r.model, r.params, tmap, spec, state, crit,
            max_cbvs=max_cbvs, num_steps=CHUNK,
        )
        return state, crit

    t0 = time.perf_counter()
    for _ in range(warmup_chunks):
        state, crit = tick_chunk(state, crit)
    jax.block_until_ready(state.pos)
    compile_s = time.perf_counter() - t0
    print(f"# warmup+compile: {compile_s:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(chunks):
        state, crit = tick_chunk(state, crit)
    jax.block_until_ready(state.pos)
    dt = time.perf_counter() - t0

    env_steps_per_s = chunks * CHUNK * num_scenarios / dt
    print(
        json.dumps(
            {
                "metric": "closed_loop_env_steps_per_sec_per_chip",
                "value": round(env_steps_per_s, 1),
                "unit": f"env-steps/s @ {num_scenarios} scenarios x {num_agents} agents, Pluto CBVs",
                "vs_baseline": round(env_steps_per_s / BASELINE_ENV_STEPS_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = int(v)
    main(**kw)
