"""Multi-host (DCN) path: two real processes, one SPMD program.

Launches two OS processes joined through jax.distributed's gRPC
coordinator, each owning 4 virtual CPU devices; both build an 8-device
global `scenario` mesh, contribute their local half of a world-step batch
via host_local_batch, run the SAME jitted fused env step, and must produce
the single-process result exactly. This is the cross-host story the
reference lacks (it merges independent per-port runs offline,
scripts/merge_statistics.py) — here one program spans hosts.
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, sys
    import jax

    # sitecustomize pre-imports jax with the TPU plugin; force CPU before
    # any backend (same as tests/conftest.py), 4 devices per process
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    port, pid = sys.argv[1], int(sys.argv[2])

    from rift_tpu.parallel import global_mesh, host_local_batch, init_distributed

    assert init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8  # global
    assert len(jax.local_devices()) == 4

    import numpy as np
    from rift_tpu.map import make_straight_town
    from rift_tpu.parallel import replicate_global
    from rift_tpu.scenario import TrafficEnv

    S_GLOBAL, S_LOCAL, A = 8, 4, 4
    tmap = make_straight_town(length=300.0, num_lanes=2, pad_lanes_to=16)
    # every process builds the full deterministic reset, keeps its shard
    env = TrafficEnv(tmap, num_scenarios=S_GLOBAL, num_agents=A, seed=3)
    state, crit, spec = env.reset()
    lo, hi = pid * S_LOCAL, (pid + 1) * S_LOCAL
    take = lambda x: jax.device_get(x)[lo:hi]

    mesh = global_mesh()
    gstate = host_local_batch(jax.tree.map(take, state), mesh)
    gcrit = host_local_batch(jax.tree.map(take, crit), mesh)
    # the env's map and spec become global arrays: map replicated,
    # spec sharded with the batch
    env.tmap = replicate_global(tmap, mesh)
    env.spec = host_local_batch(jax.tree.map(take, spec), mesh)

    for _ in range(5):
        gstate, gcrit = env.step(gstate, gcrit)

    # each host reads back only its local shard, in global row order
    shards = sorted(
        gstate.pos.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    local_pos = np.concatenate([np.asarray(s.data) for s in shards])
    print("RESULT" + json.dumps({
        "pid": pid,
        "pos": np.asarray(local_pos).tolist(),
    }))
    """
)


@pytest.mark.slow
def test_two_process_dcn_step_matches_single_host(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)

    shards = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                d = json.loads(line[len("RESULT"):])
                shards[d["pid"]] = np.asarray(d["pos"], np.float32)
    assert set(shards) == {0, 1}
    multi = np.concatenate([shards[0], shards[1]])

    # single-host ground truth (this process, 8 local devices via conftest)
    import jax

    from rift_tpu.map import make_straight_town
    from rift_tpu.scenario import TrafficEnv

    tmap = make_straight_town(length=300.0, num_lanes=2, pad_lanes_to=16)
    env1 = TrafficEnv(tmap, num_scenarios=8, num_agents=4, seed=3)
    state, crit, spec = env1.reset()
    for _ in range(5):
        state, crit = env1.step(state, crit)
    single = np.asarray(jax.device_get(state.pos), np.float32)

    np.testing.assert_allclose(multi, single, rtol=0, atol=1e-5)
