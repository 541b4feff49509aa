#!/usr/bin/env python
"""Stall-supervised runner for long TPU experiments.

The tunneled TPU backend occasionally wedges: a device call blocks forever
(0 CPU, no output) and a multi-hour experiment silently dies — this is the
reference's CARLA-crash failure mode in TPU clothing, and the reference
answers it with a retry harness (scripts/run_multi.sh:31-66 + exit-99
classification, scripts/run.py:199-227). This is that harness for the
rift_tpu experiments: run a command, watch its output for stalls, kill and
relaunch on wedge. Both experiment harnesses are artifact-resumable, so a
relaunch continues where the dead run stopped.

    python tools/run_supervised.py --log /tmp/q.log --stall 900 -- \
        python tools/quality_experiment.py
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True, help="combined stdout/stderr log")
    p.add_argument("--stall", type=int, default=900,
                   help="seconds without new output = wedged (a fine-tune "
                        "round compiles in ~5 min; 15 min is decisively stuck)")
    p.add_argument("--max_restarts", type=int, default=20)
    p.add_argument("--probe", action="store_true",
                   help="before each (re)launch, wait until a fresh process "
                        "can reach the device (tunnel outages recover on "
                        "their own schedule; relaunching into a dead tunnel "
                        "just burns a restart)")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to supervise")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "no command given"

    def device_ok() -> bool:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); import jax.numpy as jnp; "
             "(jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()"],
            timeout=None if False else 120, capture_output=True,
        )
        return r.returncode == 0

    for attempt in range(args.max_restarts + 1):
        if args.probe:
            while True:
                try:
                    if device_ok():
                        break
                except subprocess.TimeoutExpired:
                    pass
                print(f"[supervise] device unreachable, retry in 180s",
                      flush=True)
                time.sleep(180)
        log = open(args.log, "ab", buffering=0)
        log.write(f"\n=== supervised launch #{attempt} {time.ctime()}\n"
                  .encode())
        proc = subprocess.Popen(
            cmd, stdout=log, stderr=subprocess.STDOUT,
            start_new_session=True,  # own process group for clean kill
            # stall detection watches the log's SIZE; a block-buffered child
            # writing ~50-byte episode lines into an 8 KB stdio buffer looks
            # wedged for hours and gets false-killed
            env=dict(os.environ, PYTHONUNBUFFERED="1"),
        )
        print(f"[supervise] attempt {attempt}: pid {proc.pid}", flush=True)
        last_size = os.path.getsize(args.log)
        last_change = time.time()
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            time.sleep(20)
            size = os.path.getsize(args.log)
            if size != last_size:
                last_size, last_change = size, time.time()
            elif time.time() - last_change > args.stall:
                print(f"[supervise] stalled {args.stall}s - killing "
                      f"{proc.pid}", flush=True)
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                rc = "stalled"
                break
        log.close()
        if rc == 0:
            print("[supervise] finished ok", flush=True)
            return 0
        print(f"[supervise] exit {rc}; restarting", flush=True)
    print("[supervise] max restarts exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
