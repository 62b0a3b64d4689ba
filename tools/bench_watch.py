"""Health-gated scaling-bench runner.

Host contention on this box moves identical runs ±50% on two axes (CPU
and DRAM bandwidth) in bursts of seconds-to-minutes, so the 4->16 gate
can only be measured meaningfully inside a clean window. This watcher
probes both axes with bench's own quick controls and launches a
single-pair scaling run (no headline) only when the window looks clean;
it stops after ``--target-passes`` runs whose efficiency clears
``--eff`` (VERDICT round-4 item 6 asks for two consecutive >= 0.85
marks on the 4->16 pair) or at ``--deadline-min``.

Usage:
    python tools/bench_watch.py [--pair 4:16:16:960000] [--eff 0.85]
        [--target-passes 2] [--deadline-min 240] [--probe-min 6]

NEVER run other Spark work while this may launch a bench run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (quick control probes, no Spark at import)

# clean-window floors at width 16 from BENCH/BASELINE.md pair-2 trial
# stamps (healthy rounds: ctrl 175-227 units/s, bw 196-255 GB/s)
CTRL_FLOOR = {8: 100.0, 16: 185.0}
BW_FLOOR = {8: 115.0, 16: 210.0}


def probe(width: int) -> tuple[float, float]:
    return bench._quick_control_rate(width), bench._quick_bw_rate(width)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="4:16:16:960000")
    ap.add_argument("--eff", type=float, default=0.85)
    ap.add_argument("--target-passes", type=int, default=2)
    ap.add_argument("--deadline-min", type=float, default=240.0)
    ap.add_argument("--probe-min", type=float, default=6.0)
    args = ap.parse_args()

    hi = int(args.pair.split(":")[1])
    lo = int(args.pair.split(":")[0])
    sidecar = f"/root/repo/BENCH/pair_{lo}_{hi}.json"
    t0 = time.time()
    passes = 0
    while time.time() - t0 < args.deadline_min * 60:
        if os.path.exists("/tmp/spark_busy.lock"):
            # other Spark work in flight (pytest, correctness runs) —
            # a bench launched now would measure that contention
            print(f"[watch {time.strftime('%H:%M:%S')}] spark_busy.lock "
                  "present, waiting", flush=True)
            time.sleep(120)
            continue
        ctrl, bw = probe(hi)
        clean = ctrl >= CTRL_FLOOR.get(hi, 185.0) and bw >= BW_FLOOR.get(hi, 210.0)
        print(f"[watch {time.strftime('%H:%M:%S')}] w{hi} ctrl {ctrl} "
              f"bw {bw} -> {'CLEAN, launching bench' if clean else 'dirty'}",
              flush=True)
        if not clean:
            time.sleep(args.probe_min * 60)
            continue
        env = dict(os.environ, HYDRA_BENCH_HEADLINE="0",
                   HYDRA_BENCH_PAIRS=args.pair)
        try:
            r = subprocess.run([sys.executable, "bench.py"], cwd="/root/repo",
                               env=env, capture_output=True, text=True,
                               timeout=7200)
        except subprocess.TimeoutExpired:
            # first launch may synthesize ~37 GB before measuring; a hung
            # run must not kill the multi-hour campaign
            print("[watch] bench timed out after 7200s, waiting for next "
                  "window", flush=True)
            time.sleep(args.probe_min * 60)
            continue
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), "")
        eff = None
        if line:
            try:
                eff = json.loads(line)["streaming"]["scaling_efficiency"]
            except (json.JSONDecodeError, KeyError):
                pass
        print(f"[watch] bench rc={r.returncode} eff={eff}", flush=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], flush=True)
            time.sleep(args.probe_min * 60)
            continue
        if eff is not None and eff >= args.eff:
            passes += 1
            print(f"[watch] PASS {passes}/{args.target_passes} "
                  f"(eff {eff} >= {args.eff})", flush=True)
            if passes >= args.target_passes:
                with open(sidecar) as f:
                    print("[watch] final sidecar eff:",
                          json.load(f)["scaling_efficiency"], flush=True)
                return 0
        else:
            # a clean-probe window can still dirty mid-run; the in-run
            # per-trial stamps decide what the sidecar keeps.  The VERDICT
            # gate asks for CONSECUTIVE healthy marks, so a completed
            # below-target run resets the streak.
            passes = 0
            print("[watch] below target, streak reset, waiting for next "
                  "window", flush=True)
        time.sleep(60)
    print(f"[watch] deadline reached with {passes} passes", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
