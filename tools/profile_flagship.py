"""Profile the flagship streaming pipeline at one parallelism level.

Prints per-trigger durationMs breakdown, state-operator metrics, and a
per-stage elapsed/task-time table parsed from the Spark event log, so
the non-scaling tail can be attributed. Usage:

    python tools/profile_flagship.py <cores> [n_clips]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import _warm_page_cache, _warm_python_workers  # noqa: E402

DATA_ROOT = "/root/repo/.data/bench"
EVDIR = "/tmp/spark-events"


def parse_eventlog(path: str) -> None:
    stages = {}
    tasks = {}
    t0 = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev["Task Info"]
                tm = ev.get("Task Metrics") or {}
                d = tasks.setdefault(
                    sid, {"n": 0, "run": 0.0, "first": float("inf"), "last": 0.0,
                          "shuffle_w": 0, "shuffle_r": 0, "input": 0}
                )
                d["n"] += 1
                d["run"] += tm.get("Executor Run Time", 0) / 1e3
                d["first"] = min(d["first"], ti["Launch Time"])
                d["last"] = max(d["last"], ti["Finish Time"])
                d["shuffle_w"] += (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
                d["shuffle_r"] += (tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0) + (
                    tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
                d["input"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
                if t0 is None or ti["Launch Time"] < t0:
                    t0 = ti["Launch Time"]
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                rdds = [r["Name"] for r in si.get("RDD Info", [])]
                # keep the distinctive scope names
                keys = [n for n in rdds if any(
                    k in n for k in ("StateStore", "Exchange", "Scan", "mapInArrow",
                                     "WholeStageCodegen", "HashAggregate"))]
                stages[si["Stage ID"]] = ",".join(dict.fromkeys(keys))[:80] or ";".join(rdds[:3])[:80]
    print(f"\n-- stages ({os.path.basename(os.path.dirname(path))}) --")
    for sid in sorted(tasks):
        d = tasks[sid]
        print(f"stage {sid:3d} window=[{(d['first']-t0)/1e3:7.2f},{(d['last']-t0)/1e3:7.2f}]s "
              f"taskSum={d['run']:7.2f}s n={d['n']:3d} in={d['input']/1e6:7.0f}MB "
              f"sw={d['shuffle_w']/1e6:6.0f}MB sr={d['shuffle_r']/1e6:6.0f}MB  {stages.get(sid,'')}")


def main(cores: int, n: int) -> None:
    from hydra_spark import pipeline, synth
    from hydra_spark.session import get_spark

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        cores=cores, shuffle_partitions=16, app_name=f"profile-{cores}",
        driver_memory="28g",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    paths = synth.ensure_dataset(spark, DATA_ROOT, n=n)
    _warm_python_workers(spark, cores)
    _warm_page_cache(paths["audio"], paths["transcripts"])

    for attempt in ("warmup", "measured"):
        out_root = os.path.join(DATA_ROOT, f"prof_c{cores}")
        shutil.rmtree(out_root, ignore_errors=True)
        t0 = time.time()
        q, sink, t = pipeline.start_flagship(
            spark, paths["audio"], paths["transcripts"], out_root,
            files_per_trigger=128, num_partitions=16,
        )
        q.processAllAvailable()
        wall = time.time() - t0
        progress = [json.loads(p.json) for p in q.recentProgress]
        q.stop()
        if attempt == "warmup":
            continue
        print(f"\n=== cores={cores} wall={wall:.1f}s n={n} ===")
        for p in progress:
            tag = "flush" if p["numInputRows"] == 0 else f"data({p['numInputRows']})"
            d = p["durationMs"]
            rest = " ".join(
                f"{k}={v/1e3:.2f}" for k, v in sorted(d.items())
                if k not in ("triggerExecution",)
            )
            print(f"batch {p['batchId']} {tag}: total={d.get('triggerExecution',0)/1e3:.2f}s {rest}")
            for so in p.get("stateOperators", []):
                print(f"  state: rowsUpdated={so.get('numRowsUpdated')} updateMs={so.get('allUpdatesTimeMs')} "
                      f"commitMs={so.get('commitTimeMs')} stateMemMB={so.get('memoryUsedBytes',0)/1e6:.0f}")
        busy = sum(p["durationMs"]["triggerExecution"] for p in progress if p["numInputRows"] > 0) / 1e3
        print(f"busy={busy:.2f}s -> {n/busy:.0f} clips/s")

    spark.stop()
    time.sleep(1)
    for f in sorted(glob.glob(os.path.join(EVDIR, "*")), key=os.path.getmtime):
        if os.path.isdir(f):
            for inner in glob.glob(os.path.join(f, "events_*")):
                parse_eventlog(inner)
        elif not f.endswith(".inprogress"):
            parse_eventlog(f)


if __name__ == "__main__":
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 480000
    main(cores, n)
