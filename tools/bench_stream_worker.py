"""Streaming-bench worker: one SparkSession at a fixed core count,
driven over stdin by bench.py so the two parallelism levels can be
measured INTERLEAVED (lo, hi, lo, hi, ...) without paying a fresh
JVM + JIT + codegen warmup per pass.

Host contention bursts on this sandbox last seconds-to-minutes and move
identical runs by ±50% (BENCH/BASELINE.md control data). Measuring all
passes of one level back-to-back risks an entire level landing inside
one burst — which is exactly what a scaling-efficiency *ratio* cannot
survive. Interleaving decorrelates the levels from the bursts; best-of-k
per level then estimates each level's uncontended throughput.

Protocol (line-oriented):
  stdout -> "READY" after session+worker warmup
  stdin  <- "WARM <out_root>"  (untimed pipeline pass over the SMALLER
            cached dataset — JIT/codegen/state-store/allocator warming
            needs a representative pass, not the full-size input)
  stdin  <- "RUN <out_root>"   (fresh checkpoint, full flagship pass)
  stdout -> "RESULT {json}"    (busy_s, wall_s, rows_out)
  stdin  <- "EXIT"

The two worker JVMs coexist but NEVER execute concurrently — the parent
serializes RUN commands. One subtlety makes "idle" true: after a pass,
the finished worker's RocksDB state-store providers stay loaded and the
store maintenance task (default interval 60 s) later runs their
deferred snapshot/compaction work — in the middle of the OTHER level's
timed pass (measured: +30-100%% on interleaved local[16] passes vs
back-to-back ones). Each pass therefore ends by unloading all state
store providers (StateStore.stop()), so a pass's deferred maintenance
can never bill the other level's measurement; the next pass reloads
stores from its own fresh checkpoint and pays its own open cost. On a
real cluster this cross-billing cannot happen — each executor maintains
only its own stores, concurrently with its own processing.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1])
    audio_dir, transcripts_dir = sys.argv[2], sys.argv[3]
    n = int(sys.argv[4])
    stream_partitions = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    warm_audio = sys.argv[6] if len(sys.argv) > 6 else audio_dir
    warm_trs = sys.argv[7] if len(sys.argv) > 7 else transcripts_dir

    from bench import _warm_python_workers
    from hydra_spark import pipeline
    from hydra_spark.session import get_spark

    def unload_state_stores(s) -> None:
        """Unload every loaded RocksDB provider and stop the maintenance
        thread (see module docstring). StateStore restarts both lazily
        on the next streaming batch."""
        s._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()

    spark = get_spark(
        cores=cores, shuffle_partitions=stream_partitions,
        app_name=f"bench-stream-{cores}", driver_memory="20g",
    )
    _warm_python_workers(spark, cores)
    print("READY", flush=True)

    for line in sys.stdin:
        cmd = line.strip().split()
        if not cmd:
            continue
        if cmd[0] == "EXIT":
            break
        if cmd[0] == "WARM":
            out_root = cmd[1]
            shutil.rmtree(out_root, ignore_errors=True)
            q, _sink, _t = pipeline.start_flagship(
                spark, warm_audio, warm_trs, out_root,
                files_per_trigger=128, num_partitions=stream_partitions,
            )
            q.processAllAvailable()
            q.stop()
            unload_state_stores(spark)
            print("RESULT {}", flush=True)
            continue
        if cmd[0] != "RUN":
            continue
        out_root = cmd[1]
        shutil.rmtree(out_root, ignore_errors=True)
        t0 = time.time()
        q, sink, t = pipeline.start_flagship(
            spark, audio_dir, transcripts_dir, out_root,
            files_per_trigger=128, num_partitions=stream_partitions,
        )
        q.processAllAvailable()
        wall = time.time() - t0
        # sustained = clips / time in data-carrying triggers; the one-time
        # query start and final watermark-flush tick amortize to zero on
        # an unbounded stream (see BENCH/BASELINE.md protocol)
        busy = sum(
            p["durationMs"]["triggerExecution"]
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ) / 1000.0
        q.stop()
        unload_state_stores(spark)
        rows_out = t["output"].read(spark).count()
        print("RESULT " + json.dumps(
            {"cores": cores, "wall_s": round(wall, 2), "busy_s": round(busy, 2),
             "clips_per_sec": round(n / busy, 1), "rows_out": int(rows_out)}
        ), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
