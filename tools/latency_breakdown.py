"""Decompose the per-trigger addBatch wall at the production config
(batch 500 / 50 ms): where does the foreachBatch time actually go?

Times, per micro-batch, via monkeypatched seams (no engine changes):
- staged_write_s: the ONE Spark action (scan -> transform -> dedup ->
  observe -> partitionBy staged write), i.e. the JVM job
- probe_s: Observation metric resolution (blocks until the job's
  metrics land; usually ~0 since the job just finished)
- rename_s: staged->final key pass (glob + os renames, driver-side)
- python_s: everything else in the foreachBatch body (plan
  construction, accounting)

The decomposition answers the only open floor question: is the
remaining ~350-400 ms our code (reducible) or Spark's micro-batch
machinery (engine-fixed)? Run alone on an idle box; steal inflates
all components proportionally.

Usage: python tools/latency_breakdown.py [--batches N]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    import pyarrow.parquet as pq

    import rigatoni_spark.sinks.writers as writers_mod
    from rigatoni_spark.config import (
        PartitionStrategy,
        PipelineConfig,
        S3SinkConfig,
        SerializationFormat,
    )
    from rigatoni_spark.session import get_spark
    from rigatoni_spark.streaming.pipeline import Pipeline

    spark = get_spark(app_name="latency_breakdown")
    table = pq.read_table(os.path.join(args.sf_dir, "events.parquet"))
    uniq = table.set_column(
        table.schema.get_field_index("user_id"),
        "user_id",
        table.column("event_id"),
    )

    # --- timed seams -----------------------------------------------------
    samples: list[dict] = []
    real_staged = writers_mod._staged_writer
    real_write_batch = writers_mod.write_batch

    def timed_staged(df, cfg, staging, part_cols):
        t0 = time.monotonic()
        out = real_staged(df, cfg, staging, part_cols)
        samples[-1]["staged_write_s"] = time.monotonic() - t0
        return out

    pending: dict = {}

    def timed_write_batch(df, cfg, **kw):
        samples.append(dict(pending))
        pending.clear()
        probe = kw.get("deferred_probe")
        if probe is not None:

            def timed_probe():
                t0 = time.monotonic()
                out = probe()
                samples[-1]["probe_s"] = time.monotonic() - t0
                return out

            kw["deferred_probe"] = timed_probe
        t0 = time.monotonic()
        out = real_write_batch(df, cfg, **kw)
        samples[-1]["write_batch_s"] = time.monotonic() - t0
        return out

    writers_mod._staged_writer = timed_staged
    # pipeline.py imported write_batch by name — patch at its use site
    import rigatoni_spark.streaming.pipeline as pipeline_mod

    pipeline_mod.write_batch = timed_write_batch

    # seam 3: the WHOLE foreachBatch python body — the delta between
    # this and engine addBatch is pure JVM/py4j glue we can't touch;
    # the delta between this and write_batch_s is OUR plan-construction
    # python (transform + dedup + observe wiring)
    real_foreach = pipeline_mod.Pipeline._foreach_batch

    def timed_foreach(self, batch_df, batch_id, state=None):
        t0 = time.monotonic()
        out = real_foreach(self, batch_df, batch_id, state)
        if samples:
            samples[-1]["foreach_body_s"] = time.monotonic() - t0
        return out

    pipeline_mod.Pipeline._foreach_batch = timed_foreach

    # seam 4/5: inside the python body — dedup plan construction and
    # the post-write accounting
    real_dedup = pipeline_mod.dedup_by_key

    def timed_dedup(df, *a, **kw):
        # runs BEFORE this batch's write_batch sample exists — stash
        # and let timed_write_batch fold it into the new sample
        t0 = time.monotonic()
        out = real_dedup(df, *a, **kw)
        pending["dedup_construct_s"] = time.monotonic() - t0
        return out

    pipeline_mod.dedup_by_key = timed_dedup
    real_finish = pipeline_mod.Pipeline._finish_batch

    def timed_finish(self, *a, **kw):
        t0 = time.monotonic()
        out = real_finish(self, *a, **kw)
        if samples:
            samples[-1]["finish_batch_s"] = time.monotonic() - t0
        return out

    pipeline_mod.Pipeline._finish_batch = timed_finish

    root = tempfile.mkdtemp(prefix="lat_breakdown_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    cfg = PipelineConfig(
        batch_timeout_secs=0.05, batch_size=500, dedup_by_key=True
    )
    sink = S3SinkConfig(
        bucket=os.path.join(root, "out"),
        format=SerializationFormat.JSON,
        partition_strategy=PartitionStrategy.DATE_HOUR_PARTITIONED,
        single_file_per_group=False,
    )

    def feed(i: int) -> None:
        tmp = os.path.join(root, f"tmp_{i:04d}.parquet")
        pq.write_table(uniq.slice(i * 500, 500), tmp)
        os.rename(tmp, os.path.join(src, f"{i:04d}.parquet"))

    p = Pipeline(spark, cfg, sink, src, os.path.join(root, "ckpt")).start()
    try:
        for i in range(2):  # warmup: cold probe path + codegen
            feed(i)
        p.process_all_available()
        n_warm = len(samples)
        for i in range(2, 2 + args.batches):
            feed(i)
            # one file per trigger: feed slower than the trigger cadence
            # so each 500-row file is its own micro-batch (the
            # production steady state this probe decomposes)
            time.sleep(0.4)
        p.process_all_available()
        progress = [q.recentProgress for q in p._queries]
    finally:
        p.stop()

    steady = [s for s in samples[n_warm:] if "write_batch_s" in s]
    durs = [
        json_prog["durationMs"]
        for prog_list in progress
        for prog in prog_list
        for json_prog in [prog]
        if prog["numInputRows"] > 0
    ]

    def med(key: str, scale: float = 1000.0) -> float:
        vals = [s.get(key, 0.0) * scale for s in steady]
        return round(statistics.median(vals), 1) if vals else 0.0

    wb = med("write_batch_s")
    stg = med("staged_write_s")
    prb = med("probe_s")
    fb = med("foreach_body_s")
    dd = med("dedup_construct_s")
    fin = med("finish_batch_s")
    print(f"steady-state batches: {len(steady)}")
    print(f"foreach body total  : {fb} ms (plan construction + write_batch)")
    print(f"  dedup construct   : {dd} ms (python/py4j, pre-write)")
    print(f"  finish accounting : {fin} ms (post-write)")
    print(f"write_batch total   : {wb} ms")
    print(f"  staged write job  : {stg} ms   (the ONE Spark action)")
    print(f"  probe resolution  : {prb} ms")
    print(f"  rename + misc     : {round(wb - stg - prb, 1)} ms")
    if durs:
        add = statistics.median(d.get("addBatch", 0) for d in durs[2:])
        trig = statistics.median(
            d.get("triggerExecution", 0) for d in durs[2:]
        )
        print(f"engine addBatch     : {add} ms (python body above + JVM glue)")
        print(f"engine trigger total: {trig} ms (walCommit/offsets/planning on top)")
        # full per-component medians: every durationMs key the engine
        # reports (latestOffset/getBatch/queryPlanning/walCommit/
        # commitOffsets/...) so the non-addBatch remainder is
        # attributable too
        keys = sorted({k for d in durs[2:] for k in d})
        for key in keys:
            if key in ("addBatch", "triggerExecution"):
                continue
            v = statistics.median(d.get(key, 0) for d in durs[2:])
            print(f"  {key:<18}: {v} ms")


if __name__ == "__main__":
    main()
