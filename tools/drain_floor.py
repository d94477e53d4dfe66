"""Decompose availableNow drain rows: construction wall vs drain wall
vs the engine's own per-trigger durationMs breakdown.

Wraps catalog._drain_to_memory_table to capture each StreamingQuery's
recentProgress before the checkpoint is torn down, then runs the named
catalog rows once (plus noop) and prints per-row JSON:

  python tools/drain_floor.py s7_stream_hll s5_stream_pre_images ...
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")


def main() -> None:
    import rigatoni_spark.catalog as cat
    from rigatoni_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    for a in sys.argv[1:]:
        if a.startswith("/"):
            sf_dir = a

    spark = get_spark(app_name="drain_floor")
    spark.sparkContext.setLogLevel("ERROR")

    captured: list[dict] = []

    def wrapped(
        df, what, order_cols, output_mode="append", cleanup=None, feed=None
    ):
        from rigatoni_spark import tables
        from rigatoni_spark.session import rocksdb_state

        name = f"{what}_{uuid.uuid4().hex[:8]}"
        ckpt = tempfile.mkdtemp(prefix=f"{what}_ckpt_")
        width = None
        if feed is not None:
            paths = (feed,) if isinstance(feed, str) else tuple(feed)
            width = tables.scaled_stream_width(df.sparkSession, *paths)
        t0 = time.monotonic()
        with tables.scoped_shuffle_width(
            df.sparkSession, width
        ), rocksdb_state(df.sparkSession, changelog=True):
            q = (
                df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            t_started = time.monotonic()
            try:
                finished = q.awaitTermination(300)
                t_done = time.monotonic()
                if not finished or q.exception() is not None:
                    raise RuntimeError(f"{what}: {q.exception()}")
                prog = q.recentProgress
            finally:
                shutil.rmtree(ckpt, ignore_errors=True)
                if cleanup is not None:
                    cleanup()
        dur: dict[str, list] = {}
        for p in prog or []:
            for k, v in (p.get("durationMs") or {}).items():
                dur.setdefault(k, []).append(v)
        captured.append(
            {
                "what": what,
                "start_wall_ms": round((t_started - t0) * 1000),
                "drain_wall_ms": round((t_done - t_started) * 1000),
                "n_triggers": len(prog or []),
                "durationMs_per_trigger": dur,
            }
        )
        return df.sparkSession.table(name).orderBy(*order_cols)

    cat._drain_to_memory_table = wrapped

    for name in names:
        captured.clear()
        t0 = time.monotonic()
        df = cat.QUERIES[name](spark, sf_dir)
        t_constructed = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t_noop = time.monotonic()
        print(
            json.dumps(
                {
                    "row": name,
                    "total_s": round(t_noop - t0, 3),
                    "construct_s": round(t_constructed - t0, 3),
                    "noop_s": round(t_noop - t_constructed, 3),
                    "drains": list(captured),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
