"""Measure the effect of shuffle/state-partition width on the streaming
drain rows (round-14, guide §2.2): for each width, set
spark.sql.shuffle.partitions session-wide, run each row (construct +
noop) twice, keep the min. A batch control row detects band drift.

Usage: python tools/width_probe.py [sf_dir] [w1,w2,...] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_QUERIES = [
    "rel_q1_pricing_summary",  # batch control
    "s1_stream_windowed_counts",
    "s7_stream_hll",
    "s7_stream_gapfill_locf",
    "s7_stream_sessions",
    "s7_stream_interval_join",
    "s5_stream_pre_images",
    "cdc_stream_scd2_history",
    "s7_stream_user_profiles",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    widths = (
        [int(w) for w in args.pop(0).split(",")]
        if args and "," in args[0]
        else [32, 8, 4, 2]
    )
    names = args or DEFAULT_QUERIES

    from rigatoni_spark.catalog import QUERIES
    from rigatoni_spark.session import get_spark

    spark = get_spark(app_name="width_probe")
    spark.sparkContext.setLogLevel("ERROR")
    default_w = spark.conf.get("spark.sql.shuffle.partitions")
    out: dict[str, dict[int, float]] = {n: {} for n in names}
    for pass_i in range(2):
        for w in widths:
            spark.conf.set("spark.sql.shuffle.partitions", str(w))
            for name in names:
                spark.sparkContext.setJobDescription(f"width={w} {name}")
                t0 = time.monotonic()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                sec = round(time.monotonic() - t0, 3)
                if pass_i == 0 or sec < out[name][w]:
                    out[name][w] = sec
    spark.conf.set("spark.sql.shuffle.partitions", default_w)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
