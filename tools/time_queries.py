"""Ad-hoc per-query timing with the same steal-resistant min-of-2
two-pass policy bench.py uses. Usage:

    python tools/time_queries.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    from rigatoni_spark.catalog import QUERIES
    from rigatoni_spark.session import get_spark

    spark = get_spark(app_name="time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    names = args or list(QUERIES)
    timings: dict[str, float] = {}
    for pass_i in range(2):
        for name in names:
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = round(time.monotonic() - t0, 3)
            if pass_i == 0 or sec < timings[name]:
                timings[name] = sec
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
