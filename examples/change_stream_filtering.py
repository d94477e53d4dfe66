"""$match filtering on the change stream — the Spark twin of the
reference's change_stream_listener example (rigatoni-examples/
change_stream_listener.rs:153-165: $in on operationType + a
fullDocument field bound). The pipeline translates the Mongo-style
$match into Catalyst predicates that reach the parquet scan."""

from __future__ import annotations

from _common import SF_DIR, example_session


def main(spark, sf_dir: str):
    from rigatoni_spark.operators.filters import match_pipeline, project_envelope
    from rigatoni_spark.sources.change_events import read_change_events

    pipeline = [
        {
            "$match": {
                "operationType": {"$in": ["insert", "update"]},
                "fullDocument.k": {"$gte": 50},
            }
        }
    ]
    ce = read_change_events(spark, sf_dir)
    out = project_envelope(match_pipeline(ce, pipeline))
    out.explain()  # PushedFilters show the scan-level constraint
    rows = out.count()
    print(f"matched {rows} events")
    return rows


if __name__ == "__main__":
    main(example_session("example_filtering"), SF_DIR)
