"""Beyond-reference: a continuously-maintained CURRENT-STATE table.

The reference replicates the change log to S3 and stops — consumers
rebuild state themselves (README.md "What Rigatoni does"). This example
closes that loop: MaterializedView folds the change stream into a
queryable snapshot (insert/replace/update upsert, delete removes the
key), published through an append-only ``_commits/`` manifest log —
each batch stages ``v-<id>`` then commits ONE immutable manifest
object, so readers always resolve a complete snapshot and a crash
between stage and commit is invisible (the object-store-safe shape;
crash pinned in tests/test_materialize.py).

Run: ``python examples/materialized_view.py``
"""

from __future__ import annotations

import os

from _common import SF_DIR, event_feed, example_session, workdir


def main(spark, sf_dir: str, root: str) -> dict:
    from rigatoni_spark.streaming.materialized import MaterializedView

    view = MaterializedView(
        spark,
        event_feed(root, sf_dir),
        os.path.join(root, "snapshot"),
        os.path.join(root, "ckpt"),
    ).start(available_now=True)
    view.await_termination(120)
    view.stop()

    snap = view.snapshot()
    live_keys = snap.count()
    collections = sorted(
        r["collection"]
        for r in snap.select("collection").distinct().collect()
    )
    manifests = sorted(
        os.listdir(os.path.join(root, "snapshot", "_commits"))
    )
    # restart against the same checkpoint: nothing new to process, the
    # published snapshot is unchanged — resume is a no-op, not a rebuild
    view2 = MaterializedView(
        spark,
        os.path.join(root, "feed"),
        os.path.join(root, "snapshot"),
        os.path.join(root, "ckpt"),
    ).start(available_now=True)
    view2.await_termination(120)
    view2.stop()
    assert view2.snapshot().count() == live_keys

    return {
        "live_keys": live_keys,
        "collections": collections,
        "manifests": manifests,
    }


if __name__ == "__main__":
    spark = example_session("materialized_view")
    root = workdir("mv_example_")
    out = main(spark, SF_DIR, root)
    print(
        f"current-state table: {out['live_keys']} live keys across "
        f"{out['collections']}; manifest log: {out['manifests']}"
    )
    spark.stop()
