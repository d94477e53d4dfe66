"""Shared example plumbing: a local session and testdata defaults so
every example runs as `python examples/<name>.py` out of the box."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def example_session(app: str):
    from rigatoni_spark.session import get_spark

    return get_spark(app_name=app)


def workdir(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=prefix)


def event_feed(root: str, sf_dir: str = SF_DIR) -> str:
    """Stage the change-event feed as its own source dir (the pipeline
    watches a DIRECTORY of event files, the way a CDC landing zone
    looks — pointing it at the whole testdata dir would stream every
    table)."""
    import shutil

    src = os.path.join(root, "feed")
    os.makedirs(src, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(src, "events.parquet"))
    return src
