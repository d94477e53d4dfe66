"""Sink-output compaction: merge the many small objects a
micro-batched CDC sink accrues into one object per layout group.

The reference flushes one object per (collection, batch) —
`rigatoni-destinations/src/s3/destination.rs:531-604` — so a
long-running pipeline at a 5-second trigger writes ~17K objects per
collection per day. At 100 TB consumer scan cost becomes
object-listing-bound long before it is data-bound (the same
small-files failure mode the admission gate's state compaction
handles, streaming/admission.py). This pass rewrites the WHOLE sink
tree through the REAL writer (`write_batch`) under one compaction
batch id: the deterministic (batch_id, group-time) key scheme then
yields one object per layout group (per (collection, hour) dir under
HIVE — partitionBy re-derives every row's true hour, so layout
fidelity is exact; per collection under the other strategies, keyed
at the group's max event time like any flush).

Offline maintenance: run with the pipeline STOPPED, like
``AdmissionStream.compact``. Crash-safe by a two-phase marker +
deterministic re-run:

1. publish ``_sink_compaction`` marker (phase=staging, cid);
2. clean any partial state (staging dirs, cid-prefixed keys) — the
   remaining tree is exactly the old object set;
3. read the tree back (sinks/reader.py), rewrite through
   ``write_batch(batch_id=cid)``;
4. advance the marker to phase=published;
5. delete every non-cid-prefixed object, prune empty dirs, clear the
   marker.

A crash re-enters at the right phase via
:func:`recover_sink_compaction`: in ``staging`` the old set is intact
(step 2 makes the rewrite idempotent); in ``published`` the new
objects are all present and only deletes remain (delete is
missing-tolerant). Readers between steps 4 and 5 can see old+new
double rows — the offline contract, not a correctness hole.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rigatoni_spark.config import S3SinkConfig
from rigatoni_spark.sinks.key_gen import file_extension
from rigatoni_spark.sinks.reader import read_sink_output
from rigatoni_spark.sinks.writers import write_batch

_MARKER = "_sink_compaction"
_LEASE = "_rigatoni_pipeline.lease"


# Default owner token for bare write/clear calls: process-scoped, so
# callers that don't manage their own token keep the old
# one-pipeline-per-process behavior. Pipelines pass a per-instance
# token — two Pipelines in ONE driver process must not void each
# other's lease any more than two processes may.
_PROCESS_TOKEN = uuid.uuid4().hex


def _read_lease(base: str) -> dict | None:
    path = os.path.join(base, _LEASE)
    try:
        with open(path) as fh:
            lease = json.load(fh)
        return lease if isinstance(lease, dict) else None
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def write_sink_lease(base_uri: str, token: str | None = None) -> str | None:
    """Drop a liveness lease under the sink root (called by
    Pipeline.start). The lease carries the owning driver's pid (so
    compaction can distinguish 'pipeline running' from 'pipeline
    crashed and left a stale file') plus an owner token. Refuses when
    a DIFFERENT live owner already holds the lease — whether another
    process or another Pipeline instance in THIS process — because
    two pipelines sharing a sink root would silently void each
    other's stopped-pipeline compaction contract (the second stop()
    would clear the first's lease). Filesystem sinks only (the only
    kind wired here); returns the lease path or None."""
    base = base_uri.replace("file:", "")
    if not base.startswith("/"):
        return None
    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, _LEASE)
    token = token if token is not None else _PROCESS_TOKEN
    holder = _lease_holder_alive(base)
    if holder is not None:
        lease = _read_lease(base) or {}
        held_token = lease.get("token")
        same_owner = holder == os.getpid() and (
            held_token is None or held_token == token
        )
        if not same_owner:
            raise RuntimeError(
                f"another pipeline (driver pid {holder}) already holds "
                f"the lease on this sink root ({base_uri}); two "
                "pipelines must not share a sink root (if no pipeline "
                "is actually running — e.g. the pid was reused — "
                f"delete {path} and retry)"
            )
    _atomic_write(path, json.dumps({"pid": os.getpid(), "token": token}))
    return path


def clear_sink_lease(base_uri: str, token: str | None = None) -> None:
    """Remove the lease (Pipeline.stop / await_backfill) — but only
    when it carries this owner's pid+token, so a foreign pipeline's
    live lease is never cleared, from another driver OR from another
    Pipeline in the same process."""
    base = base_uri.replace("file:", "")
    lease = _read_lease(base)
    if lease is None:
        return
    token = token if token is not None else _PROCESS_TOKEN
    pid = lease.get("pid")
    held_token = lease.get("token")
    if pid is not None and pid != os.getpid():
        return
    if held_token is not None and held_token != token:
        return
    try:
        os.remove(os.path.join(base, _LEASE))
    except FileNotFoundError:
        pass


def _lease_holder_alive(base: str) -> int | None:
    """pid of a LIVE lease holder, else None (no lease / stale)."""
    path = os.path.join(base, _LEASE)
    try:
        with open(path) as fh:
            pid = int(json.load(fh)["pid"])
    except (
        FileNotFoundError,
        ValueError,
        KeyError,
        TypeError,  # e.g. {"pid": null} — malformed means stale
        json.JSONDecodeError,
    ):
        return None
    try:
        os.kill(pid, 0)  # signal 0: existence probe, nothing delivered
    except ProcessLookupError:
        return None  # stale lease from a crashed driver
    except PermissionError:
        return pid  # alive, owned by another user
    return pid


def _base(cfg: S3SinkConfig) -> str:
    base = cfg.base_uri.replace("file:", "")
    if not base.startswith("/"):
        raise NotImplementedError(
            "sink compaction is wired for filesystem destinations (the "
            "same constraint as write_batch); S3 needs hadoop-aws"
        )
    return base.rstrip("/")


def _object_files(base: str, ext: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(
            os.path.join(base, "**", f"*{ext}"), recursive=True
        )
        if f"{os.sep}_staging_" not in f
    )


def _typed_envelope(df: DataFrame) -> DataFrame:
    """Canonical typed projection of read-back rows (text formats
    surface strings) — what write_batch's key generation needs."""
    return df.select(
        F.col("operation").cast("string").alias("operation"),
        F.col("database").cast("string").alias("database"),
        F.col("collection").cast("string").alias("collection"),
        F.col("cluster_time").cast("timestamp").alias("cluster_time"),
        F.col("document_key").cast("string").alias("document_key"),
        F.col("full_document").cast("string").alias("full_document"),
        F.col("resume_token").cast("string").alias("resume_token"),
    )


def compact_sink_output(
    spark: SparkSession, cfg: S3SinkConfig, compaction_id: int
) -> dict:
    """Compact every object under ``cfg.base_uri`` into one object per
    layout group. ``compaction_id`` becomes the new keys' batch-id stem
    prefix — it must not collide with any existing key (enforced) and
    must differ between successive compactions (the previous pass's
    objects are 'old' to the next one).

    Returns ``{"removed": n_old_objects, "keys": new_keys}``.

    The run-with-the-pipeline-STOPPED contract is ENFORCED, not just
    documented (mirrors ``AdmissionStream.compact``'s is_running()
    check): Pipeline.start drops a pid lease under the sink root and
    this refuses while the holder is alive — a concurrent micro-batch
    flushing between the rewrite read and the delete pass would write
    keys that are not cid-prefixed and lose them silently. As a second
    belt, the object set is snapshotted into the marker at staging
    time and the delete pass only ever removes files from that
    snapshot, so even an unleased racing writer cannot lose data."""
    base = _base(cfg)
    ext = file_extension(cfg.format, cfg.compression)
    pid = _lease_holder_alive(base)
    if pid is not None:
        raise RuntimeError(
            f"a pipeline (driver pid {pid}) holds the lease on this "
            "sink; stop it before compacting (if no pipeline is "
            f"actually running — e.g. the pid was reused — delete "
            f"{os.path.join(base, _LEASE)} and retry)"
        )
    marker = os.path.join(base, _MARKER)
    if os.path.exists(marker):
        raise RuntimeError(
            "a sink compaction is pending; run recover_sink_compaction"
        )
    prefix = f"{compaction_id:012d}-"
    files = _object_files(base, ext)
    if any(os.path.basename(f).startswith(prefix) for f in files):
        raise ValueError(
            f"compaction_id {compaction_id} collides with existing keys"
        )
    if len(files) < 2:
        return {"removed": 0, "keys": []}
    _atomic_write(
        marker, json.dumps({"cid": compaction_id, "phase": "staging"})
    )
    return _run(spark, cfg, compaction_id)


def recover_sink_compaction(spark: SparkSession, cfg: S3SinkConfig) -> dict:
    """Finish a crashed compaction (no-op without a pending marker)."""
    base = _base(cfg)
    marker = os.path.join(base, _MARKER)
    if not os.path.exists(marker):
        return {"removed": 0, "keys": []}
    with open(marker) as fh:
        state = json.load(fh)
    if state["phase"] == "staging":
        return _run(spark, cfg, state["cid"])
    return _finish(cfg, state["cid"])


def _run(spark: SparkSession, cfg: S3SinkConfig, cid: int) -> dict:
    base = _base(cfg)
    ext = file_extension(cfg.format, cfg.compression)
    prefix = f"{cid:012d}-"
    # phase-1 cleanup: drop partial staging dirs and partial new keys,
    # restoring the tree to exactly the old object set
    for d in glob.glob(os.path.join(base, "**", "_staging_*"), recursive=True):
        shutil.rmtree(d, ignore_errors=True)
    for f in _object_files(base, ext):
        if os.path.basename(f).startswith(prefix):
            os.remove(f)
    # snapshot the old object set: _finish deletes ONLY these files, so
    # a batch flushed by a racing writer after this point is never
    # DELETED. (The rewrite's lazy read globs at execution time, so a
    # file landing between this listing and the read could be rewritten
    # AND kept — duplicated rows, not lost ones. The lease is the
    # primary guard; this snapshot is the no-data-loss backstop.)
    snapshot = [os.path.relpath(f, base) for f in _object_files(base, ext)]
    typed = _typed_envelope(read_sink_output(spark, cfg))
    keys = write_batch(typed, cfg, batch_id=cid)
    marker = os.path.join(base, _MARKER)
    _atomic_write(
        marker,
        json.dumps({"cid": cid, "phase": "published", "files": snapshot}),
    )
    out = _finish(cfg, cid)
    out["keys"] = keys
    return out


def _finish(cfg: S3SinkConfig, cid: int) -> dict:
    base = _base(cfg)
    ext = file_extension(cfg.format, cfg.compression)
    prefix = f"{cid:012d}-"
    marker = os.path.join(base, _MARKER)
    snapshot: set[str] | None = None
    try:
        with open(marker) as fh:
            files = json.load(fh).get("files")
        if files is not None:
            snapshot = set(files)
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    removed = 0
    for f in _object_files(base, ext):
        rel = os.path.relpath(f, base)
        in_snapshot = snapshot is None or rel in snapshot
        if not os.path.basename(f).startswith(prefix) and in_snapshot:
            try:
                os.remove(f)
                removed += 1
            except FileNotFoundError:
                pass
    _prune_empty_dirs(base)
    os.remove(os.path.join(base, _MARKER))
    return {"removed": removed, "keys": []}


def _prune_empty_dirs(base: str) -> None:
    for d in sorted(
        (p for p, _, _ in os.walk(base)), key=len, reverse=True
    ):
        if d != base:
            try:
                os.rmdir(d)  # only succeeds when empty
            except OSError:
                pass


def _atomic_write(path: str, content: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(content)
    os.replace(tmp, path)
