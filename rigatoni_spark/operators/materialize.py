"""CDC materialization: apply the change log to produce the current
collection snapshot (the consumer-side complement of the reference's
replication pipeline — what a reader of its S3 output ultimately
reconstructs; event semantics per event.rs:88-144).

Semantics (update_lookup mode, the reference's UpdateLookup config
stream.rs:477-481): the latest event per (collection, document_key)
wins; if it is a delete the key is absent from the snapshot; otherwise
``full_document`` is the current state.

Scale design
------------
Batch: ONE aggregation — ``groupBy(key).agg(max_by(payload, version))``
— instead of a window ``row_number``: partial aggregation collapses each
map partition to one row per key before the exchange, so the shuffle
carries |keys| rows, not |events|. Keys are high-cardinality
(collection, document_key) — uniform hash partitioning, no skew.

Streaming: ``applyInPandasWithState`` keeps one small struct per key
(version, operation, document) and emits a snapshot row only when the
batch changed that key — the canonical custom-stateful-operator shape.
State is per-key-bounded; at 100 TB of *log*, state is proportional to
the *live key set*, and RocksDB state store (cluster config
``spark.sql.streaming.stateStore.providerClass``) spills it off-heap.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SNAPSHOT_COLUMNS = [
    "collection",
    "document_key",
    "operation",
    "full_document",
    "version",
]


def materialize(ce: DataFrame) -> DataFrame:
    """Current snapshot of every live document (batch log-compaction).

    ``version`` is the winning event's resume token (monotone stream
    position, event.rs:306-310) — the snapshot's exactly-once marker:
    re-applying any suffix of the log is idempotent because max_by picks
    the same winner.
    """
    version = F.col("resume_token").cast("bigint")
    winner = F.max_by(
        F.struct(
            F.col("operation").alias("operation"),
            F.col("full_document").alias("full_document"),
        ),
        version,
    )
    return (
        ce.groupBy("collection", "document_key")
        .agg(winner.alias("w"), F.max(version).alias("version"))
        .filter(F.col("w.operation") != "delete")
        .select(
            "collection",
            "document_key",
            F.col("w.operation").alias("operation"),
            F.col("w.full_document").alias("full_document"),
            "version",
        )
        .orderBy("collection", "document_key")
    )


def scd2_history(ce: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension history from the change log —
    the full-audit complement of :func:`materialize`'s latest-snapshot
    compaction (a consumer of the reference's S3 change-log output
    building a warehouse dimension table; event semantics per
    event.rs:88-144).

    One row per surviving document VERSION: ``valid_from`` is the
    event's resume token (monotone stream position,
    event.rs:306-310), ``valid_to`` the next event on the same key
    (NULL while current), ``is_current`` = 1 on the open row. Delete
    events emit no row of their own but close their predecessor's
    interval — a deleted key has no current row, matching the
    snapshot's absence semantics.

    Scale design: a single ``lead`` window over
    ``(collection, document_key)`` ordered by version — one
    hash-partition exchange plus an in-partition sort, no join
    anywhere. Keys are high-cardinality and uniform, and per-key
    history is short (the live version chain), so partitions stay
    balanced at 100 TB of log.
    """
    version = F.col("resume_token").cast("bigint")
    w = (
        Window.partitionBy("collection", "document_key")
        .orderBy(F.col("valid_from").asc())
    )
    return (
        ce.select(
            "collection",
            "document_key",
            "operation",
            "full_document",
            version.alias("valid_from"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .filter(F.col("operation") != "delete")
        .withColumn(
            "is_current", F.col("valid_to").isNull().cast("int")
        )
        .orderBy("collection", "document_key", "valid_from")
    )


SCD2_ORACLE_BODY = """
ordered AS (
  SELECT collection, document_key, operation, full_document,
         CAST(resume_token AS BIGINT) AS valid_from,
         LEAD(CAST(resume_token AS BIGINT)) OVER (
           PARTITION BY collection, document_key
           ORDER BY CAST(resume_token AS BIGINT)) AS valid_to
  FROM change_events)
SELECT collection, document_key, operation, full_document,
       valid_from, valid_to,
       CAST(valid_to IS NULL AS INT) AS is_current
FROM ordered WHERE operation <> 'delete'
ORDER BY collection, document_key, valid_from
"""


MATERIALIZE_ORACLE_BODY = """
ranked AS (
  SELECT collection, document_key, operation, full_document,
         CAST(resume_token AS BIGINT) AS version,
         ROW_NUMBER() OVER (
           PARTITION BY collection, document_key
           ORDER BY CAST(resume_token AS BIGINT) DESC) AS rn
  FROM change_events)
SELECT collection, document_key, operation, full_document, version
FROM ranked WHERE rn = 1 AND operation <> 'delete'
ORDER BY collection, document_key
"""


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("full_document", T.StringType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType()),
        T.StructField("document_key", T.StringType()),
        T.StructField("operation", T.StringType()),
        T.StructField("full_document", T.StringType()),
        T.StructField("version", T.LongType()),
    ]
)


def materialize_stream(ce: DataFrame) -> DataFrame:
    """Streaming materialization: emits one snapshot row per key per
    micro-batch in which that key changed (deletes emitted as tombstone
    rows with operation='delete' so downstream sinks can retract).

    Genuinely non-SQL-expressible as a stream (covered by the e2e test
    rather than a DuckDB oracle — the batch :func:`materialize` is the
    oracle-checked twin of the same semantics).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            version, operation, full_document = state.get
        else:
            version, operation, full_document = -1, None, None
        changed = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            # vectorized winner pick: only the batch's max version can
            # beat the state (idempotent replay: old versions no-op)
            i = pdf["__version"].idxmax()
            v = int(pdf["__version"][i])
            if v > version:
                version = v
                operation = pdf["operation"][i]
                full_document = pdf["full_document"][i]
                changed = True
        if changed:
            state.update((version, operation, full_document))
            yield pd.DataFrame(
                {
                    "collection": [key[0]],
                    "document_key": [key[1]],
                    "operation": [operation],
                    "full_document": [
                        None if operation == "delete" else full_document
                    ],
                    "version": [version],
                }
            )

    prepared = ce.withColumn("__version", F.col("resume_token").cast("bigint"))
    return prepared.groupBy("collection", "document_key").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SCD2_OUT_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType()),
        T.StructField("document_key", T.StringType()),
        T.StructField("operation", T.StringType()),
        T.StructField("full_document", T.StringType(), True),
        T.StructField("valid_from", T.LongType()),
        T.StructField("valid_to", T.LongType(), True),
        T.StructField("is_current", T.IntegerType()),
    ]
)

_SCD2_STATE_SCHEMA = T.StructType(
    [
        # the OPEN (current) version of this key, None after a delete
        T.StructField("open_op", T.StringType(), True),
        T.StructField("open_doc", T.StringType(), True),
        T.StructField("open_from", T.LongType(), True),
        # position of the last APPLIED event — the monotonic-arrival
        # canary (same precondition and failure mode as
        # as_change_events_stateful): an older arrival would close an
        # interval at the wrong boundary AND poison every later row
        T.StructField("last_from", T.LongType(), True),
    ]
)

# reorder mode adds the bounded per-key hold-back buffer: events inside
# the watermark delay wait here (columnar arrays, one list element per
# held event) until the watermark proves no earlier event can arrive
_SCD2_REORDER_STATE_SCHEMA = T.StructType(
    list(_SCD2_STATE_SCHEMA)
    + [
        T.StructField("buf_ops", T.ArrayType(T.StringType(), True), True),
        T.StructField("buf_docs", T.ArrayType(T.StringType(), True), True),
        T.StructField("buf_vers", T.ArrayType(T.LongType(), True), True),
        T.StructField("buf_ts", T.ArrayType(T.LongType(), True), True),
    ]
)


def _apply_scd2(key, events, open_op, open_doc, open_from, last_from):
    """Apply (op, doc, version) triples IN ORDER to a key's
    open-interval state: each event closes the open version (emitting
    the finished interval row) and becomes the new open version
    (deletes close without replacing). Shared by the strict-monotonic
    fold and the reorder fold so both produce identical histories.
    Returns (closed_rows, open_op, open_doc, open_from, last_from)."""
    rows: list[tuple] = []
    for op, doc, vf in events:
        vf = int(vf)
        if open_from is not None:
            rows.append(
                (key[0], key[1], open_op, open_doc, open_from, vf, 0)
            )
        if op == "delete":
            open_op = open_doc = open_from = None
        else:
            open_op, open_doc, open_from = op, doc, vf
        last_from = vf
    return rows, open_op, open_doc, open_from, last_from


def _scd2_emit(rows: list[tuple]) -> pd.DataFrame:
    """Rows -> Arrow-safe pandas frame: nullable ints must not decay to
    float64 on the Arrow boundary (resume positions are exact longs)."""
    out = pd.DataFrame(
        rows,
        columns=[
            "collection",
            "document_key",
            "operation",
            "full_document",
            "valid_from",
            "valid_to",
            "is_current",
        ],
    )
    out["valid_from"] = out["valid_from"].astype("Int64")
    out["valid_to"] = out["valid_to"].astype("Int64")
    out["is_current"] = out["is_current"].astype("int32")
    return out


def _require_monotonic(key, first: int, last_from: int | None) -> None:
    """The monotonic-arrival canary, extracted so its MESSAGE is a
    pinnable unit (tests/test_materialize.py asserts the text directly
    — the streaming engine wraps in-fold exceptions a variable number
    of layers deep, so a stream-level test can only pin that the query
    fails loudly, not which message survived the wrapping)."""
    if last_from is not None and first <= last_from:
        raise ValueError(
            f"out-of-order arrival for key {key}: event at "
            f"position {first} is not after the state's last "
            f"applied position {last_from} — per-key monotonic "
            "arrival is a hard precondition of scd2_stream; "
            "replay from the checkpoint in order, use "
            "scd2_stream(reorder_within=...) for boundedly "
            "out-of-order feeds, or the batch scd2_history for "
            "unordered logs"
        )


def scd2_stream(
    ce: DataFrame, reorder_within: str | None = None
) -> DataFrame:
    """Streaming SCD2: maintain the type-2 interval history of
    :func:`scd2_history` on a LIVE change stream — per-key state holds
    the one OPEN version; each arriving event CLOSES it (emitting the
    finished interval, append mode) and becomes the new open version
    (deletes close without replacing, so a deleted key has no current
    row, exactly the batch semantics).

    ``reorder_within`` (e.g. ``"30 minutes"``) opts into the BOUNDED
    OUT-OF-ORDER mode for feeds that cannot guarantee per-key monotonic
    arrival (multi-partition Kafka, file replays): see
    :func:`_scd2_stream_reordered`. Default None keeps the strict
    monotonic contract below.

    Emission contract: a version's interval row is emitted CLOSED the
    moment its successor arrives — exact and final. The key's latest
    version is additionally emitted as a PROVISIONAL current row
    (``is_current`` = 1, ``valid_to`` NULL) at the end of each
    micro-batch it survives; if a later batch closes it, the closed
    emission supersedes the provisional one. Append-mode sinks cannot
    retract, so downstream reads winnow per (key, valid_from) —
    :func:`scd2_stream_winnow` is that fold (closed row wins over its
    provisional twin); the drained winnowed table equals the batch
    :func:`scd2_history` row-for-row, which is what the catalog row
    pins against the SAME oracle.

    Same HARD PRECONDITION as ``as_change_events_stateful``: per-key
    monotonic arrival across micro-batches (file-feed and Kafka
    per-partition order both satisfy it); an out-of-order arrival
    fails the micro-batch loudly rather than corrupting intervals.

    Scale: state is one small struct per LIVE key (independent of log
    length; RocksDB spills off-heap); one hash exchange per
    micro-batch; per-key per-batch fold is a short python loop over
    that key's batch rows inside the Arrow-transferred group."""
    if reorder_within is not None:
        return _scd2_stream_reordered(ce, reorder_within)

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            open_op, open_doc, open_from, last_from = state.get
        else:
            open_op = open_doc = open_from = last_from = None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                .sort_values("__version")
                .reset_index(drop=True)
            )
            first = int(pdf["__version"].iloc[0])
            _require_monotonic(key, first, last_from)
            rows, open_op, open_doc, open_from, last_from = _apply_scd2(
                key,
                zip(
                    pdf["operation"], pdf["full_document"], pdf["__version"]
                ),
                open_op,
                open_doc,
                open_from,
                last_from,
            )
            if open_from is not None:
                # provisional current row (superseded if closed later)
                rows.append(
                    (key[0], key[1], open_op, open_doc, open_from, None, 1)
                )
            if rows:
                yield _scd2_emit(rows)
        state.update((open_op, open_doc, open_from, last_from))

    prepared = ce.withColumn(
        "__version", F.col("resume_token").cast("bigint")
    )
    return prepared.groupBy("collection", "document_key").applyInPandasWithState(
        fold,
        outputStructType=_SCD2_OUT_SCHEMA,
        stateStructType=_SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _scd2_stream_reordered(ce: DataFrame, reorder_within: str) -> DataFrame:
    """scd2_stream's BOUNDED OUT-OF-ORDER mode (round-11 ask #4): the
    Flink bounded-out-of-orderness posture on Spark state. Events wait
    in a per-key hold-back buffer until the event-time watermark
    (``withWatermark(cluster_time, reorder_within)``) proves no earlier
    event can still be ACCEPTED; released events then apply through the
    same open-interval fold in resume-position order, so every emitted
    closed row is final — append mode never has to retract.

    Release rule: a buffered event applies once its event time is
    strictly below the current watermark. Safety rests on resume
    position and event time being co-monotone in the feed (true of an
    oplog: positions are assigned in commit-time order); the
    monotonic-arrival canary still guards every release, so a feed
    violating that alignment fails loudly instead of corrupting.

    Standard watermark trade, stated plainly: an event arriving later
    than ``reorder_within`` behind the max seen event time is LATE and
    the engine drops it before the fold (data loss, exactly Spark's
    windowed-aggregation contract) — size the bound to the feed's real
    disorder. And as with any event-time stream, an idle feed stalls
    the watermark; the tail of a bounded replay only flushes when a
    later event (or an explicit heartbeat/sentinel event, the Kafka
    idle-partition remedy) advances it past the buffered timestamps —
    per-key event-time TIMEOUTS re-invoke the fold for keys whose
    buffers became releasable without receiving new rows.

    Scale: state grows by at most the events a key receives within one
    ``reorder_within`` window (the buffer drains as the watermark
    advances) on top of the one open-version struct; the exchange and
    Arrow-group shapes are identical to the strict mode."""

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (
                open_op,
                open_doc,
                open_from,
                last_from,
                buf_ops,
                buf_docs,
                buf_vers,
                buf_ts,
            ) = state.get
            buf = list(
                zip(buf_ops or (), buf_docs or (), buf_vers or (), buf_ts or ())
            )
        else:
            open_op = open_doc = open_from = last_from = None
            buf = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        for pdf in chunks:
            buf.extend(
                zip(
                    pdf["operation"],
                    (
                        None if pd.isna(d) else d
                        for d in pdf["full_document"]
                    ),
                    (int(v) for v in pdf["__version"]),
                    (int(t) for t in pdf["__ts_ms"]),
                )
            )
        wm = state.getCurrentWatermarkMs()
        buf.sort(key=lambda r: r[2])
        if wm > 0:
            release = [r for r in buf if r[3] < wm]
            hold = [r for r in buf if r[3] >= wm]
        else:
            release, hold = [], buf
        rows: list[tuple] = []
        if release:
            # the canary survives in this mode: releases must still be
            # monotone vs the applied prefix — a violation means event
            # time and resume position disagree beyond the bound
            _require_monotonic(key, release[0][2], last_from)
            rows, open_op, open_doc, open_from, last_from = _apply_scd2(
                key,
                ((op, doc, vf) for op, doc, vf, _ts in release),
                open_op,
                open_doc,
                open_from,
                last_from,
            )
        if open_from is not None and (chunks or release):
            # provisional current row (superseded if closed later)
            rows.append(
                (key[0], key[1], open_op, open_doc, open_from, None, 1)
            )
        if rows:
            yield _scd2_emit(rows)
        state.update(
            (
                open_op,
                open_doc,
                open_from,
                last_from,
                [r[0] for r in hold],
                [r[1] for r in hold],
                [r[2] for r in hold],
                [r[3] for r in hold],
            )
        )
        if hold:
            # wake this key the moment its earliest held event becomes
            # releasable, even if it never receives another row; held
            # timestamps are >= wm by construction, so the target is
            # always ahead of the current watermark (a setTimeout
            # requirement)
            state.setTimeoutTimestamp(
                max(wm + 1, min(r[3] for r in hold) + 1)
            )

    prepared = (
        ce.withWatermark("cluster_time", reorder_within)
        .withColumn("__version", F.col("resume_token").cast("bigint"))
        .withColumn("__ts_ms", F.unix_millis(F.col("cluster_time")))
    )
    return prepared.groupBy("collection", "document_key").applyInPandasWithState(
        fold,
        outputStructType=_SCD2_OUT_SCHEMA,
        stateStructType=_SCD2_REORDER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def scd2_stream_winnow(drained: DataFrame) -> DataFrame:
    """Collapse :func:`scd2_stream`'s append-mode emissions to the
    final history: per (key, valid_from) a version appears at most
    twice — once provisional (open), once closed — and the closed row
    wins. ``max(valid_to)`` ignores the provisional NULL;
    ``min(is_current)`` prefers the closed flag; operation/document are
    identical across the pair (same version), so any deterministic
    pick works. One |history|-sized aggregation, batch-side after the
    drain (or per publication window in production)."""
    return (
        drained.groupBy("collection", "document_key", "valid_from")
        .agg(
            F.max("operation").alias("operation"),
            F.max("full_document").alias("full_document"),
            F.max("valid_to").alias("valid_to"),
            F.min("is_current").alias("is_current"),
        )
        .select(
            "collection",
            "document_key",
            "operation",
            "full_document",
            "valid_from",
            "valid_to",
            "is_current",
        )
        .orderBy("collection", "document_key", "valid_from")
    )
