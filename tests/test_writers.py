"""Sink round-trips: write_batch -> re-read -> compare
(mirrors s3_integration_test.rs:74-333 write/read-back coverage)."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from rigatoni_spark.config import (
    CompressionCodec,
    PartitionStrategy,
    S3SinkConfig,
    SerializationFormat,
)
from rigatoni_spark.schema import ENVELOPE_COLUMNS
from rigatoni_spark.sinks.writers import write_batch


class TestWriteBatch:
    def test_jsonl_gzip_roundtrip(self, change_events, tmp_path):
        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.JSON,
            compression=CompressionCodec.GZIP,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )
        keys = write_batch(change_events, cfg, batch_id=1)
        assert len(keys) == 4  # one object per collection
        assert all(k.endswith(".jsonl.gz") for k in keys)
        rows = []
        for k in keys:
            with gzip.open(tmp_path / k, "rt") as fh:
                rows.extend(json.loads(line) for line in fh)
        assert len(rows) == change_events.count()
        assert sorted(rows[0].keys()) == sorted(ENVELOPE_COLUMNS)

    def test_parquet_roundtrip(self, spark, change_events, tmp_path):
        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.PARQUET,
            compression=CompressionCodec.ZSTD,
            partition_strategy=PartitionStrategy.DATE_PARTITIONED,
        )
        keys = write_batch(change_events, cfg, batch_id=2)
        back = spark.read.parquet(*[str(tmp_path / k) for k in keys])
        assert back.count() == change_events.count()
        assert sorted(back.columns) == sorted(ENVELOPE_COLUMNS)

    def test_csv_header(self, change_events, tmp_path):
        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.CSV,
            partition_strategy=PartitionStrategy.FLAT,
        )
        keys = write_batch(change_events, cfg)
        header = open(tmp_path / keys[0]).readline().strip().split(",")
        assert sorted(header) == sorted(ENVELOPE_COLUMNS)

    def test_hive_layout_prunable(self, spark, change_events, tmp_path):
        """HIVE layout must be readable as a partitioned dataset with
        partition pruning — the point of K9's Hive strategy."""
        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.PARQUET,
            partition_strategy=PartitionStrategy.HIVE_PARTITIONED,
        )
        keys = write_batch(change_events, cfg, batch_id=3)
        assert keys[0].startswith("collection=")
        back = spark.read.option("basePath", str(tmp_path)).parquet(str(tmp_path))
        pruned = back.filter("collection = 'c0' AND hour = 7")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert pruned.count() > 0
        # partition filters appear in the scan, not as post-filters
        assert "PartitionFilters: [" in plan

    def test_deterministic_keys_on_replay(self, change_events, tmp_path):
        """Replayed batch -> identical keys (idempotent at-least-once,
        SURVEY.md §7.3 — stronger than the reference's wall-clock keys)."""
        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.JSON,
            partition_strategy=PartitionStrategy.DATE_HOUR_PARTITIONED,
        )
        k1 = write_batch(change_events, cfg, batch_id=9)
        k2 = write_batch(change_events, cfg, batch_id=9)
        assert k1 == k2

    def test_escaped_collection_names_keep_deterministic_keys(
        self, change_events, tmp_path
    ):
        """Collections with chars Spark Hive-escapes in partition dirs
        (':', '=', '%') must still hit the group-times lookup: the
        staged dir says e.g. _pc=ns%3Ausers but the key + replay stem
        must carry the RAW name and the deterministic group-time stem,
        never a wall-clock fallback."""
        weird = change_events.withColumn(
            "collection", F.concat(F.lit("ns:"), F.col("collection"))
        ).cache()
        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.JSON,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )
        try:
            k1 = write_batch(weird, cfg, batch_id=4)
            k2 = write_batch(weird, cfg, batch_id=4)
        finally:
            weird.unpersist()
        assert k1 == k2  # wall-clock fallback would differ between runs
        assert k1 and all("ns:" in k for k in k1)
        assert all("%3A" not in k and "%3a" not in k for k in k1)

    def test_avro_write(self, spark, change_events, tmp_path):
        """K6: AVRO is two-tier like the reference's `avro` cargo
        feature (rigatoni-destinations/src/lib.rs:28-37): the spark-avro
        jar when present, else the pure-Python spec codec
        (sinks/avro_codec.py) — a REAL keyed Avro write either way."""
        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.AVRO,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )
        keys = write_batch(change_events, cfg, batch_id=1)
        assert len(keys) == 4 and all(k.endswith(".avro") for k in keys)
        try:
            back = spark.read.format("avro").load(
                [str(tmp_path / k) for k in keys]
            )
            n = back.count()
        except Exception:
            # jar absent: verify with the codec's own spec reader
            from rigatoni_spark.sinks.avro_codec import read_avro

            rows = []
            for k in keys:
                schema, part = read_avro(str(tmp_path / k))
                assert schema["type"] == "record"
                rows.extend(part)
            n = len(rows)
            got = sorted(
                (r["collection"], r["resume_token"]) for r in rows
            )
            want = sorted(
                (r["collection"], r["resume_token"])
                for r in change_events.select(
                    "collection", "resume_token"
                ).collect()
            )
            assert got == want
        assert n == change_events.count()

    def test_avro_gzip_and_zstd_gate(self, change_events, tmp_path):
        """AVRO+GZIP works in both tiers (fallback gzip-wraps the
        container, mtime pinned for replay-identical bytes); AVRO+ZSTD
        without the jar raises an actionable gate."""
        import gzip as _gzip

        from rigatoni_spark.sinks.avro_codec import read_avro
        from rigatoni_spark.sinks.writers import FormatNotAvailable

        gz_cfg = S3SinkConfig(
            bucket=str(tmp_path / "gz"),
            format=SerializationFormat.AVRO,
            compression=CompressionCodec.GZIP,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )
        keys = write_batch(change_events, gz_cfg, batch_id=1)
        assert keys and all(k.endswith(".avro.gz") for k in keys)
        raw = _gzip.decompress(
            open(str(tmp_path / "gz" / keys[0]), "rb").read()
        )
        tmp = tmp_path / "probe.avro"
        tmp.write_bytes(raw)
        _, rows = read_avro(str(tmp))
        assert rows and set(rows[0]) >= {"collection", "operation"}

        zstd_cfg = S3SinkConfig(
            bucket=str(tmp_path / "zs"),
            format=SerializationFormat.AVRO,
            compression=CompressionCodec.ZSTD,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )
        # gated in BOTH tiers: no zstd wrap exists for the .avro.zst
        # key layout, so refusing beats classpath-dependent bytes
        with pytest.raises(FormatNotAvailable, match="AVRO\\+ZSTD"):
            write_batch(change_events, zstd_cfg, batch_id=1)

    def test_empty_batch(self, change_events, tmp_path):
        cfg = S3SinkConfig(bucket=str(tmp_path))
        empty = change_events.filter("operation = 'nope'")
        assert write_batch(empty, cfg) == []

    def test_concurrent_staging_scopes_isolated(self, change_events, tmp_path):
        """Two concurrent callers sharing one base_uri and the SAME
        batch_id (per-collection streaming queries each start their
        batch_id sequence at 0) must not collide in staging: query A's
        empty-batch rmtree runs while query B's staged files are still
        waiting on its deferred probe — B's files must survive and land
        on final keys."""
        import threading

        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.JSON,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )
        sample = change_events.limit(100)
        probe = (
            sample.groupBy("collection")
            .agg(F.max("cluster_time").alias("t"))
            .collect()
        )
        group_times = {r["collection"]: r["t"] for r in probe}

        b_staged = threading.Event()
        a_done = threading.Event()
        results: dict = {}

        def writer_b():
            def probe_b():
                # B has finished staging when its deferred probe runs;
                # hold here so A's rmtree executes in the window
                b_staged.set()
                if not a_done.wait(60):
                    raise TimeoutError("writer A never finished")
                return group_times

            results["b"] = write_batch(
                sample, cfg, batch_id=0,
                deferred_probe=probe_b, staging_scope="db_c1",
            )

        tb = threading.Thread(target=writer_b)
        tb.start()
        try:
            assert b_staged.wait(60)
            # query A, same batch_id, empty batch -> staging rmtree
            assert (
                write_batch(
                    sample, cfg, batch_id=0,
                    deferred_probe=dict, staging_scope="db_c0",
                )
                == []
            )
        finally:
            a_done.set()
            tb.join(120)
        keys = results["b"]
        assert len(keys) == len(group_times)
        for k in keys:
            assert os.path.isfile(tmp_path / k), k


class TestReadBack:
    """Consumer loop closure: every layout round-trips through
    read_sink_output with no path parsing."""

    def test_avro_roundtrip_via_sink_reader(self, spark, change_events, tmp_path):
        """K6 loop closure: Avro objects read back through the same
        consumer API as every other format — spark-avro when present,
        the pure-Python codec tier otherwise (identical DataFrame out)."""
        from rigatoni_spark.sinks.reader import read_sink_output

        for comp in (CompressionCodec.NONE, CompressionCodec.GZIP):
            cfg = S3SinkConfig(
                bucket=str(tmp_path / comp.name.lower()),
                format=SerializationFormat.AVRO,
                compression=comp,
                partition_strategy=PartitionStrategy.COLLECTION_BASED,
            )
            sample = change_events.limit(300)
            assert write_batch(sample, cfg, batch_id=1)
            back = read_sink_output(spark, cfg)
            assert back.count() == sample.count()
            got = sorted(
                (r["collection"], r["resume_token"], r["cluster_time"])
                for r in back.select(
                    "collection", "resume_token", "cluster_time"
                ).collect()
            )
            want = sorted(
                (r["collection"], r["resume_token"], r["cluster_time"])
                for r in sample.select(
                    "collection", "resume_token", "cluster_time"
                ).collect()
            )
            assert got == want, comp

    def test_avro_roundtrip_with_file_uri(self, spark, change_events, tmp_path):
        """Regression: a file:-prefixed destination must round-trip
        through the jar-less Avro read tier — the fallback's glob once
        ran on the raw URI, matched nothing, and returned an empty
        DataFrame with no error (silent data loss on read-back)."""
        from rigatoni_spark.sinks.reader import read_sink_output

        cfg = S3SinkConfig(
            bucket=f"file:{tmp_path}/furi",
            format=SerializationFormat.AVRO,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )
        sample = change_events.limit(100)
        assert write_batch(sample, cfg, batch_id=1)
        assert read_sink_output(spark, cfg).count() == sample.count()

    def test_jar_absent_gate_is_specific(self):
        """The shared jar-vs-fallback gate fires only on the jar-absent
        signatures — real Avro errors (which also contain 'avro') must
        surface instead of silently switching tiers."""
        from rigatoni_spark.sinks.avro_codec import is_jar_absent_error

        assert is_jar_absent_error(
            Exception(
                "Failed to find data source: avro. Avro is built-in but "
                "external data source module since Spark 2.4"
            )
        )
        assert is_jar_absent_error(
            Exception("[DATA_SOURCE_NOT_FOUND] Failed to find the data source: avro")
        )
        assert is_jar_absent_error(
            Exception("java.lang.ClassNotFoundException: avro.DefaultSource")
        )
        assert not is_jar_absent_error(Exception("Not an Avro data file"))
        assert not is_jar_absent_error(
            Exception("Found recursive reference in Avro schema")
        )
        assert not is_jar_absent_error(Exception("unsupported codec snappy"))

    def test_avro_fallback_rejects_mixed_schemas(self, spark, tmp_path):
        """Objects under one base_uri written with differing field sets
        (mixed writer versions) must raise a descriptive mismatch error
        in the python read tier — never silently misalign columns
        against whichever file's schema was read last."""
        import pyarrow as pa
        import pytest

        from rigatoni_spark.sinks.avro_codec import write_avro
        from rigatoni_spark.sinks.reader import _read_avro_fallback

        base = tmp_path / "mixed"
        base.mkdir()
        write_avro(
            pa.table({"a": ["x"], "b": [1]}), str(base / "0.avro")
        )
        write_avro(
            pa.table({"a": ["y"], "c": [2.0]}), str(base / "1.avro")
        )
        with pytest.raises(ValueError, match="schema mismatch"):
            _read_avro_fallback(spark, str(base), ".avro")

    def test_avro_gzip_read_uses_python_tier_deliberately(
        self, spark, change_events, tmp_path
    ):
        """Outer-gzipped .avro.gz objects are opaque to spark-avro
        (container codecs only), so the reader must route them to the
        python codec up front instead of gating on a jar error."""
        from unittest import mock

        from rigatoni_spark.sinks import reader as sink_reader

        cfg = S3SinkConfig(
            bucket=str(tmp_path / "gz"),
            format=SerializationFormat.AVRO,
            compression=CompressionCodec.GZIP,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )
        sample = change_events.limit(50)
        assert write_batch(sample, cfg, batch_id=1)
        with mock.patch.object(
            sink_reader,
            "_read_avro_fallback",
            wraps=sink_reader._read_avro_fallback,
        ) as spy:
            back = sink_reader.read_sink_output(spark, cfg)
            assert back.count() == sample.count()
            assert spy.called

    def test_multi_file_groups_bound_file_count(self, change_events, tmp_path):
        # single_file_per_group=False still bounds output files by
        # batch size: ceil(n_events / 5000) coalesced tasks, so a batch
        # under the target writes ONE part-file per collection dir even
        # when the upstream arrives in many partitions (the small-file
        # mitigation the streaming pipeline relies on per micro-batch)
        sample = change_events.limit(2000).repartition(16)
        n = sample.count()
        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.JSON,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
            single_file_per_group=False,
        )
        keys = write_batch(sample, cfg, batch_id=7, n_events=n)
        assert keys
        colls = {k.split("/")[0] for k in keys}
        # one coalesced task -> exactly one object per collection
        assert len(keys) == len(colls)

    def test_deferred_probe_contract(self, spark, change_events, tmp_path):
        # deferred_probe resolves AFTER staging, BEFORE any final key:
        # an exception discards staging and surfaces; an empty dict
        # means empty batch (no keys, no files); a real dict drives the
        # same key stems the probe-first path would have produced
        sample = change_events.limit(100)
        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.JSON,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )
        probe = (
            sample.groupBy("collection")
            .agg(F.max("cluster_time").alias("t"))
            .collect()
        )
        group_times = {r["collection"]: r["t"] for r in probe}

        # exception path: nothing lands, staging removed
        def boom():
            raise RuntimeError("probe exploded")

        with pytest.raises(RuntimeError, match="probe exploded"):
            write_batch(sample, cfg, batch_id=1, deferred_probe=boom)
        assert glob.glob(str(tmp_path / "**" / "*"), recursive=True) == []

        # empty-batch path: no keys, no files
        assert write_batch(sample, cfg, batch_id=1, deferred_probe=dict) == []
        assert glob.glob(str(tmp_path / "**" / "*"), recursive=True) == []

        # success path: keys identical to the probe-first design
        keys = write_batch(
            sample, cfg, batch_id=1, deferred_probe=lambda: group_times
        )
        want = write_batch(sample, cfg, batch_id=1, group_times=group_times)
        assert sorted(keys) == sorted(want)

    def test_all_layouts_roundtrip_json(self, spark, change_events, tmp_path):
        from pyspark.sql import functions as F

        from rigatoni_spark.config import PartitionStrategy
        from rigatoni_spark.sinks.reader import read_sink_output

        sample = change_events.limit(500)
        n = sample.count()
        want = sorted(
            (r["collection"], r["resume_token"])
            for r in sample.select("collection", "resume_token").collect()
        )
        for strategy in PartitionStrategy:
            out = tmp_path / strategy.name.lower()
            cfg = S3SinkConfig(
                bucket=str(out),
                format=SerializationFormat.JSON,
                partition_strategy=strategy,
            )
            keys = write_batch(sample, cfg, batch_id=1)
            assert keys
            back = read_sink_output(spark, cfg)
            assert back.count() == n
            got = sorted(
                (r["collection"], r["resume_token"])
                for r in back.select("collection", "resume_token").collect()
            )
            assert got == want, strategy

    def test_hive_layout_readback_prunes_partitions(
        self, spark, change_events, tmp_path
    ):
        """A consumer reading the HIVE key layout as a partitioned
        dataset gets DIRECTORY pruning on the layout keys: a collection
        filter lands in the scan's PartitionFilters (directories never
        listed), not as a post-scan row filter — the 100 TB consumption
        contract the Hive strategy exists for. The shadow envelope
        columns in the data files merge cleanly with the path-derived
        partition values (same name, same values)."""
        import re

        cfg = S3SinkConfig(
            bucket=str(tmp_path),
            format=SerializationFormat.PARQUET,
            compression=CompressionCodec.ZSTD,
            partition_strategy=PartitionStrategy.HIVE_PARTITIONED,
        )
        keys = write_batch(change_events, cfg, batch_id=0)
        assert keys and all(k.startswith("collection=") for k in keys)
        df = spark.read.parquet(str(tmp_path))
        pruned = df.filter(F.col("collection") == "c1")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
        assert m is not None, plan
        assert "collection" in m.group(0) and "= c1" in m.group(0)
        # manifest cross-check: plan-level pruning agrees with the keys
        want = change_events.filter(F.col("collection") == "c1").count()
        assert pruned.count() == want
        c1_keys = [k for k in keys if k.startswith("collection=c1/")]
        assert c1_keys and len(c1_keys) < len(keys)


class TestSinkCompaction:
    def _cfg(self, out):
        return S3SinkConfig(
            bucket=str(out),
            format=SerializationFormat.JSON,
            compression=CompressionCodec.GZIP,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )

    def _rows(self, spark, cfg):
        from rigatoni_spark.sinks.reader import read_sink_output

        return sorted(
            (r["collection"], r["resume_token"])
            for r in read_sink_output(spark, cfg)
            .select("collection", "resume_token")
            .collect()
        )

    def test_merges_objects_and_preserves_content(
        self, spark, change_events, tmp_path
    ):
        from rigatoni_spark.sinks.compact import compact_sink_output

        cfg = self._cfg(tmp_path)
        rt = F.col("resume_token").cast("bigint")
        for b in range(3):
            write_batch(change_events.filter(rt % 3 == b), cfg, batch_id=b)
        before_files = glob.glob(str(tmp_path / "**" / "*.jsonl.gz"), recursive=True)
        want = self._rows(spark, cfg)
        res = compact_sink_output(spark, cfg, compaction_id=777)
        after_files = glob.glob(str(tmp_path / "**" / "*.jsonl.gz"), recursive=True)
        assert len(after_files) < len(before_files)
        assert len(after_files) == len(res["keys"])
        assert all(
            os.path.basename(f).startswith("000000000777-") for f in after_files
        )
        assert self._rows(spark, cfg) == want
        # reusing the same cid collides with the now-existing keys
        with pytest.raises(ValueError, match="collides"):
            compact_sink_output(spark, cfg, compaction_id=777)

    def test_recovery_from_staging_phase_drops_partial_keys(
        self, spark, change_events, tmp_path
    ):
        """Crash mid-rewrite: marker=staging + a partial cid-prefixed
        object on disk. Recovery re-runs from the intact old set — the
        partial object must not double rows."""
        import shutil as _sh

        from rigatoni_spark.sinks.compact import (
            _atomic_write,
            recover_sink_compaction,
        )

        cfg = self._cfg(tmp_path)
        rt = F.col("resume_token").cast("bigint")
        for b in range(2):
            write_batch(change_events.filter(rt % 2 == b), cfg, batch_id=b)
        want = self._rows(spark, cfg)
        some = glob.glob(str(tmp_path / "**" / "*.jsonl.gz"), recursive=True)[0]
        partial = os.path.join(
            os.path.dirname(some), "000000000555-999.jsonl.gz"
        )
        _sh.copy(some, partial)  # half-written new object
        _atomic_write(
            str(tmp_path / "_sink_compaction"),
            '{"cid": 555, "phase": "staging"}',
        )
        recover_sink_compaction(spark, cfg)
        assert not os.path.exists(str(tmp_path / "_sink_compaction"))
        assert self._rows(spark, cfg) == want
        files = glob.glob(str(tmp_path / "**" / "*.jsonl.gz"), recursive=True)
        assert all(
            os.path.basename(f).startswith("000000000555-") for f in files
        )

    def test_recovery_from_published_phase_deletes_stragglers(
        self, spark, change_events, tmp_path
    ):
        """Crash mid-delete: new objects all present, some old ones
        linger. Recovery deletes them without re-reading anything."""
        from rigatoni_spark.sinks.compact import (
            _atomic_write,
            compact_sink_output,
            recover_sink_compaction,
        )

        cfg = self._cfg(tmp_path)
        rt = F.col("resume_token").cast("bigint")
        for b in range(2):
            write_batch(change_events.filter(rt % 2 == b), cfg, batch_id=b)
        want = self._rows(spark, cfg)
        compact_sink_output(spark, cfg, compaction_id=888)
        # simulate a straggler old object + a published-phase marker
        straggler = tmp_path / "c0" / "000000000001-straggler.jsonl.gz"
        straggler.parent.mkdir(exist_ok=True)
        straggler.write_bytes(b"junk")
        _atomic_write(
            str(tmp_path / "_sink_compaction"),
            '{"cid": 888, "phase": "published"}',
        )
        recover_sink_compaction(spark, cfg)
        assert not straggler.exists()
        assert not os.path.exists(str(tmp_path / "_sink_compaction"))
        assert self._rows(spark, cfg) == want
        # pending marker blocks a new compaction attempt
        _atomic_write(
            str(tmp_path / "_sink_compaction"),
            '{"cid": 1, "phase": "staging"}',
        )
        with pytest.raises(RuntimeError, match="pending"):
            compact_sink_output(spark, cfg, compaction_id=2)

    def test_lease_blocks_compaction_while_pipeline_alive(
        self, spark, change_events, tmp_path
    ):
        """The run-with-the-pipeline-STOPPED contract is enforced: a
        live lease (held by Pipeline.start) refuses compaction; a STALE
        lease from a crashed driver does not wedge maintenance."""
        import subprocess

        from rigatoni_spark.sinks.compact import (
            clear_sink_lease,
            compact_sink_output,
            write_sink_lease,
        )

        cfg = self._cfg(tmp_path)
        rt = F.col("resume_token").cast("bigint")
        for b in range(2):
            write_batch(change_events.filter(rt % 2 == b), cfg, batch_id=b)
        # live lease: this very process
        write_sink_lease(cfg.base_uri)
        with pytest.raises(RuntimeError, match="lease"):
            compact_sink_output(spark, cfg, compaction_id=31)
        clear_sink_lease(cfg.base_uri)
        # stale lease: a child that has already exited
        child = subprocess.Popen(["true"])
        child.wait()
        (tmp_path / "_rigatoni_pipeline.lease").write_text(
            '{"pid": %d}' % child.pid
        )
        res = compact_sink_output(spark, cfg, compaction_id=32)
        assert res["keys"], "stale lease must not block compaction"

    def test_foreign_live_lease_is_neither_stolen_nor_cleared(
        self, tmp_path
    ):
        """ADVICE r9: two pipelines sharing a sink root must not void
        each other's stopped-pipeline contract — write_sink_lease
        refuses while a DIFFERENT live pid holds the lease, and
        clear_sink_lease only removes a lease carrying THIS process's
        pid. Once the foreign holder dies, the stale lease is
        reclaimable by a new write."""
        import subprocess

        from rigatoni_spark.sinks.compact import (
            clear_sink_lease,
            write_sink_lease,
        )

        base_uri = str(tmp_path)
        lease = tmp_path / "_rigatoni_pipeline.lease"
        child = subprocess.Popen(["sleep", "60"])
        try:
            lease.write_text('{"pid": %d}' % child.pid)
            with pytest.raises(RuntimeError, match="another pipeline"):
                write_sink_lease(base_uri)
            clear_sink_lease(base_uri)
            assert lease.exists(), "foreign LIVE lease was cleared"
        finally:
            child.kill()
            child.wait()
        # holder dead -> stale lease reclaimable; own lease clears
        write_sink_lease(base_uri)
        import json as _json

        assert _json.loads(lease.read_text())["pid"] == os.getpid()
        clear_sink_lease(base_uri)
        assert not lease.exists()
        # re-entrant same-pid write (pipeline restart) is allowed
        write_sink_lease(base_uri)
        write_sink_lease(base_uri)
        clear_sink_lease(base_uri)
        assert not lease.exists()

    def test_finish_only_deletes_snapshotted_files(
        self, spark, change_events, tmp_path
    ):
        """Belt-and-braces for an unleased racing writer: the delete
        pass removes ONLY the objects snapshotted into the marker at
        staging time — a batch flushed mid-compaction survives."""
        from rigatoni_spark.sinks.compact import (
            _atomic_write,
            recover_sink_compaction,
        )

        cfg = self._cfg(tmp_path)
        rt = F.col("resume_token").cast("bigint")
        for b in range(2):
            write_batch(change_events.filter(rt % 2 == b), cfg, batch_id=b)
        import glob as _g
        import json as _json

        old = [
            os.path.relpath(f, str(tmp_path))
            for f in _g.glob(
                str(tmp_path / "**" / "*.jsonl.gz"), recursive=True
            )
        ]
        # a racing writer lands a new object AFTER the snapshot
        racer = tmp_path / "c0" / "000000000099-racer.jsonl.gz"
        racer.parent.mkdir(exist_ok=True)
        racer.write_bytes(b"racing batch")
        # published marker whose snapshot predates the racer; cid 555
        # objects don't exist — only the delete pass runs
        _atomic_write(
            str(tmp_path / "_sink_compaction"),
            _json.dumps({"cid": 555, "phase": "published", "files": old}),
        )
        recover_sink_compaction(spark, cfg)
        assert racer.exists(), "snapshot-bounded delete removed a racer"
        for rel in old:
            assert not (tmp_path / rel).exists()

    def test_same_process_second_pipeline_cannot_void_lease(self, tmp_path):
        """Two Pipelines in ONE driver process (same pid) must not void
        each other's lease either: the per-owner token distinguishes
        them where the pid cannot — B's start refuses while A holds the
        root, and a clear with B's token leaves A's lease in place."""
        import json as _json

        from rigatoni_spark.sinks.compact import (
            clear_sink_lease,
            write_sink_lease,
        )

        base_uri = str(tmp_path)
        lease = tmp_path / "_rigatoni_pipeline.lease"
        write_sink_lease(base_uri, token="pipeline-a")
        with pytest.raises(RuntimeError, match="another pipeline"):
            write_sink_lease(base_uri, token="pipeline-b")
        clear_sink_lease(base_uri, token="pipeline-b")
        assert lease.exists(), "B's clear removed A's live lease"
        assert _json.loads(lease.read_text())["token"] == "pipeline-a"
        # A re-entrant write by the SAME owner is allowed (restart)
        write_sink_lease(base_uri, token="pipeline-a")
        clear_sink_lease(base_uri, token="pipeline-a")
        assert not lease.exists()
        # malformed-but-valid-JSON lease (non-object) is stale, and
        # clear must not crash on it (AttributeError regression)
        lease.write_text('[1]')
        clear_sink_lease(base_uri)
        write_sink_lease(base_uri, token="pipeline-c")
        clear_sink_lease(base_uri, token="pipeline-c")
        assert not lease.exists()


class TestCrashMidRenameReplay:
    def test_replay_after_crash_between_staging_and_rename(
        self, spark, change_events, tmp_path, monkeypatch
    ):
        """R3 at-least-once contract at the writer: a crash PARTWAY
        through the staged->final rename pass (some objects landed,
        staging left behind, offsets never committed) must be fully
        healed by replaying the same batch — deterministic key stems
        make the rewrite idempotent (landed objects are overwritten,
        none are orphaned) and mode('overwrite') staging discards the
        crashed attempt's leftovers."""
        import shutil as _shutil

        import rigatoni_spark.sinks.writers as writers_mod

        cfg = lambda root: S3SinkConfig(  # noqa: E731
            bucket=str(root),
            format=SerializationFormat.JSON,
            compression=CompressionCodec.GZIP,
            partition_strategy=PartitionStrategy.COLLECTION_BASED,
        )

        def snapshot(root):
            out = {}
            for p in glob.glob(os.path.join(root, "**"), recursive=True):
                if os.path.isfile(p):
                    with gzip.open(p, "rt") as fh:
                        body = sorted(fh.read().splitlines())
                    out[os.path.relpath(p, root)] = body
            return out

        # reference: the never-crashed run
        clean_root = tmp_path / "clean"
        clean_keys = sorted(write_batch(change_events, cfg(clean_root), batch_id=7))
        want = snapshot(str(clean_root))

        # crashed run: die after the FIRST final-key rename
        crash_root = tmp_path / "crash"
        real_move = _shutil.move
        moved = {"n": 0}

        def dying_move(src, dst, *a, **kw):
            if moved["n"] >= 1:
                raise OSError("simulated crash mid-rename")
            moved["n"] += 1
            return real_move(src, dst, *a, **kw)

        monkeypatch.setattr(writers_mod.shutil, "move", dying_move)
        with pytest.raises(OSError, match="simulated crash"):
            write_batch(change_events, cfg(crash_root), batch_id=7)
        monkeypatch.setattr(writers_mod.shutil, "move", real_move)
        # crash state: exactly one landed object + a leftover staging dir
        assert moved["n"] == 1
        assert glob.glob(os.path.join(str(crash_root), "_staging_*"))

        # replay (what the restarted stream does: offsets were never
        # committed, so the same batch_id re-runs)
        replay_keys = sorted(write_batch(change_events, cfg(crash_root), batch_id=7))
        assert replay_keys == clean_keys
        got = snapshot(str(crash_root))
        assert got == want  # same keys, same bytes; no orphans, no staging


def test_single_file_per_group_spreads_writer_tasks(spark, change_events, tmp_path):
    """Round-13 writer internals guard: single_file_per_group now
    hash-partitions on the layout keys with an EXPLICIT shuffle width
    (AQE would coalesce a bare repartition(cols) to one partition on a
    small batch, serializing every group's file write in one task).
    The one-object-per-group contract must survive groups >> tasks:
    every Hive (collection, hour) combination still gets exactly ONE
    object, even though several groups hash into each writer task."""
    cfg = S3SinkConfig(
        bucket=str(tmp_path),
        format=SerializationFormat.JSON,
        compression=CompressionCodec.NONE,
        partition_strategy=PartitionStrategy.HIVE_PARTITIONED,
    )
    keys = write_batch(change_events, cfg, batch_id=3)
    # one key per distinct (collection, y, m, d, h) in the feed
    combos = (
        change_events.select(
            "collection",
            F.year("cluster_time"),
            F.month("cluster_time"),
            F.dayofmonth("cluster_time"),
            F.hour("cluster_time"),
        )
        .distinct()
        .count()
    )
    assert len(keys) == combos == len(set(keys))
    # and every event survives exactly once
    n = 0
    for k in keys:
        with open(tmp_path / k) as fh:
            n += sum(1 for _ in fh)
    assert n == change_events.count()


class TestExplicitReadSchema:
    """Round-14 (r13-verdict ask #7): text-format read-backs use the
    writer-owned wire schema by default (one fewer pass over the
    output); infer_schema=True keeps the self-describing-objects
    coverage, pinned equal here."""

    def test_explicit_schema_matches_inference(
        self, spark, change_events, tmp_path
    ):
        from rigatoni_spark.sinks.reader import read_sink_output

        for fmt, codec in (
            (SerializationFormat.JSON, CompressionCodec.GZIP),
            (SerializationFormat.CSV, CompressionCodec.NONE),
        ):
            cfg = S3SinkConfig(
                bucket=str(tmp_path / fmt.name.lower()),
                format=fmt,
                compression=codec,
                partition_strategy=PartitionStrategy.DATE_HOUR_PARTITIONED,
            )
            sample = change_events.limit(300)
            assert write_batch(sample, cfg, batch_id=1)
            explicit = read_sink_output(spark, cfg)
            inferred = read_sink_output(spark, cfg, infer_schema=True)
            cols = sorted(inferred.columns)
            assert sorted(explicit.columns) == sorted(
                set(cols) | {"full_document"}
            ) or sorted(explicit.columns) == cols
            key = lambda df: sorted(  # noqa: E731
                map(tuple, df.select(*cols).collect())
            )
            assert key(explicit) == key(inferred), fmt

    def test_all_deletes_json_still_reads_the_full_envelope(
        self, spark, change_events, tmp_path
    ):
        """to_json drops null fields: an all-deletes JSON output has no
        full_document key in ANY object, so inference cannot discover
        the column and the typed consumer projection would fail — the
        explicit wire schema reads it as null instead."""
        from rigatoni_spark.sinks.reader import read_sink_output

        cfg = S3SinkConfig(
            bucket=str(tmp_path / "dels"),
            format=SerializationFormat.JSON,
            compression=CompressionCodec.NONE,
            partition_strategy=PartitionStrategy.FLAT,
        )
        dels = change_events.filter(F.col("operation") == "delete").limit(20)
        assert write_batch(dels, cfg, batch_id=1)
        back = read_sink_output(spark, cfg)
        assert "full_document" in back.columns
        assert back.count() == dels.count()
        assert back.filter(F.col("full_document").isNotNull()).count() == 0
        assert "full_document" not in read_sink_output(
            spark, cfg, infer_schema=True
        ).columns
