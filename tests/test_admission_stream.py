"""Streaming corpus admission e2e: continuous near-dup gating of
document batches with replay-idempotent corpus state
(streaming/admission.py)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rigatoni_spark.streaming.admission import AdmissionStream


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    src.mkdir(), state.mkdir(), ckpt.mkdir()
    return str(src), str(state), str(ckpt)


def _feed(src: str, name: str, rows: list[tuple[int, str]]) -> None:
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(src, name))


A = "the quick brown fox jumps over the lazy dog"
B = "pack my box with five dozen liquor jugs today"
C = "how vexingly quick daft zebras jump around here"
D = "entirely different words compose this new document text"


class TestAdmissionStream:
    def test_gate_rejects_cross_batch_duplicates(self, spark, dirs):
        src, state, ckpt = dirs
        _feed(src, "b0.parquet", [(1, A), (2, B)])
        s = AdmissionStream(spark, src, state, ckpt).start()
        s.process_all_available()
        assert s.stats.docs_seen == 2 and s.stats.docs_admitted == 2
        # batch 2: one exact twin of doc 1, one genuinely new doc
        _feed(src, "b1.parquet", [(3, A), (4, C)])
        s.process_all_available()
        s.stop()
        assert s.stats.batches == 2
        assert s.stats.docs_seen == 4
        assert s.stats.docs_admitted == 3
        assert s.stats.docs_rejected == 1
        corpus = {r["doc_id"] for r in s.corpus().collect()}
        assert corpus == {1, 2, 4}
        # the index mirrors the corpus exactly
        idx_docs = {
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(state, "index")).collect()
        }
        assert idx_docs == corpus
        # audit trail: one report per micro-batch
        reports = glob.glob(os.path.join(state, "reports", "ingest_batch=*"))
        assert len(reports) == 2
        # Prometheus surface mirrors the stats (same registry class /
        # rigatoni_ prefix as the CDC pipeline's O5 metrics)
        from rigatoni_spark.streaming import metrics as M

        assert s.metrics.get(M.ADMISSION_DOCS, mode="text") == 4
        assert s.metrics.get(M.ADMISSION_ADMITTED, mode="text") == 3
        assert s.metrics.get(M.ADMISSION_REJECTED, mode="text") == 1
        assert s.metrics.get(M.ADMISSION_BATCHES, mode="text") == 2
        assert s.metrics.get(M.ADMISSION_STATE_PARTITIONS, mode="text") == 2

    def test_replay_is_idempotent_and_never_self_rejects(self, spark, dirs):
        """An at-least-once replay of micro-batch N re-runs against the
        corpus BEFORE N (partition-pruned), so a replayed doc is not
        rejected as a duplicate of its own half-written state, and the
        partition overwrite leaves corpus content identical."""
        src, state, ckpt = dirs
        _feed(src, "b0.parquet", [(1, A), (2, B)])
        s = AdmissionStream(spark, src, state, ckpt).start()
        s.process_all_available()
        _feed(src, "b1.parquet", [(3, A), (4, C)])
        s.process_all_available()
        s.stop()
        before = sorted(
            (r["doc_id"], r["text"]) for r in s.corpus().collect()
        )
        # simulate the replay: same batch content, same batch_id, with
        # batch 1's own partitions already on disk
        replay = spark.createDataFrame(
            [(3, A), (4, C)], "doc_id bigint, text string"
        )
        s._admit(replay, 1)
        after = sorted((r["doc_id"], r["text"]) for r in s.corpus().collect())
        assert after == before
        assert {r["doc_id"] for r in s.corpus().collect()} == {1, 2, 4}

    def test_restart_resumes_without_reprocessing(self, spark, dirs):
        src, state, ckpt = dirs
        _feed(src, "b0.parquet", [(1, A), (2, B)])
        s = AdmissionStream(spark, src, state, ckpt).start()
        s.process_all_available()
        s.stop()
        s2 = AdmissionStream(spark, src, state, ckpt).start()
        s2.process_all_available()
        assert s2.stats.batches == 0  # checkpoint WAL: nothing replays
        _feed(src, "b1.parquet", [(5, D)])
        s2.process_all_available()
        s2.stop()
        assert s2.stats.batches == 1
        assert s2.stats.docs_admitted == 1
        assert {r["doc_id"] for r in s2.corpus().collect()} == {1, 2, 5}

    def test_empty_first_batch_does_not_poison_the_corpus_read(
        self, spark, dirs
    ):
        """An empty micro-batch commits a data-less ingest_batch
        partition; later batches must still read the corpus tree
        (schema inference needs >= 1 data file) and gate correctly."""
        src, state, ckpt = dirs
        _feed(src, "b0.parquet", [])  # zero-row parquet -> empty batch
        s = AdmissionStream(spark, src, state, ckpt).start()
        s.process_all_available()
        assert s.stats.batches == 1 and s.stats.docs_seen == 0
        _feed(src, "b1.parquet", [(1, A)])
        s.process_all_available()
        _feed(src, "b2.parquet", [(2, A), (3, B)])
        s.process_all_available()
        s.stop()
        assert s.stats.docs_rejected == 1  # doc 2 vs doc 1 across batches
        assert {r["doc_id"] for r in s.corpus().collect()} == {1, 3}

    def test_compaction_preserves_state_and_gating(self, spark, dirs):
        """compact() merges the per-batch partitions into one, the
        corpus content is unchanged, and a restarted stream still
        rejects duplicates against the merged state."""
        src, state, ckpt = dirs
        for i, rows in enumerate([[(1, A)], [(2, B)], [(3, C)]]):
            _feed(src, f"b{i}.parquet", rows)
        s = AdmissionStream(spark, src, state, ckpt).start()
        s.process_all_available()
        s.stop()
        assert s.stats.batches == 3
        before = sorted(r["doc_id"] for r in s.corpus().collect())
        s.compact()
        after = sorted(r["doc_id"] for r in s.corpus().collect())
        assert after == before == [1, 2, 3]
        for name in ("corpus", "index"):
            parts = glob.glob(
                os.path.join(state, name, "ingest_batch=*")
            )
            assert len(parts) == 1 and parts[0].endswith("ingest_batch=2")
            assert s._floor(name) == 2
        # compact again: single partition -> no-op, state intact
        s.compact()
        assert sorted(r["doc_id"] for r in s.corpus().collect()) == [1, 2, 3]
        # the gate still works against the merged partition
        _feed(src, "b3.parquet", [(4, A), (5, D)])
        s2 = AdmissionStream(spark, src, state, ckpt).start()
        s2.process_all_available()
        s2.stop()
        assert s2.stats.docs_rejected == 1
        assert sorted(r["doc_id"] for r in s2.corpus().collect()) == [
            1, 2, 3, 5,
        ]

    def test_compaction_crash_recovery(self, spark, dirs):
        """A crash after the pending marker is published (the worst
        window: merged tmp written, old partitions possibly half
        deleted) is finished by the next start() — no data loss, no
        duplicates."""
        import shutil

        src, state, ckpt = dirs
        for i, rows in enumerate([[(1, A)], [(2, B)]]):
            _feed(src, f"b{i}.parquet", rows)
        s = AdmissionStream(spark, src, state, ckpt).start()
        s.process_all_available()
        s.stop()
        # hand-build the crash state for the corpus tree: tmp written
        # + pending published, swap NOT performed
        tree = os.path.join(state, "corpus")
        tmp = os.path.join(tree, "_compact_tmp_1")
        (
            spark.read.parquet(tree)
            .drop("ingest_batch")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        AdmissionStream._atomic_write(
            os.path.join(tree, "_compaction_pending"), "1"
        )
        # ...and simulate the half-finished delete phase
        shutil.rmtree(os.path.join(tree, "ingest_batch=0"))
        s2 = AdmissionStream(spark, src, state, ckpt).start()  # recovers
        s2.process_all_available()
        s2.stop()
        assert sorted(r["doc_id"] for r in s2.corpus().collect()) == [1, 2]
        assert s2._floor("corpus") == 1
        assert not os.path.exists(os.path.join(tree, "_compaction_pending"))

    def test_compact_excludes_uncommitted_batch_state(self, spark, dirs):
        """A batch that crashed BETWEEN its state writes and the WAL
        commit leaves ingest_batch partitions with no commits/<id>
        record. compact() must NOT merge them: if the floor advanced to
        the crashed id, the replayed batch would read an empty corpus
        (floor <= ingest_batch < N is vacuous at N == floor) and its
        partition overwrite would destroy the merged history."""
        src, state, ckpt = dirs
        _feed(src, "b0.parquet", [(1, A)])
        _feed(src, "b1.parquet", [(2, B)])
        s = AdmissionStream(spark, src, state, ckpt).start()
        s.process_all_available()
        s.stop()
        assert s.stats.batches == 2

        class Crashing(AdmissionStream):
            def _admit(self, batch, batch_id):
                super()._admit(batch, batch_id)
                if batch_id == 2:
                    raise RuntimeError("simulated crash before WAL commit")

        _feed(src, "b2.parquet", [(3, A), (4, D)])
        c = Crashing(spark, src, state, ckpt).start()
        with pytest.raises(Exception, match="simulated crash"):
            c.process_all_available()
        try:
            c.stop()
        except Exception:  # noqa: BLE001 — failed query may re-raise
            pass
        # state partition 2 exists but commits/2 does not
        assert os.path.isdir(os.path.join(state, "corpus", "ingest_batch=2"))
        assert not os.path.exists(os.path.join(ckpt, "commits", "2"))
        g = AdmissionStream(spark, src, state, ckpt)
        g.compact()
        # the merge stops at the last COMMITTED batch
        assert g._floor("corpus") == 1 and g._floor("index") == 1
        assert os.path.isdir(os.path.join(state, "corpus", "ingest_batch=2"))
        # restart: batch 2 replays against the merged history — the dup
        # is still rejected and nothing admitted before the crash leaks
        s2 = AdmissionStream(spark, src, state, ckpt).start()
        s2.process_all_available()
        s2.stop()
        assert {r["doc_id"] for r in s2.corpus().collect()} == {1, 2, 4}

    def test_seed_primes_the_gate(self, spark, dirs):
        """seed() initializes a fresh gate with an existing corpus: the
        first micro-batch is already gated against it, the seed rows
        show in corpus(), and seeding a non-fresh gate raises."""
        src, state, ckpt = dirs
        seed_df = spark.createDataFrame(
            [(100, A), (101, B)], "doc_id bigint, text string"
        )
        s = AdmissionStream(spark, src, state, ckpt).seed(seed_df)
        _feed(src, "b0.parquet", [(1, A), (2, C)])  # 1 == seed doc 100
        s.start()
        s.process_all_available()
        s.stop()
        assert s.stats.docs_rejected == 1
        assert {r["doc_id"] for r in s.corpus().collect()} == {100, 101, 2}
        with pytest.raises(RuntimeError, match="fresh gate"):
            AdmissionStream(spark, src, state, ckpt).seed(seed_df)
        # compaction folds the seed partition in like any other
        s.compact()
        assert {r["doc_id"] for r in s.corpus().collect()} == {100, 101, 2}

    def test_vector_mode_gates_embeddings(self, spark, dirs):
        """mode='vector': the same state machine gates embedding
        batches — an exact twin of an earlier-batch vector is rejected
        by cosine, its negation (complementary LSH bucket) is admitted,
        and a restart resumes against the persisted posting list."""
        src, state, ckpt = dirs
        v = [float((i * 7) % 13 - 6) or 1.0 for i in range(64)]
        w = [float((i * 11) % 17 - 8) or 2.0 for i in range(64)]
        neg = [-x for x in v]

        def feed_vec(name, rows):
            t = pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                }
            )
            pq.write_table(t, os.path.join(src, name))

        feed_vec("b0.parquet", [(1, v), (2, w)])
        s = AdmissionStream(
            spark, src, state, ckpt, threshold=0.95, mode="vector"
        ).start()
        s.process_all_available()
        feed_vec("b1.parquet", [(3, v), (4, neg)])
        s.process_all_available()
        s.stop()
        assert s.stats.docs_seen == 4
        assert s.stats.docs_rejected == 1  # vec 3 == vec 1
        assert {r["vec_id"] for r in s.corpus().collect()} == {1, 2, 4}
        # restart: the twin of vec 2 is still rejected
        feed_vec("b2.parquet", [(5, w)])
        s2 = AdmissionStream(
            spark, src, state, ckpt, threshold=0.95, mode="vector"
        ).start()
        s2.process_all_available()
        s2.stop()
        assert s2.stats.docs_rejected == 1
        assert {r["vec_id"] for r in s2.corpus().collect()} == {1, 2, 4}

    def test_near_duplicate_rejected_not_just_exact(self, spark, dirs):
        src, state, ckpt = dirs
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
        _feed(src, "b0.parquet", [(1, base)])
        s = AdmissionStream(spark, src, state, ckpt, threshold=0.5).start()
        s.process_all_available()
        _feed(src, "b1.parquet", [(2, near), (3, D)])
        s.process_all_available()
        s.stop()
        assert s.stats.docs_rejected == 1
        assert {r["doc_id"] for r in s.corpus().collect()} == {1, 3}

    def test_bucketized_compaction_gates_and_plans_without_index_exchange(
        self, spark, dirs
    ):
        """compact(bucketize=True) publishes the merged index as a
        bucketed table; (a) the gate still rejects duplicates against
        it, (b) the probe equi-join plans with NO Exchange above the
        bucketed index scan (the 100 TB contract: only the increment
        shuffles), (c) a metastore without the table entry rebuilds it
        from the plain merged partition."""
        from pyspark.sql import functions as F

        from rigatoni_spark.llm import minhash

        src, state, ckpt = dirs
        for i, rows in enumerate([[(1, A)], [(2, B)], [(3, C)]]):
            _feed(src, f"b{i}.parquet", rows)
        s = AdmissionStream(spark, src, state, ckpt).start()
        s.process_all_available()
        s.stop()
        s.compact(bucketize=True, n_buckets=4)
        meta = s._bucketed_meta()
        assert meta is not None and meta["floor"] == 2
        assert spark.catalog.tableExists(meta["table"])
        # (b) plan guard: probe join against the bucketed index has no
        # Exchange on the index side (forbid broadcast so the test
        # exercises the co-location path, as test_bucketing does)
        idx = s._index_df(batch_id=3)
        batch = spark.createDataFrame(
            [(9, A), (10, D)], "doc_id bigint, text string"
        )
        plain = (
            spark.read.parquet(os.path.join(state, "index"))
            .filter(F.col("ingest_batch") <= 2)
            .select("doc_id", "band", "band_hash")
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

            def n_exchanges(index_side):
                probe = minhash.lsh_bands(batch).join(
                    index_side.withColumnRenamed("doc_id", "corpus_id"),
                    ["band", "band_hash"],
                )
                plan = probe._jdf.queryExecution().executedPlan().toString()
                return plan.count("Exchange"), plan

            nb, plan_b = n_exchanges(idx)
            np_, _ = n_exchanges(plain)
            # bucketing removes exactly the index-side Exchange; the
            # remaining ones belong to the increment (shuffle-to-bucket
            # + lsh_bands' internal spread repartition)
            assert nb == np_ - 1, plan_b
            assert "Bucketed: true" in plan_b or "SelectedBucketsCount" in plan_b, plan_b
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # (a) the gate still gates: dup of doc 1 rejected, new admitted
        _feed(src, "b3.parquet", [(4, A), (5, D)])
        s2 = AdmissionStream(spark, src, state, ckpt).start()
        s2.process_all_available()
        s2.stop()
        assert s2.stats.docs_rejected == 1
        assert {r["doc_id"] for r in s2.corpus().collect()} == {1, 2, 3, 5}
        # (c) rebuild-on-miss: drop the table, the next read recreates
        # it from the plain merged partition
        spark.sql(f"DROP TABLE IF EXISTS {meta['table']}")
        import shutil

        shutil.rmtree(os.path.join(state, "index_bucketed"), ignore_errors=True)
        idx2 = s2._index_df(batch_id=4)
        assert spark.catalog.tableExists(meta["table"])
        got = {r["doc_id"] for r in idx2.select("doc_id").distinct().collect()}
        # rebuilt base (1,2,3) union the fresh batch-3 partition (5)
        assert got == {1, 2, 3, 5}
        # stale marker after a later plain compact: floor moves past the
        # marker and the plain path takes over (no wrong reads)
        s2.compact()
        assert s2._floor("index") == 3
        idx3 = s2._index_df(batch_id=5)
        got3 = {r["doc_id"] for r in idx3.select("doc_id").distinct().collect()}
        assert got3 == {1, 2, 3, 5}

    def test_compact_auto_bucketizes_past_threshold(self, spark, dirs):
        """bucketize defaults to AUTO: tiny states stay on the plain
        partition-pruned path (no external-table upkeep), while an
        index at/above BUCKETIZE_MIN_ROWS publishes the bucketed table
        without being asked — the 100 TB default."""
        src, state, ckpt = dirs
        for i, rows in enumerate([[(1, A)], [(2, B)], [(3, C)]]):
            _feed(src, f"b{i}.parquet", rows)
        s = AdmissionStream(spark, src, state, ckpt).start()
        s.process_all_available()
        s.stop()
        s.compact()  # tiny index: auto stays plain
        assert s._bucketed_meta() is None
        # one more batch so a second compaction has >= 2 partitions;
        # drop the instance threshold to flip auto on
        _feed(src, "b3.parquet", [(4, D)])
        s2 = AdmissionStream(spark, src, state, ckpt).start()
        s2.process_all_available()
        s2.stop()
        s2.BUCKETIZE_MIN_ROWS = 1
        s2.compact()
        meta = s2._bucketed_meta()
        assert meta is not None and meta["floor"] == s2._floor("index")
        assert spark.catalog.tableExists(meta["table"])
        # explicit False still wins over auto
        _feed(src, "b4.parquet", [(5, A)])
        s3 = AdmissionStream(spark, src, state, ckpt).start()
        s3.process_all_available()
        s3.stop()
        s3.BUCKETIZE_MIN_ROWS = 1
        s3.compact(bucketize=False)
        meta3 = s3._bucketed_meta()
        # marker from the earlier bucketized pass is now stale (floor
        # advanced) — no NEW publication happened
        assert meta3["floor"] < s3._floor("index")

    def test_bucketized_compaction_vector_mode(self, spark, dirs):
        """Vector mode: the bucketed posting list (bucket key) gates a
        later embedding batch after compact(bucketize=True)."""
        src, state, ckpt = dirs
        v = [float((i * 7) % 13 - 6) or 1.0 for i in range(64)]
        w = [float((i * 11) % 17 - 8) or 2.0 for i in range(64)]
        neg = [-x for x in v]

        def feed_vec(name, rows):
            t = pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                }
            )
            pq.write_table(t, os.path.join(src, name))

        feed_vec("b0.parquet", [(1, v)])
        feed_vec("b1.parquet", [(2, w)])
        s = AdmissionStream(
            spark, src, state, ckpt, threshold=0.95, mode="vector"
        ).start()
        s.process_all_available()
        s.stop()
        s.compact(bucketize=True, n_buckets=4)
        assert s._bucketed_meta()["floor"] == 1
        feed_vec("b2.parquet", [(3, v), (4, neg)])
        s2 = AdmissionStream(
            spark, src, state, ckpt, threshold=0.95, mode="vector"
        ).start()
        s2.process_all_available()
        s2.stop()
        assert s2.stats.docs_rejected == 1  # vec 3 == vec 1 via the table
        assert {r["vec_id"] for r in s2.corpus().collect()} == {1, 2, 4}
