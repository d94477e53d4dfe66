"""Hard-kill crash-recovery e2e (round-13 ask #4).

The replay pins cover clean stop/restart and async-mode restart; this
harness closes the remaining at-least-once window: SIGKILL the WHOLE
process group (python driver + JVM — a machine-crash stand-in) while a
staged write is in flight, restart from the checkpoint, and assert the
final object tree across BOTH mirrored sinks is byte-identical to a
never-killed run's — for sync AND async progress-tracking modes.

Why this must hold: sink keys are deterministic per
(batch_id, group-times) and every write is a whole-object overwrite
(staging dirs are per-batch_id and written with mode=overwrite), so a
replayed batch — including the wider replay window async mode's lost
offset flushes create — rewrites the same keys with the same bytes.
A torn final object (kill mid-gzip-move) is likewise overwritten on
replay because the key derives from the batch, not the attempt.

Usage:
  python tools/crash_probe.py [--sf-dir /root/testdata/sf0.001]
                              [--modes sync,async] [--out CRASH_E2E.json]
Exit 0 iff every mode's kill+restart tree matches its clean run.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time


def _child(args) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rigatoni_spark.config import (
        CompressionCodec,
        PartitionStrategy,
        PipelineConfig,
        S3SinkConfig,
        SerializationFormat,
    )
    from rigatoni_spark.session import get_spark
    from rigatoni_spark.streaming.pipeline import Pipeline

    spark = get_spark(app_name="crash_probe_child")
    cfg = PipelineConfig(
        batch_timeout_secs=0.2,
        batch_size=100,
        async_progress_tracking=(args.mode == "async"),
        async_progress_interval_ms=200,
    )
    primary = S3SinkConfig(
        bucket=args.sink_out,
        format=SerializationFormat.JSON,
        compression=CompressionCodec.GZIP,
        partition_strategy=PartitionStrategy.DATE_HOUR_PARTITIONED,
        single_file_per_group=False,
    )
    mirror = S3SinkConfig(
        bucket=args.mirror_out,
        format=SerializationFormat.PARQUET,
        partition_strategy=PartitionStrategy.COLLECTION_BASED,
    )
    p = Pipeline(spark, cfg, [primary, mirror], args.src, args.ckpt).start()
    p.process_all_available()
    p.stop()
    print(f"CHILD_DONE keys={len(p.stats.keys_written)}", flush=True)
    spark.stop()


def _tree(root: str) -> dict[str, str]:
    """relpath -> content hash. Parquet objects hash their EXACT
    content (schema + row order + values, via the deterministic Arrow
    IPC serialization) rather than raw bytes: parquet-mr serializes
    each column chunk's `encodings` SET in hash order, so two writes
    of identical data differ by a few permuted footer bytes — a known
    writer non-determinism that would mask (or fake) a real recovery
    diff. Everything else (JSONL.gz primary objects — gzip mtime is
    pinned by the sink) must be byte-identical."""
    out: dict[str, str] = {}
    for f in glob.glob(os.path.join(root, "**", "*"), recursive=True):
        if not os.path.isfile(f):
            continue
        rel = os.path.relpath(f, root)
        if f.endswith(".parquet"):
            import pyarrow as pa
            import pyarrow.parquet as pq

            sink = pa.BufferOutputStream()
            t = pq.read_table(f)
            with pa.ipc.new_stream(sink, t.schema) as w:
                w.write_table(t)
            out[rel] = hashlib.sha256(
                sink.getvalue().to_pybytes()
            ).hexdigest()
        else:
            with open(f, "rb") as fh:
                out[rel] = hashlib.sha256(fh.read()).hexdigest()
    return out


def _spawn(mode: str, src: str, out: str, mirror: str, ckpt: str):
    # new session ⇒ killpg nukes python AND the JVM in one shot — the
    # whole "machine" dies at once, nothing flushes on the way down
    return subprocess.Popen(
        [
            sys.executable, os.path.abspath(__file__), "--run-child",
            "--mode", mode, "--src", src, "--sink-out", out,
            "--mirror-out", mirror, "--ckpt", ckpt,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )


def _run_mode(mode: str, feed_src: str, root: str) -> dict:
    res: dict = {"mode": mode}

    # 1. never-killed reference run
    clean_out = os.path.join(root, f"{mode}_clean_out")
    clean_mir = os.path.join(root, f"{mode}_clean_mir")
    os.makedirs(clean_out), os.makedirs(clean_mir)
    proc = _spawn(mode, feed_src, clean_out, clean_mir,
                  os.path.join(root, f"{mode}_clean_ckpt"))
    out_text, _ = proc.communicate(timeout=600)
    if proc.returncode != 0 or "CHILD_DONE" not in out_text:
        raise SystemExit(f"clean child failed for mode {mode}: {out_text[-500:]}")
    want_primary, want_mirror = _tree(clean_out), _tree(clean_mir)
    res["clean_files"] = len(want_primary) + len(want_mirror)

    # 2. kill run: SIGKILL the process GROUP while a staged write is
    #    in flight (a _staging_* dir under the primary root), after at
    #    least one batch already committed (≥1 final object) so the
    #    checkpoint is mid-stream, not empty
    kill_out = os.path.join(root, f"{mode}_kill_out")
    kill_mir = os.path.join(root, f"{mode}_kill_mir")
    kill_ckpt = os.path.join(root, f"{mode}_kill_ckpt")
    os.makedirs(kill_out), os.makedirs(kill_mir)
    proc = _spawn(mode, feed_src, kill_out, kill_mir, kill_ckpt)
    kill_point = None
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline and proc.poll() is None:
        staging = glob.glob(os.path.join(kill_out, "_staging_*")) + glob.glob(
            os.path.join(kill_mir, "_staging_*")
        )
        finals = [
            f
            for f in glob.glob(os.path.join(kill_out, "**", "*"), recursive=True)
            if os.path.isfile(f) and "_staging_" not in f
        ]
        if staging and finals:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            kill_point = {
                "trigger": "staging_in_flight",
                "staging_dirs": [os.path.basename(s) for s in staging],
                "final_objects_at_kill": len(finals),
            }
            break
        time.sleep(0.002)
    if kill_point is None:
        # the child finished before we caught a staging dir — vacuous
        res["kill_point"] = None
        res["trees_match"] = None
        return res
    proc.wait()
    res["kill_point"] = kill_point

    # 3. restart from the same checkpoint; drains the remainder
    proc = _spawn(mode, feed_src, kill_out, kill_mir, kill_ckpt)
    out_text, _ = proc.communicate(timeout=600)
    if proc.returncode != 0 or "CHILD_DONE" not in out_text:
        raise SystemExit(f"restart child failed for mode {mode}: {out_text[-500:]}")

    # 4. byte-identical trees, no staging leftovers
    got_primary, got_mirror = _tree(kill_out), _tree(kill_mir)
    mism = sorted(
        set(want_primary.items()) ^ set(got_primary.items())
    ) + sorted(set(want_mirror.items()) ^ set(got_mirror.items()))
    res["stray_staging"] = [
        k for k in (*got_primary, *got_mirror) if "_staging_" in k
    ]
    res["trees_match"] = not mism and not res["stray_staging"]
    res["mismatches"] = [k for k, _ in mism][:20]
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-child", action="store_true")
    ap.add_argument("--mode", default="sync", choices=["sync", "async"])
    ap.add_argument("--src")
    ap.add_argument("--sink-out")
    ap.add_argument("--mirror-out")
    ap.add_argument("--ckpt")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--modes", default="sync,async")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.run_child:
        _child(args)
        return

    import pyarrow.parquet as pq

    root = tempfile.mkdtemp(prefix="crash_probe_")
    try:
        feed_src = os.path.join(root, "src")
        os.makedirs(feed_src)
        table = pq.read_table(os.path.join(args.sf_dir, "events.parquet"))
        step = (table.num_rows + args.chunks - 1) // args.chunks
        for i in range(args.chunks):
            pq.write_table(
                table.slice(i * step, step),
                os.path.join(feed_src, f"{i:03d}.parquet"),
            )
        results = [
            _run_mode(m, feed_src, root) for m in args.modes.split(",")
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)

    for r in results:
        print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")
    ok = all(r["trees_match"] for r in results)
    print(json.dumps({"all_match": ok}), flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
