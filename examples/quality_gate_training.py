"""Beyond-reference: the quality-classifier loop of a pretraining
pipeline, closed in-engine — label a seed set, train the gate's weight
vector (`train_qlf_weights`, centered NB log-count ratio over the
gate's exact hashed unigram+bigram features), export it as the
(bucket, weight) parquet artifact (`write_qlf_weights`), and run the
corpus through `quality_logit(weights_path=...)` — the same
train -> artifact -> gate topology a fastText/DCLM-style filter ships
with, minus any external training stack.

The seed labels here are heuristic (long, low-repetition docs as
keep-class exemplars; short ones as drop-class), standing in for the
human/LLM labels a real run would use — the machinery is identical.
"""

from __future__ import annotations

from _common import SF_DIR, example_session, workdir


def main(spark, sf_dir: str) -> dict:
    import os

    from pyspark.sql import functions as F

    from rigatoni_spark.llm import textstats
    from rigatoni_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    # 1. heuristic seed labels: the longest docs are keep-class
    #    exemplars, the shortest are drop-class (a real run would feed
    #    curated labels; the trainer only needs (text, label))
    labeled = docs.select(
        "text",
        F.when(F.length("text") >= 400, F.lit(1))
        .when(F.length("text") < 150, F.lit(0))
        .alias("label"),
    ).filter(F.col("label").isNotNull())
    n_pos = labeled.filter("label = 1").count()
    n_neg = labeled.filter("label = 0").count()
    print(f"seed set: {n_pos} keep / {n_neg} drop exemplars")

    # 2. train: one distributed feature-count agg, log-odds in-driver
    dim = 2048
    weights = textstats.train_qlf_weights(labeled, dim=dim)
    nonzero = sum(1 for w in weights if w != 0)

    # 3. export the artifact the gate consumes (the deployable file)
    artifact = os.path.join(workdir("qlf_artifact_"), "weights.parquet")
    textstats.write_qlf_weights(spark, artifact, weights)

    # 4. score the WHOLE corpus with the trained artifact, then pick
    #    the operating threshold from the class means — the calibration
    #    step every deployed gate does (threshold 0 would keep nearly
    #    everything here: keep-class features dominate this corpus)
    gated = textstats.quality_logit(
        docs, weights_path=artifact, weights_dim=dim
    ).cache()
    total = gated.count()
    sep = (
        gated.join(
            docs.select("doc_id", F.length("text").alias("n")), "doc_id"
        )
        .select(
            F.avg(F.when(F.col("n") >= 400, F.col("logit_x10k"))).alias("hi"),
            F.avg(F.when(F.col("n") < 150, F.col("logit_x10k"))).alias("lo"),
        )
        .first()
    )
    print(f"mean logit: keep-class {sep['hi']:.0f} vs drop-class {sep['lo']:.0f}")
    threshold = int((sep["hi"] + sep["lo"]) / 2)
    kept = gated.filter(F.col("logit_x10k") >= threshold).count()
    gated.unpersist()
    print(
        f"trained gate ({nonzero}/{dim} non-zero buckets) at "
        f"threshold_x10k={threshold} keeps {kept}/{total} documents"
    )
    return {
        "pos": n_pos,
        "neg": n_neg,
        "nonzero_buckets": nonzero,
        "kept": kept,
        "total": total,
        "separates": bool(sep["hi"] > sep["lo"]),
    }


if __name__ == "__main__":
    main(example_session("example_quality_gate_training"), SF_DIR)
