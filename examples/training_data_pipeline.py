"""Beyond-reference: the LLM training-data pipeline chained end to end
over the documents table — exact dedup -> near-dup removal (MinHash
LSH) -> model-based quality gate -> benchmark decontamination ->
deterministic train/val/test split. Every stage is an oracle-checked
catalog operator; this example just chains them the way a curation
run would."""

from __future__ import annotations

from _common import SF_DIR, example_session


def main(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from rigatoni_spark.llm import contamination, dedup, minhash, textstats
    from rigatoni_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup (md5 hash-groupBy; min doc_id survives)
    docs = docs.join(
        dedup.exact_dedup(docs).select("doc_id"), "doc_id", "left_semi"
    )
    # 2. near-dup removal: keep only docs with no LSH-verified twin at
    #    a lower id
    dup_pairs = minhash.near_duplicates(
        docs.select("doc_id", "text"), threshold=0.7
    )
    docs = docs.join(
        dup_pairs.select(F.col("doc_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    # 3. quality gate (hashed-feature logit)
    keep = textstats.quality_logit(docs.select("doc_id", "text")).filter(
        F.col("keep") == 1
    )
    docs = docs.join(keep.select("doc_id"), "doc_id", "left_semi")
    # 4. decontamination vs the benchmark split
    clean = contamination.decontaminated_corpus(
        docs.select("doc_id", "text", "lang", "source", "n_chars")
    )
    n_clean = clean.count()
    print(f"{n0} docs -> {n_clean} after dedup+quality+decon")
    return {"input": n0, "clean": n_clean}


if __name__ == "__main__":
    main(example_session("example_training_data"), SF_DIR)
