"""Beyond-reference: the CCNet-style LM perplexity filter, end to end
in-engine — train a stupid-backoff trigram LM on the corpus
(`lm_count_tables`: three Zipf count tables, Brants et al. 2007),
score every document (`lm_surprisal`: integer-exact count-ratio
backoff), band the corpus against its mean (`lm_gate`: head / middle /
tail), and show the train-offline / score-online split the production
deployment uses (`lm_surprisal_stream` scores a document stream via
stream-static joins against the trained tables — here demonstrated
batch-side by scoring a held-out slice against a model trained on the
rest).

CCNet (Wenzek et al. 2020) keeps the head+middle perplexity bands and
drops the tail; the banding below is the same topology with the
integer surprisal score standing in for KenLM perplexity.
"""

from __future__ import annotations

from _common import SF_DIR, example_session


def main(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from rigatoni_spark.llm import ngram_lm
    from rigatoni_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    # 1. train + inspect: the model head an artifact export would ship
    head = ngram_lm.lm_top_trigrams(docs, k=5).collect()
    print("model head (top trigrams):")
    for r in head:
        print(
            f"  '{r['t2']} {r['t1']} {r['t']}': c3={r['c3']} "
            f"score_x1m={r['score_x1m']}"
        )

    # 2. gate the corpus: head/middle/tail bands against the corpus
    #    mean — a production run keeps head+middle
    bands = {
        r["band"]: r["n"]
        for r in ngram_lm.lm_gate(docs)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(bands.values())
    kept = bands.get("head", 0) + bands.get("middle", 0)
    print(f"bands: {bands} -> keep {kept}/{total}")

    # 3. train-offline / score-online: score a held-out slice against a
    #    model trained on the REST (the deployment topology; the
    #    streaming twin s7_stream_lm_surprisal runs this same scoring
    #    over a live document stream)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    held_out = docs.filter(F.col("doc_id") % 10 == 0)
    scored = ngram_lm.lm_surprisal_stream(held_out, train)
    held_mean = scored.agg(
        F.expr("sum(lm_score_x1m) div count(1)").alias("m")
    ).first()["m"]
    n_held = scored.count()
    print(
        f"held-out slice: {n_held} docs scored against the {total - n_held}-doc "
        f"model, mean score_x1m={held_mean}"
    )
    return {
        "bands": bands,
        "kept": kept,
        "total": total,
        "held_out_docs": n_held,
        "held_out_mean": int(held_mean),
    }


if __name__ == "__main__":
    main(example_session("example_lm_perplexity_gate"), SF_DIR)
