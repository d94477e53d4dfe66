"""Beyond-reference: the tokenizer stage of a pretraining pipeline,
chained end to end over the documents table — BPE merge-table
induction on the full corpus -> corpus encoding to token ids ->
fertility audit by source (the compression-ratio table a tokenizer
change ships with) -> token-budget accounting. Every stage is an
oracle-checked catalog operator (`text_bpe_learn`, `text_bpe_encode`,
`text_bpe_fertility`); this example chains them the way a tokenizer
rollout would."""

from __future__ import annotations

from _common import SF_DIR, example_session


def main(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from rigatoni_spark.llm import textstats
    from rigatoni_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    # 1. learn the merge table (driver-held, bounded — the artifact a
    #    real run would persist next to the model config)
    merges = textstats.bpe_learn(docs, n_merges=8)
    print("merge table:")
    for m in merges:
        print(
            f"  {m['merge_rank']:>2}: {m['left_sym']!r} + "
            f"{m['right_sym']!r} -> {m['merged']!r} "
            f"({m['n_occurrences']} occurrences)"
        )

    # 2. encode the corpus to the token stream a trainer would consume
    stream = textstats.bpe_encode(docs, merges)
    n_tokens = stream.count()
    vocab = stream.select("token_id").distinct().count()

    # 3. fertility audit: chars/token by source — a source whose
    #    fertility is an outlier is one the tokenizer serves badly
    fert = textstats.bpe_fertility(docs, merges)
    worst = fert.orderBy(F.col("chars_per_token_x100").desc()).first()
    print(
        f"{n_tokens} tokens over {vocab} vocab entries; worst-served "
        f"source: {worst['source']} at "
        f"{worst['chars_per_token_x100'] / 100:.2f} chars/token"
    )
    return {
        "merges": len(merges),
        "tokens": n_tokens,
        "vocab": vocab,
        "sources_audited": fert.count(),
    }


if __name__ == "__main__":
    main(example_session("example_tokenizer"), SF_DIR)
