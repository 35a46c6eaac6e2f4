"""In-engine n-gram language-model training over the documents table.

doc_perplexity (text_analysis.py) scores documents under an add-one
bigram model; this module trains the model a real data-quality loop
would actually use: an interpolated Kneser-Ney bigram LM (Kneser &
Ney 1995; Chen & Goodman 1999's benchmark smoothing), whose continuation
probabilities are the standard fix for add-one's overestimate of
frequent-unigram continuations. The trained table IS the artifact a
CCNet-style perplexity filter loads. Reference parity: the reference's
experiments pipeline exports term/bigram statistics for offline LM work
(the RevisionBOW/term-stats family); here the estimation is first-class,
like bpe_train for tokenization.

Cross-engine determinism: every count (c12, c1fw, n1fw, n1bw, n1tot) is
an exact integer aggregate; the smoothed probability is ONE fixed dag of
double ops from those integers, rounded to 6 dp — no summation-order
exposure anywhere. Output order is a total order (c12 desc, w1, w2).

Scale (100 TB): bigram extraction is array-side per row (map-only); the
bigram agg is one partial-agg shuffle bounded by the observed bigram
vocabulary; the three statistics frames all derive from the bigram-TYPE
table (|types| rows, not corpus occurrences), joined back on w1/w2 —
shuffle joins the optimizer is free to broadcast when the vocab is
small; the only cross join is the 1-row type-total broadcast; the final
cut is a TakeOrdered LIMIT, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table

KN_DISCOUNT = 0.75
KN_MIN_COUNT = 3
KN_TOPK = 100


def kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities:
    P(w2|w1) = (max(c12 - D, 0) + D * N1+(w1,.) * Pcont(w2)) / c(w1,.),
    Pcont(w2) = N1+(., w2) / N1+(., .), D = 0.75. Output: the KN_TOPK
    most frequent bigrams (c12 >= KN_MIN_COUNT) with their counts and
    smoothed probabilities — (w1, w2, c12, p_kn)."""
    # rebalance off the parquet row-group layout before the CPU-dense
    # per-row bigram expansion (the text_repetition lesson: one row
    # group would pin the whole map phase to one core)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    bg = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN"
                " filter(transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> struct(element_at(split(text, ' '), i) AS w1,"
                "             element_at(split(text, ' '), i + 1) AS w2)),"
                " p -> p.w1 != '' AND p.w2 != '')"
                " ELSE array() END"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cab = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).persist()
    # all three KN statistics derive from the bigram-TYPE table
    fw = cab.groupBy("w1").agg(
        F.sum("c12").alias("c1fw"), F.count(F.lit(1)).alias("n1fw")
    )
    bw = cab.groupBy(F.col("w2")).agg(F.count(F.lit(1)).alias("n1bw"))
    tot = cab.agg(F.count(F.lit(1)).alias("n1tot"))
    return (
        cab.where(F.col("c12") >= KN_MIN_COUNT)
        .join(fw, "w1")
        .join(bw, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                (
                    F.greatest(F.col("c12") - F.lit(KN_DISCOUNT), F.lit(0.0))
                    + F.lit(KN_DISCOUNT)
                    * F.col("n1fw")
                    * (F.col("n1bw") / F.col("n1tot").cast("double"))
                )
                / F.col("c1fw"),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(KN_TOPK)
    )
