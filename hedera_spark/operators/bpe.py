"""BPE tokenizer training — iterative greedy merges, the full trainer.

bpe_pair_stats (operators/ir.py) is ONE counting step; this module runs
the actual training loop: N times, count adjacent symbol pairs over the
word-frequency table (weighted by word frequency), merge the most
frequent pair everywhere, repeat. The output is the ordered merge table
— the artifact a tokenizer ships. Reference parity: the reference's
dictionary-building jobs (mapreduce/BuildDictionary.java) produce the
static-vocab analog; BPE is that job's subword-era successor and the
tokenizer-training step of an LLM data pipeline.

Determinism (why this operator can be value-hash oracled at all): counts
are integer sums, the argmax tie-breaks on the pair strings, and the
merge rewrite is string replace over delimiter-wrapped symbols — no
floating point anywhere. The DuckDB oracle unrolls the same N steps as
CTEs (the pagerank/kmeans pattern).

The symbol encoding: each word's symbol sequence is stored as the
concatenation of '|sym|' cells ('spark' -> '|s||p||a||r||k|'). Merging
pair (a,b) is then replace('|a||b|', '|ab|'), and because every cell
carries BOTH its delimiters, left-to-right non-overlapping replace is
exactly BPE's greedy merge rule — including consecutive runs:
'|a||a||a||a|' -> '|aa||aa|', never '|aa||a||a|' leftovers.

Scale (100 TB): the corpus is touched ONCE (word-frequency aggregate,
|vocab|-bounded — the same partial-agg argument as dictionary); every
iteration runs on the compact vocab table: one pair explode (bounded by
total word length), one integer aggregate, one broadcast of the single
winning pair. The per-iteration argmax row (3 scalars) is collected to
the driver — it IS the training artifact being built, the same bounded-
scalar class as the convergence counts in clusters.py/graph.py, not a
data pull; re-literalizing it also keeps the vocab lineage flat (no
2^N recompute DAG and no persist juggling across iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table

BPE_MERGES = 5


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts_from_els(with_els: DataFrame) -> DataFrame:
    """(l, r, total): adjacent symbol pairs weighted by word frequency.
    Pairs are enumerated inside the array context and exploded once."""
    pairs = with_els.select(
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN size(els) >= 2 THEN"
                " transform(sequence(1, size(els) - 1),"
                "   i -> struct(element_at(els, i) AS l,"
                "               element_at(els, i + 1) AS r))"
                " ELSE array() END"
            )
        ).alias("pr"),
    ).select("freq", F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
    return pairs.groupBy("l", "r").agg(F.sum("freq").alias("total"))


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered merge table after BPE_MERGES greedy iterations:
    (step, left, right, merged, pair_count). step is 1-based merge rank;
    pair_count is the weighted adjacency count that won that step."""
    vocab = _word_freqs(spark, sf_dir).select(
        "w",
        "freq",
        F.expr(
            "concat_ws('', transform(sequence(1, length(w)),"
            " i -> concat('|', substring(w, i, 1), '|')))"
        ).alias("syms"),
    )
    merges: list[tuple] = []
    for step in range(1, BPE_MERGES + 1):
        with_els = vocab.withColumn(
            "els", F.split(F.expr("trim(BOTH '|' FROM syms)"), r"\|\|")
        )
        counts = _pair_counts_from_els(with_els)
        best = counts.orderBy(
            F.desc("total"), F.asc("l"), F.asc("r")
        ).limit(1).collect()
        if not best:  # degenerate corpus: nothing left to merge
            break
        l, r, total = best[0]["l"], best[0]["r"], best[0]["total"]
        merges.append((step, l, r, l + r, total))
        vocab = vocab.withColumn(
            "syms",
            F.expr(
                f"replace(syms, '|{l}||{r}|', '|{l}{r}|')"
            ),
        )
    return spark.createDataFrame(
        merges, "step long, left string, right string, merged string, pair_count long"
    )


def bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained tokenizer applied back to the vocab: every word's
    final symbol segmentation after BPE_MERGES merges, with its symbol
    count — the (word → subword sequence) table a tokenizer runtime
    loads. Same merge chain as bpe_train, replayed declaratively."""
    vocab = _word_freqs(spark, sf_dir).select(
        "w",
        "freq",
        F.expr(
            "concat_ws('', transform(sequence(1, length(w)),"
            " i -> concat('|', substring(w, i, 1), '|')))"
        ).alias("syms"),
    )
    merge_rows = bpe_train(spark, sf_dir).collect()  # BPE_MERGES scalars
    for m in merge_rows:
        vocab = vocab.withColumn(
            "syms",
            F.expr(
                f"replace(syms, '|{m['left']}||{m['right']}|',"
                f" '|{m['merged']}|')"
            ),
        )
    return vocab.select(
        "w",
        "freq",
        F.concat_ws(
            " ", F.split(F.expr("trim(BOTH '|' FROM syms)"), r"\|\|")
        ).alias("tokens"),
        F.size(
            F.split(F.expr("trim(BOTH '|' FROM syms)"), r"\|\|")
        ).cast("long").alias("n_tokens"),
    )
