"""Group B — anchor / link analytics (SURVEY.md §2.B).

In Hedera, anchors are wiki-link texts mined from revision markup
(reference: mapreduce/CountAnchor.java, Json2Anchor.java,
ExtractTemporalAnchorText.java, FastExtractTemporalAnchorText.java and
pig/experimental/entityrelation.pig). Here the anchor universe is the token
stream of `documents.text`; extraction is a JVM-side split + explode
(flatMap), so the hot path never leaves whole-stage codegen.

Scale notes (100 TB): token explode multiplies rows ~|doc| but the
follow-up aggregations are partial (map-side combine) by construction.
`anchor_cooccur` is the one quadratic operator — it is blocked per
document and, at scale, must be preceded by a frequency cut (drop
stop-tokens / keep top-K per doc); we apply a distinct-per-doc reduction
first so the self-join fans out on (doc, token) not raw occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table


def _doc_tokens(spark: SparkSession, sf_dir: str, distinct: bool) -> DataFrame:
    """(doc_id, source, anchor) token stream; optionally distinct per doc.
    Per-doc distinctness is row-local: array_distinct before the explode,
    never a dropDuplicates shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    if distinct:
        toks = F.array_distinct(toks)
    return docs.select(
        "doc_id",
        "source",
        F.explode(toks).alias("anchor"),
    ).where(F.col("anchor") != "")


def anchor_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global anchor frequency. Reference: mapreduce/CountAnchor.java
    (map: emit anchor, reduce: sum)."""
    return (
        _doc_tokens(spark, sf_dir, distinct=False)
        .groupBy("anchor")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def anchor_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc, anchor) pairs — the link graph's edge list.
    Reference: mapreduce/Json2Anchor.java (emit (rev, anchor) pairs)."""
    return _doc_tokens(spark, sf_dir, distinct=True).select("doc_id", "anchor")


def temporal_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor validity span: first/last snapshot where the anchor appears +
    number of snapshots containing it. Reference:
    mapreduce/ExtractTemporalAnchorText.java, FastExtractTemporalAnchorText.java
    (anchor text with temporal extent)."""
    return (
        _doc_tokens(spark, sf_dir, distinct=True)
        .groupBy("anchor")
        .agg(
            F.min("doc_id").alias("first_seen"),
            F.max("doc_id").alias("last_seen"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def temporal_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct title token (leading token of each snapshot) with first-seen
    snapshot and frequency. Reference: mapreduce/ExtractTemporalTitle.java
    (distinct titles with temporal metadata)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.split(F.col("text"), " ").getItem(0).alias("title_tok"),
            "doc_id",
        )
        .groupBy("title_tok")
        .agg(F.min("doc_id").alias("first_seen"), F.count(F.lit(1)).alias("n_docs"))
    )


def anchor_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence edges: unordered anchor pairs appearing in the same
    snapshot, with document frequency ≥ 5. Reference:
    pig/experimental/entityrelation.pig, temporalgraph.pig (entity-entity
    edges from co-mentions). Self-join is on doc_id over per-doc *distinct*
    tokens (the cheapest correct blocking)."""
    toks = _doc_tokens(spark, sf_dir, distinct=True)
    a = toks.select("doc_id", F.col("anchor").alias("a1"))
    b = toks.select("doc_id", F.col("anchor").alias("a2"))
    return (
        a.join(b, "doc_id")
        .where(F.col("a1") < F.col("a2"))
        .groupBy("a1", "a2")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 5)
    )


def anchor_cooccur_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence edges with validity spans: each unordered anchor pair
    carries the first/last snapshot where the co-mention appears — the
    temporal edge list of pig/experimental/temporalgraph.pig (entity-entity
    edges with time extents) on top of anchor_cooccur's blocking. Same
    single self-join + one aggregation; the spans are two extra min/max
    partial aggregates riding the existing shuffle."""
    toks = _doc_tokens(spark, sf_dir, distinct=True)
    a = toks.select("doc_id", F.col("anchor").alias("a1"))
    b = toks.select("doc_id", F.col("anchor").alias("a2"))
    return (
        a.join(b, "doc_id")
        .where(F.col("a1") < F.col("a2"))
        .groupBy("a1", "a2")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_seen"),
            F.max("doc_id").alias("last_seen"),
        )
        .where(F.col("n_docs") >= 5)
    )


def anchor_from_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end markup→anchor pipeline: synthesize [[target]] /
    [[target|alias]] wiki links over the corpus (the synthetic test corpus
    carries no markup, so a deterministic md5-keyed subset of tokens is
    wrapped), mine the targets back out with functions.extract_links, and
    count global anchor frequency — mapreduce/Json2Anchor.java +
    mapreduce/CountAnchor.java composed end-to-end. The wrap/extract round
    trip exercises the alias-stripping regexp exactly as wiki markup
    would; everything stays in whole-stage codegen (regexp + explode)."""
    from hedera_spark import functions as HF

    docs = load_table(spark, sf_dir, "documents")
    marked = docs.select(
        "doc_id",
        F.expr(
            "concat_ws(' ', transform(split(text, ' '), t -> CASE"
            " WHEN t = '' THEN t"
            " WHEN substring(md5(t), 32, 1) IN ('0','1','2','3')"
            " THEN concat('[[', t, '|alias]]')"
            " WHEN substring(md5(t), 32, 1) IN ('4','5','6','7')"
            " THEN concat('[[', t, ']]')"
            " ELSE t END))"
        ).alias("markup"),
    )
    return (
        marked.select(F.explode(HF.extract_links("markup")).alias("anchor"))
        .groupBy("anchor")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def id2title(spark: SparkSession, sf_dir: str) -> DataFrame:
    """id → display-name resolution across the dim chain
    (customer→nation→region), Hedera's id↔title / redirect-resolution task.
    Reference: python/id2title.py, python/local_redirect.py,
    mapreduce/Anchor2Freebase.java (mapping ids to canonical entities).
    Dims are broadcast — no shuffle at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
