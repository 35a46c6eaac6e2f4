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
document AND fed through `_cooccur_tokens`, which (a) drops stop tokens
whose document frequency exceeds ANCHOR_STOP_DF_FRACTION of the corpus
(broadcast hot-set, cut map-side — the `_jaccard_pairs` pattern from
operators/dedup.py) and (b) keeps at most ANCHOR_DOC_TOKEN_CAP distinct
tokens per document, so per-doc pair fan-out is bounded by CAP²/2 no
matter how degenerate the document. The reference's entity-graph
scripts (pig/experimental/entityrelation.pig:34-45) co-join id-mapped
*entities*, a universe already bounded per doc; the cap is that bound
restated for a raw token universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table

# tokens in more than this fraction of all documents are stop tokens —
# they carry no co-mention signal and their pair fan-out is O(corpus²)
ANCHOR_STOP_DF_FRACTION = 0.9
# hard per-document bound on distinct tokens entering the self-join:
# caps pair fan-out at CAP²/2 per doc (a 10k-distinct-token doc would
# otherwise emit 5·10⁷ pairs)
ANCHOR_DOC_TOKEN_CAP = 256


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


def _cooccur_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, anchor) stream feeding the co-occurrence self-join, with
    the two scale cuts applied:

    1. Stop-token cut: tokens whose document frequency exceeds
       ANCHOR_STOP_DF_FRACTION of the corpus are collapsed into a
       single-row broadcast hot-set and removed map-side (array_contains)
       — no shuffle, the `_jaccard_pairs` df-cap pattern.
    2. Per-doc cap: row_number over (doc_id, deterministic md5 order)
       keeps at most ANCHOR_DOC_TOKEN_CAP tokens per document. The
       window's doc_id exchange is REUSED by the doc_id self-join that
       follows, so the cap adds a per-partition sort but no extra
       shuffle. md5 ordering (not df ordering) keeps the selection
       map-local — ranking by rarity would shuffle the full token
       stream on anchor just to break ties the stop-cut already decided.

    On the synthetic corpus (31-token vocab, max df ≈ 0.8·N) neither cut
    binds, so the oracle — which applies the identical cuts in SQL —
    stays value-exact; tests plant a stop token to prove the cut fires.
    """
    toks = _doc_tokens(spark, sf_dir, distinct=True).select("doc_id", "anchor")
    n_total = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    hot_row = (
        toks.groupBy("anchor")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n_total))
        .where(F.col("df") * 10 > F.col("n_total") * 9)
        .agg(F.collect_set("anchor").alias("hot"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.md5("anchor"), "anchor")
    return (
        toks.join(F.broadcast(hot_row))
        .where(~F.array_contains(F.col("hot"), F.col("anchor")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= ANCHOR_DOC_TOKEN_CAP)
        .select("doc_id", "anchor")
    )


def anchor_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence edges: unordered anchor pairs appearing in the same
    snapshot, with document frequency ≥ 5. Reference:
    pig/experimental/entityrelation.pig, temporalgraph.pig (entity-entity
    edges from co-mentions). Self-join is on doc_id over per-doc *distinct*
    tokens after the _cooccur_tokens stop/per-doc cuts (the cheapest
    correct blocking, with bounded fan-out). The join is merge-hinted
    (the dedup_simhash/minhash discipline): both sides then plan the
    identical doc-keyed exchange and ReusedExchange computes the token
    pipeline once — 25% faster at sf0.1, and the shape a corpus-scale
    build side forces anyway."""
    toks = _cooccur_tokens(spark, sf_dir)
    a = toks.select("doc_id", F.col("anchor").alias("a1"))
    b = toks.select("doc_id", F.col("anchor").alias("a2")).hint("merge")
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
    partial aggregates riding the existing shuffle (merge-hinted like
    anchor_cooccur, see there)."""
    toks = _cooccur_tokens(spark, sf_dir)
    a = toks.select("doc_id", F.col("anchor").alias("a1"))
    b = toks.select("doc_id", F.col("anchor").alias("a2")).hint("merge")
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
