"""Dedup cluster assignment — connected components over the near-dup pair
graph (the step after any pairwise dedup: pick one survivor per *cluster*,
not per pair, or transitive chains split wrongly).

Also the redirect-chain-resolution shape from the reference
(python/local_redirect.py follows redirect->target chains to a fixpoint):
same iterated min-label propagation, same convergence argument.

Algorithm: large-star/small-star-style min-label propagation — every node
repeatedly adopts the smallest label among itself and its neighbors until
fixpoint. Each iteration is one join + one aggregation (all DataFrame
ops); iterations = graph diameter, which for dedup graphs is tiny (near-
dup clusters are cliques-ish). The driver-side loop only checks a
convergence *count* — no data is collected.

Scale: edges shuffle on node id per iteration; persist the frontier label
table between iterations and unpersist the previous one (lineage would
otherwise grow exponentially — the classic iterative-Spark trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.operators.dedup import dedup_ngram_jaccard
from hedera_spark.operators.graph import _detach

MAX_ITERATIONS = 20


def connected_components(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(node, component) for every node in the edge list; component id =
    min node id reachable. Pure DataFrame iteration, deterministic."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    cached = labels
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("comp").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["node2"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                    "comp"
                ),
                (F.col("nmin") < F.col("comp")).cast("int").alias("changed"),
            )
            .persist()
        )
        # ONE action per iteration: the convergence agg also materializes
        # `updated` into the cache, so next iteration's labels (a pure
        # projection of it) needs no separate persist+count job.
        n_changed = updated.agg(F.sum("changed")).first()[0] or 0
        cached.unpersist()
        cached = updated
        labels = updated.select("node", "comp")
        if n_changed == 0:
            break
    else:
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ITERATIONS} "
            "iterations (graph diameter exceeds the cap); raise "
            "MAX_ITERATIONS rather than returning partial components"
        )
    # store the |V|-row label table off the frontier cache and release
    # the final frontier persist (graph._detach: no live persists left
    # behind for callers to leak)
    return _detach(labels, cached, sym)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the trigram-Jaccard pair graph: every
    clustered doc with its cluster id (min doc_id in the component) and a
    survivor flag. Docs with no near-dup partner are not emitted (they are
    their own cluster trivially)."""
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    comps = connected_components(pairs, "doc_a", "doc_b")
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).cast("int").alias("is_survivor"),
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection per near-dup cluster: for each
    connected component of the near-dup graph, keep the longest document
    (max n_chars, smallest doc_id on ties) — the "which copy survives"
    policy step a real dedup pipeline runs after cluster resolution
    (dedup_clusters picks min-id; production pipelines keep the
    best-quality member, and length is the standard proxy).

    Plan shape: cluster assignment (iterative, see dedup_clusters) joined
    once to the documents dim, then a single partial-agg groupBy with
    max_by over a (n_chars, -doc_id) struct — no window, no per-cluster
    sort."""
    from hedera_spark.sources.tables import load_table

    c = dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        c.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                "doc_id",
                F.struct(
                    F.col("n_chars").alias("c"), (-F.col("doc_id")).alias("t")
                ),
            ).alias("best_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the near-dup components — the dedup
    dashboard (how much of the corpus collapses, and into how many
    groups): (cluster_size → n_clusters, n_docs). Singleton clusters are
    the non-duplicated bulk; the tail of this histogram is what exact /
    minhash dedup actually reclaims.

    Scale: two integer partial aggs on top of dedup_clusters' audited
    iteration — the first bounded by |clusters|, the second by |distinct
    sizes| (≪ |clusters|)."""
    comp = dedup_clusters(spark, sf_dir)
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )
