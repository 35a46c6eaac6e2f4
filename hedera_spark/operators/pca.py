"""Principal-component training over the embeddings table.

The trained-structure family (kmeans_embeddings, bpe_train, ann_pq's
codebook, quality_classifier) covers clustering, tokenization,
quantization, and supervised scoring; this module adds the remaining
classic in-engine trainer: the top principal component of the embedding
cloud, with its eigenvalue and explained-variance share. It is the
whitening/compression primitive a curation pipeline runs before
PQ/SQ quantization (PCA-then-PQ is the standard OPQ-lite recipe) and
the one-number answer to "is this embedding space collapsed?"
(explained_share → 1 means the space is rank-1 and ANN recall will be
terrible). Reference parity: the reference exports BOW/feature matrices
for exactly this kind of offline analysis (experiments RevisionBOW
family); here the decomposition is first-class, like kmeans.

Cross-engine determinism (the same discipline as kmeans.py/graph.py):
per-dimension means are rounded to 6 dp; centered coordinates are
quantized to EXACT integer micro-units; every covariance cell is an
exact integer sum divided once and rounded to 6 dp; each power-iteration
step re-rounds the vector to 6 dp after normalizing, so partial-agg
summation order can never leak into the result. The DuckDB oracle
unrolls the same PCA_ITERATIONS matrix-vector products as CTEs.

Scale (100 TB): the covariance expansion is map-side (each row emits its
own d*d products via two chained generators) and partially aggregated
before the ONLY data-sized shuffle, whose post-agg size is d*d cells —
independent of corpus size. Everything after (power iteration, Rayleigh
quotient) runs on d*d-row frames: broadcast-sized, no driver collect.
The integer product sums are carried as DECIMAL(38,0) so they cannot
overflow at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table

PCA_ITERATIONS = 3
_MICRO = 1_000_000  # micro-unit quantization for exact integer sums


def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embeddings table via exact
    covariance + PCA_ITERATIONS rounded power-iteration steps from the
    uniform start vector. Output: one row per dimension —
    (dim, loading, eigenvalue, explained_share), eigenvalue = Rayleigh
    quotient v'Cv, explained_share = eigenvalue / trace(C)."""
    # rebalance off the parquet row-group layout: the d*d per-row product
    # expansion is CPU-dense and would otherwise run on one core per row
    # group (the text_repetition lesson)
    e = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
    )
    # per-dimension rounded means + corpus size, as a 1-row broadcast
    mn = (
        e.select(F.posexplode("emb").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.round(F.avg("x"), 6).alias("m"))
    )
    stats = mn.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("marr"),
    ).crossJoin(e.agg(F.count(F.lit(1)).alias("n")))
    # centered integer micro-unit coordinates (exact from here on)
    cq = e.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        "n",
        F.zip_with(
            "emb",
            "marr",
            lambda x, m: F.round((x - m) * _MICRO, 0).cast("long"),
        ).alias("xq"),
    )
    # map-side d*d product expansion, partial-agg shuffle of d*d cells
    cells = (
        cq.select("n", F.posexplode("xq").alias("i", "xi"), "xq")
        .select("n", "i", "xi", F.posexplode("xq").alias("j", "xj"))
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("xi") * F.col("xj")).cast("decimal(38,0)")).alias("s"),
            F.first("n").alias("n"),
        )
    )
    # covariance cells kept as EXACT integer micro-units (cu = c * 1e6):
    # round-to-6-decimal doubles here would make every matrix-vector
    # product a sum of exact decimal midpoints (c * 0.125 has 1.25e-7
    # granularity) whose HALF_UP rounding flips with summation order —
    # integers cannot tie
    cov = cells.select(
        "i",
        "j",
        F.round(
            F.col("s").cast("double") / F.col("n") / F.lit(float(_MICRO)), 0
        )
        .cast("long")
        .alias("cu"),
    ).persist()
    # power iteration from the uniform unit vector 1/sqrt(d), carried in
    # integer micro-units (v0 = 1/8 exactly for d = 64); the dim list
    # and d both come from the 64-row means frame, never the corpus
    nd = mn.agg(
        F.round(
            F.lit(float(_MICRO)) / F.sqrt(F.count(F.lit(1)).cast("double")), 0
        )
        .cast("long")
        .alias("v0u")
    )
    v = (
        mn.select(F.col("pos").alias("j"))
        .crossJoin(F.broadcast(nd))
        .select("j", F.col("v0u").alias("vu"))
    )
    for _ in range(PCA_ITERATIONS):
        # w = C v in exact 1e-12 units; renormalize via the one double
        # ratio w/|w| (no systematic decimal midpoints) back to µ-units
        w = (
            cov.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("cu") * F.col("vu")).alias("wu"))
        )
        nrm = w.agg(
            F.sqrt(
                F.sum(F.col("wu").cast("decimal(38,0)") * F.col("wu")).cast(
                    "double"
                )
            ).alias("nrm")
        )
        v = w.crossJoin(F.broadcast(nrm)).select(
            F.col("i").alias("j"),
            F.round(F.col("wu") / F.col("nrm") * F.lit(float(_MICRO)), 0)
            .cast("long")
            .alias("vu"),
        )
    # Rayleigh quotient v'Cv (exact 1e-18-unit integer sum) and trace(C)
    lam = (
        cov.join(v.select(F.col("j"), F.col("vu").alias("vj")), "j")
        .join(
            v.select(F.col("j").alias("i"), F.col("vu").alias("vi")),
            "i",
        )
        .agg(
            F.round(
                F.sum(
                    F.col("vi").cast("decimal(38,0)")
                    * F.col("cu")
                    * F.col("vj")
                ).cast("double")
                / F.lit(float(_MICRO) ** 3),
                6,
            ).alias("eigenvalue")
        )
    )
    tr = cov.where(F.col("i") == F.col("j")).agg(
        F.round(F.sum("cu").cast("double") / F.lit(float(_MICRO)), 6).alias(
            "trace"
        )
    )
    return (
        v.select(
            F.col("j").cast("long").alias("dim"),
            F.round(F.col("vu").cast("double") / F.lit(float(_MICRO)), 6).alias(
                "loading"
            ),
        )
        .crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(tr))
        .select(
            "dim",
            "loading",
            "eigenvalue",
            F.round(F.col("eigenvalue") / F.col("trace"), 6).alias(
                "explained_share"
            ),
        )
    )
