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
independent of corpus size. The integer product sums are carried as
DECIMAL(38,0) so they cannot overflow at any corpus size. The power
iteration then runs driver-side on the BOUNDED d*d integer cell table
(the markov_attribution precedent — a 4096-cell matrix has no business
occupying chained distributed stages; measured 7.5 s → ~2 s at sf0.1),
with every rounding replicating Spark's HALF_UP so the unrolled DuckDB
oracle is unchanged.
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
    )
    # BOUNDED driver pull: d*d = 4096 integer cells regardless of corpus
    # size (the markov_attribution precedent) — the power iteration is
    # exact-integer matrix-vector algebra on them, which has no business
    # occupying PCA_ITERATIONS chained distributed stages. Every rounding
    # below replicates Spark's Round (BigDecimal HALF_UP on the double's
    # shortest decimal form) so the unrolled DuckDB oracle still matches.
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def _half_up(val: float, digits: int) -> float:
        if math.isnan(val) or math.isinf(val):
            return val
        q = Decimal(1).scaleb(-digits)
        return float(Decimal(repr(val)).quantize(q, rounding=ROUND_HALF_UP))

    cov_rows = cov.collect()
    if not cov_rows:
        return spark.createDataFrame(
            [],
            "dim long, loading double, eigenvalue double, explained_share double",
        )
    cu = {(r["i"], r["j"]): r["cu"] for r in cov_rows}
    d = max(i for i, _ in cu) + 1
    v0u = int(_half_up(float(_MICRO) / math.sqrt(float(d)), 0))
    vu = [v0u] * d
    for _ in range(PCA_ITERATIONS):
        wu = [
            sum(cu.get((i, j), 0) * vu[j] for j in range(d)) for i in range(d)
        ]
        nrm = math.sqrt(float(sum(w * w for w in wu)))
        vu = [int(_half_up(float(w) / nrm * float(_MICRO), 0)) for w in wu]
    lam = _half_up(
        float(
            sum(
                vu[i] * cu.get((i, j), 0) * vu[j]
                for i in range(d)
                for j in range(d)
            )
        )
        / float(_MICRO) ** 3,
        6,
    )
    trace = _half_up(
        float(sum(cu.get((i, i), 0) for i in range(d))) / float(_MICRO), 6
    )
    data = [
        (
            j,
            _half_up(float(vu[j]) / float(_MICRO), 6),
            lam,
            _half_up(lam / trace, 6),
        )
        for j in range(d)
    ]
    return spark.createDataFrame(
        data,
        "dim long, loading double, eigenvalue double, explained_share double",
    )
