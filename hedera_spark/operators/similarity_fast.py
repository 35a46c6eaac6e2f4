"""Vectorized brute-force ANN — the Arrow/numpy statement of ann_topk.

`ann_topk` keeps scoring inside Catalyst expression folds: exact,
oracle-hashable, but per-element. When the corpus is huge the right kernel
is a BLAS matmul over Arrow batches: queries are tiny (broadcast), each
corpus batch computes a (batch x n_queries) similarity block, emits its
local top-k per query, and a final window reduces the per-batch candidates
— global top-k is a subset of the union of batch top-ks, so the two-stage
reduction is exact on distinct scores. Under exact score TIES at a batch's
local cut, argpartition keeps an arbitrary tied subset, so the final
tie-break can differ from ann_topk's (rounded cos, neighbor_id) order —
the agreement test allows one neighbor of slack for this.

This is the designed use of the Pandas-UDF escape hatch (numeric kernels
where expression evaluation is the bottleneck): ~10x the fold version at
sf0.1 and the gap widens with corpus size. Registered rows-only: BLAS
summation order differs from the sequential fold in the last float bits,
so hash-matching the SQL oracle would be fragile by construction; the
unit test instead checks agreement with ann_topk.

Scale: queries broadcast once; corpus partition-parallel; shuffle is
|batches| x |queries| x k candidate rows, independent of corpus width.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hedera_spark.operators.similarity import QUERY_MOD, TOPK
from hedera_spark.sources.tables import load_table

OUT_SCHEMA = "q_id long, neighbor_id long, cos double"


def ann_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized brute-force cosine top-k: broadcast queries, per-batch
    BLAS matmul + local top-k, exact global window reduction."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qpdf = emb.where(F.col("vec_id") % QUERY_MOD == 0).toPandas()
    q_ids = qpdf["vec_id"].to_numpy()
    qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, qm))

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        k = TOPK + 1  # +1 so dropping the self-match never starves a query
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ mat_q.T  # (batch, n_queries)
            nid = pdf["vec_id"].to_numpy()
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, n_queries)
            out = {
                "q_id": np.repeat(ids_q, kk),
                "neighbor_id": nid[top].T.ravel(),
                "cos": np.take_along_axis(sims, top, axis=0).T.ravel(),
            }
            yield pd.DataFrame(out)

    cands = emb.mapInPandas(score_batches, schema=OUT_SCHEMA).where(
        F.col("neighbor_id") != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        cands.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk")
    )
