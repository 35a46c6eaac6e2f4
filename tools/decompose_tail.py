"""Per-stage decomposition of the >4 s registry-tail queries (r7 VERDICT
"Next round" #7): times each query's building blocks with the noop sink
(guide §1.4) so designed exact/grid cost separates from incidental
recompute. Run on an idle box for absolute numbers; ratios are
meaningful under load too.

Usage: python tools/decompose_tail.py [--sf-dir .../sf0.1]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _t(spark, label, df):
    from hedera_spark.session import reset_session_state

    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"  {label:42s} {dt:7.3f}s")
    spark.sparkContext.setJobDescription(None)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    sf = args.sf_dir

    from pyspark.sql import functions as F

    from hedera_spark.registry import QUERIES
    from hedera_spark.session import get_spark, reset_session_state

    spark = get_spark("hedera_spark-tail-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    def full(name):
        reset_session_state(spark)
        spark.sparkContext.setJobDescription(f"{name}: full")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf).collect()
        dt = time.perf_counter() - t0
        print(f"  {name + ': full (collect)':42s} {dt:7.3f}s")
        spark.sparkContext.setJobDescription(None)

    print("== bm25_param_sweep")
    from hedera_spark.operators.anchors import _doc_tokens
    from hedera_spark.operators.ir import BM25_QUERY_TERMS, bow

    reset_session_state(spark)
    _t(spark, "bow(corpus) -> query-term tf", bow(spark, sf).where(F.col("term").isin(BM25_QUERY_TERMS)))
    _t(spark, "doc lengths (corpus pass)", _doc_tokens(spark, sf, distinct=False).groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")))
    full("bm25_param_sweep")

    print("== sparse_cosine_topk")
    reset_session_state(spark)
    _t(spark, "bow(corpus) full", bow(spark, sf))
    full("sparse_cosine_topk")

    print("== spell_candidates")
    reset_session_state(spark)
    _t(spark, "vocab df agg (corpus pass)", _doc_tokens(spark, sf, distinct=True).groupBy("anchor").agg(F.count(F.lit(1)).alias("df")))
    full("spell_candidates")

    print("== ann_pareto")
    from hedera_spark.operators.similarity import _exact_top3

    reset_session_state(spark)
    _t(spark, "_exact_top3 (brute-force ground truth)", _exact_top3(spark, sf))
    full("ann_pareto")


if __name__ == "__main__":
    main()
