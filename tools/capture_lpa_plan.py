"""Capture the LAZY pre-_detach plan of graph_communities' LPA rounds.

graph_communities returns a localCheckpoint-ed frame, so its public plan
is a checkpoint scan; the exchange structure of the rounds themselves is
only visible on the label chain before materialization. This builds that
chain both ways — the pre-r8 two-groupBy form and the r8 fused
repartition("src") form — and writes their formatted plans, so the
2-exchanges-per-round -> 1 claim is checkable from the committed files.

Usage: python tools/capture_lpa_plan.py [--sf-dir .../sf0.1]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def build_labels(spark, sf_dir: str, fused: bool):
    from pyspark.sql import functions as F

    from hedera_spark.operators.anchors import anchor_cooccur
    from hedera_spark.operators.graph import LPA_ITERATIONS

    edges = anchor_cooccur(spark, sf_dir).select("a1", "a2", "n_docs")
    sym = edges.union(
        edges.select(F.col("a2").alias("a1"), F.col("a1").alias("a2"), "n_docs")
    ).select(
        F.col("a1").alias("src"), F.col("a2").alias("dst"), F.col("n_docs").alias("w")
    ).persist()
    sym.count()  # materialize so every round's plan reads the cache,
    # exactly as the real operator's persisted sym does
    labels = sym.select(F.col("src").alias("anchor")).distinct().withColumn(
        "label", F.col("anchor")
    )
    for _ in range(LPA_ITERATIONS):
        joined = sym.join(labels, sym["dst"] == labels["anchor"])
        if fused:
            joined = joined.repartition("src")
        votes = joined.groupBy(F.col("src"), F.col("label")).agg(
            F.sum("w").alias("sum_w")
        )
        labels = votes.groupBy(F.col("src").alias("anchor")).agg(
            F.min_by(
                "label", F.struct((-F.col("sum_w")).alias("nw"), F.col("label"))
            ).alias("label")
        )
    return labels.select("anchor", F.col("label").alias("community"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from hedera_spark.session import get_spark

    spark = get_spark("hedera_spark-lpa-plan")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = pathlib.Path(__file__).resolve().parent.parent / "plans" / "r08"
    out_dir.mkdir(parents=True, exist_ok=True)
    for fused, suffix in ((False, "before"), (True, "after")):
        df = build_labels(spark, args.sf_dir, fused)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"graph_communities_lpa_{suffix}.txt"
        path.write_text(plan)
        n_ex = plan.count("+- Exchange")
        print(f"wrote {path} (shuffle Exchange nodes in tree: {n_ex})")


if __name__ == "__main__":
    main()
