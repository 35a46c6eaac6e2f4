"""Semantic unit tests for the round-3 pipeline operators: chunking
boundaries, BM25 ranking shape, canonical-selection policy, k-means
invariants (the oracle-parity hash is covered by test_oracle_parity)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def tiny_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tinydocs")
    texts = [
        " ".join(f"w{j}" for j in range(100)),  # 100 tokens: chunks 64/52/4
        "a b",  # 2 tokens: one chunk
        "",  # empty: no chunks
    ]
    table = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def test_chunk_documents_boundaries(spark, tiny_docs_dir):
    from hedera_spark.operators.text_analysis import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents,
    )

    assert CHUNK_SIZE == 64 and CHUNK_STRIDE == 48
    rows = chunk_documents(spark, tiny_docs_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: starts 0/48/96 -> lengths 64, 52, 4; overlap of 16 tokens
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [r["n_tokens"] for r in c0] == [64, 52, 4]
    assert c0[0]["chunk_text"].split(" ") == [f"w{j}" for j in range(64)]
    assert c0[1]["chunk_text"].split(" ")[:16] == [f"w{j}" for j in range(48, 64)]
    assert c0[2]["chunk_text"] == "w96 w97 w98 w99"
    # doc 1 fits in one chunk; empty doc 2 yields none
    assert [r["n_tokens"] for r in by_doc[1]] == [2]
    assert 2 not in by_doc


def test_bm25_ranking_shape(spark):
    from hedera_spark.operators.ir import bm25_topk

    rows = bm25_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    scores = [r["score"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


@pytest.mark.slow
def test_dedup_keep_best_policy(spark):
    from pyspark.sql import functions as F

    from hedera_spark.operators.clusters import dedup_clusters, dedup_keep_best
    from hedera_spark.sources.tables import load_table

    best = dedup_keep_best(spark, SF_DIR).toPandas()
    clusters = dedup_clusters(spark, SF_DIR).toPandas()
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "n_chars")
        .toPandas()
        .set_index("doc_id")["n_chars"]
    )
    members = clusters.groupby("cluster_id")["doc_id"].apply(list)
    assert set(best["cluster_id"]) == set(members.index)
    for r in best.itertuples():
        m = members[r.cluster_id]
        assert r.best_doc_id in m
        assert r.n_members == len(m) >= 2
        lens = {d: docs[d] for d in m}
        assert r.max_chars == max(lens.values())
        # policy: longest text, smallest doc_id on ties
        expect = min(d for d, c in lens.items() if c == r.max_chars)
        assert r.best_doc_id == expect


def test_kmeans_invariants(spark):
    from pyspark.sql import functions as F

    from hedera_spark.operators.kmeans import KMEANS_K, kmeans_embeddings
    from hedera_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    # the oracle hardcodes 64 dims — pin the assumption
    assert emb.select(F.size("embedding").alias("d")).distinct().collect()[0]["d"] == 64
    out = kmeans_embeddings(spark, SF_DIR).toPandas()
    n_vecs = emb.count()
    # exactly one assignment per vector, nonneg distances, <= K clusters
    assert len(out) == n_vecs
    assert out["vec_id"].is_unique
    assert (out["dist2"] >= 0).all()
    assert out["cluster_id"].nunique() <= KMEANS_K
    # labels are the init centroid ids (the K smallest vec_ids)
    init_ids = set(
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(KMEANS_K).collect()
    )
    assert set(out["cluster_id"]) <= init_ids


def test_minhash_error_is_within_sketch_granularity(spark):
    """16 minhashes estimate Jaccard at +-1/16 granularity; the measured
    absolute error over every LSH candidate pair must stay within a few
    multiples of it (a blowout means the hash family lost independence —
    the regression this operator exists to surface)."""
    from hedera_spark.operators.dedup import minhash_error

    e = minhash_error(spark, SF_DIR).toPandas()
    assert len(e) > 0
    assert ((e["est_jaccard"] >= 0) & (e["est_jaccard"] <= 1)).all()
    assert ((e["jaccard"] >= 0) & (e["jaccard"] <= 1)).all()
    assert (e["abs_err"] <= 4 / 16).all()


def test_ann_recall_shape_and_multi_table_dominance(spark):
    """One recall row per query, recall in [0, 1], and the 4-table LSH
    candidate structure must not lose to single-table on mean recall —
    the knob ann_lsh_multi exists to turn."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.similarity import (
        LSH_TOPK,
        QUERY_MOD,
        ann_lsh_multi,
        ann_recall,
        ann_topk,
    )
    from hedera_spark.sources.tables import load_table

    r = ann_recall(spark, SF_DIR).toPandas()
    n_queries = (
        load_table(spark, SF_DIR, "embeddings")
        .where(F.col("vec_id") % QUERY_MOD == 0)
        .count()
    )
    assert len(r) == n_queries
    assert ((r["recall"] >= 0) & (r["recall"] <= 1)).all()
    assert (r["n_hits"] <= r["n_approx"]).all()

    # multi-table recall >= single-table recall (same exact baseline)
    exact3 = (
        ann_topk(spark, SF_DIR)
        .where(F.col("rk") <= LSH_TOPK)
        .select("q_id", "neighbor_id")
        .toPandas()
    )
    multi3 = ann_lsh_multi(spark, SF_DIR).select("q_id", "neighbor_id").toPandas()
    key = ["q_id", "neighbor_id"]
    hits_multi = len(exact3.merge(multi3, on=key))
    hits_single = int(r["n_hits"].sum())
    assert hits_multi >= hits_single


def test_bpe_train_and_apply_invariants(spark):
    """The merge table is the greedy argmax chain and the applied
    segmentation must losslessly reconstruct every word — checked against
    an independent pure-Python replay of the merge rules."""
    from hedera_spark.operators.bpe import BPE_MERGES, bpe_apply, bpe_train

    merges = bpe_train(spark, SF_DIR).toPandas().sort_values("step")
    assert list(merges["step"]) == list(range(1, BPE_MERGES + 1))
    assert (merges["left"] + merges["right"] == merges["merged"]).all()
    assert (merges["pair_count"] > 0).all()

    applied = bpe_apply(spark, SF_DIR).toPandas()
    rules = list(zip(merges["left"], merges["right"]))

    def replay(word: str) -> list[str]:
        syms = list(word)
        for l, r in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for row in applied.itertuples():
        toks = row.tokens.split(" ")
        assert "".join(toks) == row.w  # lossless
        assert row.n_tokens == len(toks)
        assert toks == replay(row.w)  # exact greedy semantics
