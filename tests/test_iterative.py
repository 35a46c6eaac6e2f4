"""Unit tests for the non-relational operators: chunk diffs (difflib) and
connected-component clustering."""

from __future__ import annotations


def test_rev_diff_chunks_opcodes(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "p", "en", 7),
            (2, "a x c", "p", "en", 5),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.diff_chunks import rev_diff_chunks

    chunks = sorted(
        rev_diff_chunks(spark, str(out)).collect(), key=lambda r: r["a_text"]
    )
    # 'b'->'x' is a CHANGE, trailing 'd' removed is a DELETE
    ops = {(r["op"], r["a_text"], r["b_text"]) for r in chunks}
    assert ("CHANGE", "b", "x") in ops
    assert ("DELETE", "d", "") in ops
    assert all(r["prev_id"] == 1 and r["doc_id"] == 2 for r in chunks)


def test_rev_diff_chunks_replays_direct_difflib(spark):
    """The pair-spread mapInPandas rewrite must emit EXACTLY the chunks a
    direct per-page difflib pass produces on the real corpus (replay
    equality with the r4 groupBy-applyInPandas output, which computed the
    same opcodes per consecutive pair)."""
    import difflib

    from tests.conftest import SF_DIR

    from hedera_spark.operators.diff_chunks import rev_diff_chunks
    from hedera_spark.sources.tables import load_table

    got = {
        (r["page_id"], r["doc_id"], r["prev_id"], r["op"], r["a_text"], r["b_text"])
        for r in rev_diff_chunks(spark, SF_DIR).collect()
    }
    docs = sorted(
        load_table(spark, SF_DIR, "documents")
        .select("source", "doc_id", "text")
        .collect(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    want = set()
    prev = {}
    ops = {"replace": "CHANGE", "delete": "DELETE", "insert": "INSERT"}
    for r in docs:
        if r["source"] in prev:
            pid, ptoks = prev[r["source"]]
            toks = r["text"].split(" ")
            sm = difflib.SequenceMatcher(a=ptoks, b=toks, autojunk=False)
            for op, i1, i2, j1, j2 in sm.get_opcodes():
                if op != "equal":
                    want.add(
                        (
                            r["source"],
                            r["doc_id"],
                            pid,
                            ops[op],
                            " ".join(ptoks[i1:i2]),
                            " ".join(toks[j1:j2]),
                        )
                    )
        prev[r["source"]] = (r["doc_id"], r["text"].split(" "))
    assert got == want


def test_rev_diff_chunks_megapage_has_no_single_task_group(spark, tmp_path):
    """A planted mega-page (one page, 20k revisions) must diff with its
    pairs SPREAD across partitions — the plan may not contain the
    groupBy-applyInPandas shape (FlatMapGroupsInPandas) whose per-page
    pandas group OOMs a single task at 100x history sizes; the pair
    repartition must be present instead, and the output must still be
    the per-pair edit script."""
    n = 20_000
    rows = [(i, f"tok{i} common tail", "megapage", "en", 10) for i in range(1, n + 1)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mega"
    docs.repartition(8).write.parquet(str(out / "documents.parquet"))

    from hedera_spark.operators.diff_chunks import rev_diff_chunks
    from hedera_spark.plans import formatted_plan

    df = rev_diff_chunks(spark, str(out))
    plan = formatted_plan(df)
    assert "FlatMapGroupsInPandas" not in plan  # no per-page pandas group
    assert "MapInPandas" in plan
    assert "hashpartitioning(source" in plan  # the pair spread exchange
    chunks = df.collect()
    # every consecutive pair changes exactly its leading token
    assert len(chunks) == n - 1
    assert all(r["op"] == "CHANGE" for r in chunks)
    sample = next(r for r in chunks if r["doc_id"] == 2)
    assert (sample["a_text"], sample["b_text"]) == ("tok1", "tok2")


def test_connected_components_chain(spark):
    from hedera_spark.operators.clusters import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    comps = {
        r["node"]: r["comp"]
        for r in connected_components(edges, "doc_a", "doc_b").collect()
    }
    # chain 1-2-3 collapses to min label 1 (requires >1 iteration); 5-6 -> 5
    assert comps == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_ann_topk_fast_agrees_with_fold_version(spark):
    from tests.conftest import SF_DIR

    from hedera_spark.operators.similarity import ann_topk
    from hedera_spark.operators.similarity_fast import ann_topk_fast

    slow = ann_topk(spark, SF_DIR).collect()
    fast = ann_topk_fast(spark, SF_DIR).collect()
    by_q_slow, by_q_fast = {}, {}
    for r in slow:
        by_q_slow.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    for r in fast:
        by_q_fast.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    assert set(by_q_slow) == set(by_q_fast)
    for q, neigh in by_q_slow.items():
        # identical neighbor sets modulo float-tie reorderings at the cut
        assert len(neigh & by_q_fast[q]) >= len(neigh) - 1


def test_ann_ivf_structure_and_positive_recall(spark):
    from tests.conftest import SF_DIR

    from hedera_spark.operators.similarity import IVF_TOPK, ann_ivf, ann_topk

    ivf = ann_ivf(spark, SF_DIR).collect()
    assert ivf, "every query shares its cell with >= 1 vector"
    by_q = {}
    for r in ivf:
        by_q.setdefault(r["q_id"], []).append(r)
    exact = ann_topk(spark, SF_DIR).collect()
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q, rows in by_q.items():
        assert len(rows) <= IVF_TOPK
        ranks = sorted(r["rk"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert all(r["q_id"] != r["neighbor_id"] for r in rows)
        total += len(rows)
        hits += len({r["neighbor_id"] for r in rows} & exact_by_q.get(q, set()))
    # approximate structure must still find some true neighbors overall
    assert hits > 0, f"IVF recall is zero across {total} results"


def test_sq_reconstruction_and_recall(spark):
    """Scalar quantization must reconstruct within the per-dim step size
    (rng/255/2 per coordinate) and the SQ probe must recover most of the
    exact top-3 (full corpus scanned — misses are pure rounding)."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.similarity import _sq_recon, sq_recall
    from hedera_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = {r["vec_id"]: r["embedding"] for r in load_table(spark, sf, "embeddings").collect()}
    recon = {r["vec_id"]: r["remb"] for r in _sq_recon(spark, sf).collect()}
    assert set(recon) == set(emb)
    dims = len(next(iter(emb.values())))
    mins = [min(v[i] for v in emb.values()) for i in range(dims)]
    maxs = [max(v[i] for v in emb.values()) for i in range(dims)]
    for vid in list(emb)[:50]:
        for i in range(dims):
            step = (maxs[i] - mins[i]) / 255.0
            assert abs(recon[vid][i] - emb[vid][i]) <= step / 2 + 1e-9
    rows = sq_recall(spark, sf).collect()
    assert rows
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    # 8-bit quantization is near-lossless for cosine ranking
    assert mean_recall > 0.8, mean_recall
