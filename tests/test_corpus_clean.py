"""Hand-built-frame semantics tests for the corpus-level cleaning
operators (operators/corpus_clean.py): planted boilerplate removal,
verbatim-run pair counting, vocabulary-growth accounting, tokenizer
fertility, and the IVF recall dial."""

from __future__ import annotations

import pytest


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    return str(out)


def test_line_dedup_removes_planted_boilerplate(spark, tmp_path):
    """A segment shared by 7 docs (> LINE_DF_CAP=5) is stripped from all
    of them; each doc's unique tail segment survives in order."""
    boiler = "cookie notice terms apply all rights reserved inc"  # 8 tokens
    rows = [
        (i, f"{boiler} unique{i} body{i} words{i} here{i} x{i} y{i} z{i} w{i}", "s", "en", 1)
        for i in range(7)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    from hedera_spark.operators.corpus_clean import line_dedup

    out = {r["doc_id"]: r for r in line_dedup(spark, sf).collect()}
    assert len(out) == 7
    for i, r in out.items():
        assert r["n_lines"] == 2
        assert r["n_removed"] == 1
        assert r["kept_text"] == f"unique{i} body{i} words{i} here{i} x{i} y{i} z{i} w{i}"


def test_line_dedup_below_cap_keeps_everything(spark, tmp_path):
    """The same segment in only 2 docs (<= cap) is NOT boilerplate."""
    seg = "one two three four five six seven eight"
    rows = [(1, seg, "s", "en", 1), (2, seg, "s", "en", 1)]
    sf = _write_docs(spark, tmp_path, rows)
    from hedera_spark.operators.corpus_clean import line_dedup

    for r in line_dedup(spark, sf).collect():
        assert r["n_removed"] == 0
        assert r["kept_text"] == seg


def test_dedup_substring_counts_shared_windows(spark, tmp_path):
    """Two docs sharing a verbatim 20-token run at DIFFERENT offsets share
    exactly 20-16+1 = 5 rolling windows; an unrelated doc pairs with
    nobody."""
    run = " ".join(f"r{i}" for i in range(20))
    d1 = run + " " + " ".join(f"a{i}" for i in range(10))
    d2 = " ".join(f"b{i}" for i in range(7)) + " " + run
    d3 = " ".join(f"c{i}" for i in range(40))
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, d1, "s", "en", 1), (2, d2, "s", "en", 1), (3, d3, "s", "en", 1)],
    )
    from hedera_spark.operators.corpus_clean import dedup_substring

    pairs = dedup_substring(spark, sf).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["doc_a"], p["doc_b"]) == (1, 2)
    assert p["n_shared"] == 5


def test_vocab_growth_buckets_and_cumulatives(spark, tmp_path):
    """first-seen attribution: bucket 0 (docs 0,1) contributes a,b,c;
    bucket 1 (doc 101) only d; cumulative sums are monotone and exact."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "a b", "s", "en", 3),
            (1, "a c", "s", "en", 3),
            (101, "b d", "s", "en", 3),
        ],
    )
    from hedera_spark.operators.corpus_clean import vocab_growth

    rows = {r["bucket"]: r for r in vocab_growth(spark, sf).collect()}
    assert rows[0]["n_docs"] == 2
    assert rows[0]["bucket_tokens"] == 4
    assert rows[0]["new_terms"] == 3
    assert rows[0]["cum_vocab"] == 3
    assert rows[1]["n_docs"] == 1
    assert rows[1]["new_terms"] == 1
    assert rows[1]["cum_tokens"] == 6
    assert rows[1]["cum_vocab"] == 4


def test_tokenizer_fertility_splits_subwords(spark, tmp_path):
    """'x-y' is one whitespace word but two \\w+ subword tokens →
    fertility 2.0 for that language; plain words stay at 1.0."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "x-y", "s", "hy", 3),
            (2, "ab cd", "s", "lo", 5),
        ],
    )
    from hedera_spark.operators.corpus_clean import tokenizer_fertility

    rows = {r["lang"]: r for r in tokenizer_fertility(spark, sf).collect()}
    assert rows["hy"]["ws_tokens"] == 1
    assert rows["hy"]["re_tokens"] == 2
    assert rows["hy"]["fertility"] == pytest.approx(2.0)
    assert rows["lo"]["fertility"] == pytest.approx(1.0)
    assert rows["lo"]["chars_per_token"] == pytest.approx(2.5)


def test_ivf_recall_bounds(spark):
    """Every query gets a row; recall ∈ [0,1]; hits never exceed the
    exact top-3 or the approximate result count."""
    from hedera_spark.operators.similarity import QUERY_MOD, ivf_recall
    from tests.conftest import SF_DIR

    rows = ivf_recall(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["q_id"] % QUERY_MOD == 0
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_hits"] <= 3
        assert r["n_hits"] <= r["n_approx"]


def test_boilerplate_by_source_flags_source_local_chrome(spark, tmp_path):
    """A segment repeated across every doc of source A (but absent from
    source B) is flagged for A only; a df=1 segment never flags."""
    chrome = "cookie notice terms apply all rights reserved inc"  # 8 tokens
    rows = [
        (i, f"{chrome} ua{i} ub{i} uc{i} ud{i} ue{i} uf{i} ug{i} uh{i}", "A", "en", 1)
        for i in range(5)
    ] + [
        (10 + i, f"vb{i} vc{i} vd{i} ve{i} vf{i} vg{i} vh{i} vi{i}", "B", "en", 1)
        for i in range(5)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    from hedera_spark.operators.corpus_clean import boilerplate_by_source

    out = {r["source"]: r for r in boilerplate_by_source(spark, sf).collect()}
    assert set(out) == {"A", "B"}
    a, b = out["A"], out["B"]
    # A: the chrome segment (df=5 of 5 docs) flags; the unique tails don't
    assert a["n_docs"] == 5
    assert a["n_boiler_segs"] == 1
    assert a["boiler_instances"] == 5
    assert a["max_df"] == 5
    assert 0.0 < a["boiler_ratio"] < 1.0
    # B: all segments df=1 -> nothing flags
    assert b["n_boiler_segs"] == 0
    assert b["boiler_ratio"] == 0.0


def test_boilerplate_min_df_gate(spark, tmp_path):
    """In a 2-doc source a shared segment has df=2 = BOILER_MIN_DF and
    df*20 > 2 docs, so it flags; with the segment in only 1 doc it
    cannot (df=1 < BOILER_MIN_DF) no matter how small the source."""
    seg = "one two three four five six seven eight"
    sf = _write_docs(
        spark, tmp_path, [(1, seg, "s", "en", 1), (2, seg, "s", "en", 1)]
    )
    from hedera_spark.operators.corpus_clean import boilerplate_by_source

    row = boilerplate_by_source(spark, sf).collect()[0]
    assert row["n_boiler_segs"] == 1 and row["boiler_instances"] == 2

    sf1 = _write_docs(spark, tmp_path / "b", [(1, seg, "s", "en", 1)])
    row1 = boilerplate_by_source(spark, sf1).collect()[0]
    assert row1["n_boiler_segs"] == 0


def test_mix_budget_waterfill_conservation_and_caps(spark, tmp_path):
    """Waterfill invariants on a planted 3-source corpus: saturated
    sources get exactly their cap, unsaturated allocations stay under
    cap and proportional to weight, and nothing exceeds the budget."""
    # tiny source (2 docs x 2 tokens), big sources (4 docs x 20 tokens)
    rows = (
        [(i, "a b", "tiny", "en", 1) for i in range(2)]
        + [(10 + i, " ".join(["w"] * 20), "bigA", "en", 1) for i in range(4)]
        + [(20 + i, " ".join(["v"] * 20), "bigB", "en", 1) for i in range(4)]
    )
    sf = _write_docs(spark, tmp_path, rows)
    from hedera_spark.operators.text_analysis import mix_budget_waterfill

    out = {r["source"]: r for r in mix_budget_waterfill(spark, sf).collect()}
    total_cap = sum(r["cap"] for r in out.values())
    budget = total_cap // 2
    assert set(out) == {"tiny", "bigA", "bigB"}
    # tiny (cap 4, weight 2) saturates: its fair share of an 82-token
    # budget at weight 2/10 is ~16 > 4
    assert out["tiny"]["saturated"] == 1
    assert out["tiny"]["alloc_tokens"] == out["tiny"]["cap"]
    for s in ("bigA", "bigB"):
        assert out[s]["saturated"] == 0
        assert out[s]["alloc_tokens"] <= out[s]["cap"]
    # equal weights -> equal unsaturated allocations
    assert out["bigA"]["alloc_tokens"] == out["bigB"]["alloc_tokens"]
    alloc_sum = sum(r["alloc_tokens"] for r in out.values())
    # conservation: allocations cover the budget up to the floor remainder
    assert budget - 2 <= alloc_sum <= budget
