"""Scale cuts on the anchor co-occurrence family (VERDICT r2 item 4).

The synthetic corpus never trips the stop-token or per-doc caps, so these
tests plant a corpus that does: a token in >90% of docs must be cut
before the self-join, a degenerate 300-distinct-token doc must be capped
at ANCHOR_DOC_TOKEN_CAP, and the DuckDB oracle must implement the
identical cuts (lockstep is asserted on the planted corpus, not just the
benign testdata)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_compare import assert_frames_match


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted")
    texts = []
    # 20 base docs: "stop" in 19 of them; pair (x, y) co-occurs in 6
    for i in range(20):
        toks = []
        if i != 0:
            toks.append("stop")
        if i < 6:
            toks += ["x", "y"]
        toks.append(f"u{i}")
        texts.append(" ".join(toks))
    # degenerate doc: 300 distinct tokens, each df=1
    texts.append(" ".join(f"t{j}" for j in range(300)))
    n = len(texts)
    table = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["planted"] * n),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def test_stop_token_cut_and_per_doc_cap(spark, planted_dir):
    from hedera_spark.operators.anchors import (
        ANCHOR_DOC_TOKEN_CAP,
        _cooccur_tokens,
    )

    toks = _cooccur_tokens(spark, planted_dir).toPandas()
    # "stop" is in 19/21 docs (> 0.9) — must be cut entirely
    assert "stop" not in set(toks["anchor"])
    # the degenerate doc is capped at ANCHOR_DOC_TOKEN_CAP tokens
    per_doc = toks.groupby("doc_id").size()
    assert per_doc.max() <= ANCHOR_DOC_TOKEN_CAP
    assert per_doc[20] == ANCHOR_DOC_TOKEN_CAP  # doc 20 had 300 distinct


def test_cooccur_pair_fanout_is_bounded(spark, planted_dir):
    from hedera_spark.operators.anchors import anchor_cooccur

    pairs = anchor_cooccur(spark, planted_dir).toPandas()
    # the surviving signal pair is intact with its exact doc count
    xy = pairs[(pairs["a1"] == "x") & (pairs["a2"] == "y")]
    assert len(xy) == 1 and int(xy["n_docs"].iloc[0]) == 6
    # no pair involves the planted stop token
    assert not ((pairs["a1"] == "stop") | (pairs["a2"] == "stop")).any()


def test_oracle_applies_identical_cuts(spark, planted_dir):
    """Run the registered DuckDB oracle on the planted corpus and compare
    against Spark — proves the SQL cut is in lockstep where it BINDS."""
    from hedera_spark.operators.anchors import anchor_cooccur
    from hedera_spark.registry import ORACLE

    got = anchor_cooccur(spark, planted_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_dir}/documents.parquet')"
    )
    want = con.execute(ORACLE["anchor_cooccur"]).fetchdf()
    con.close()
    assert_frames_match(got, want, "anchor_cooccur_planted")
