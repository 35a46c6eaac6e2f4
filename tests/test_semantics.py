"""Hand-built-frame unit tests (SURVEY.md §5.2): pin the exact semantics
of the trickier operators on tiny inputs where the answer is checkable by
eye — the reference's local-reader test style (java/test/org/hedera/
Local*Reader.java) translated to DataFrames."""

from __future__ import annotations

import pytest

def test_rev_diff_token_sets(spark, tmp_path):
    """Two snapshots: 'a b c' -> 'b c d' = 1 inserted, 1 deleted, 2 common."""
    docs = spark.createDataFrame(
        [(1, "a b c", "p", "en", 5), (2, "b c d", "p", "en", 5)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.revisions import rev_diff

    rows = {r["doc_id"]: r for r in rev_diff(spark, str(out)).collect()}
    assert rows[2]["n_inserted"] == 1
    assert rows[2]["n_deleted"] == 1
    assert rows[2]["n_common"] == 2


def test_winnowing_window_min(spark, tmp_path):
    """Fingerprints are window minima: every fp must be the md5 of one of
    the doc's shingles, and an identical doc yields the identical set."""
    text = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, text, "p", "en", 1), (2, text, "q", "en", 1)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import fingerprint

    fps = fingerprint(spark, str(out)).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] == by_doc[2]  # identical text -> identical fingerprints
    # 6 shingles, window 4 -> at most 3 full-window minima + tail, dedup'd
    assert 1 <= len(by_doc[1]) <= 6


def test_minhash_identical_docs_collide(spark, tmp_path):
    """Exact duplicates must share every band -> est_jaccard = 1.0."""
    text = "x y z w v u t s r q"
    docs = spark.createDataFrame(
        [(1, text, "p", "en", 1), (2, text, "q", "en", 1), (3, "completely different words here now ok yes no maybe", "r", "en", 1)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.dedup import dedup_minhash

    rows = dedup_minhash(spark, str(out)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in rows}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_identical_docs_distance_zero(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "m n o p q r", "p", "en", 1), (2, "m n o p q r", "q", "en", 1)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.dedup import dedup_simhash

    rows = dedup_simhash(spark, str(out)).collect()
    assert len(rows) == 1
    assert rows[0]["hamming"] == 0


def test_sessionization_gap_splits(spark, tmp_path):
    """Events 10 min apart share a session; a 2h gap starts a new one."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 7, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=10), 7, "view", 1.0, "{}"),
        (3, base + dt.timedelta(hours=3), 7, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import session_stats

    got = sorted(
        session_stats(spark, str(out)).collect(), key=lambda r: r["session_seq"]
    )
    assert [r["n_events"] for r in got] == [2, 1]


def test_multimodal_stub_plumbing(spark, tmp_path):
    """The mapInPandas decode path: schema, arrow batching, determinism."""
    docs = spark.createDataFrame(
        [(1, "abcd", "p", "en", 4), (2, "abcde", "q", "en", 5)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.multimodal import multimodal_meta

    rows = {r["doc_id"]: r for r in multimodal_meta(spark, str(out)).collect()}
    assert rows[1]["n_bytes"] == 4 and rows[1]["format"] == "png"
    assert rows[2]["n_bytes"] == 5 and rows[2]["format"] == "jpeg"
    assert rows[2]["width"] == 64 + 5 % 512


def test_multimodal_features_histogram(spark, tmp_path):
    """Byte histogram must be a real distribution over the payload bytes."""
    docs = spark.createDataFrame(
        [(1, "aaaa", "p", "en", 4)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.multimodal import multimodal_features

    row = multimodal_features(spark, str(out)).first()
    assert row["n_bytes"] == 4
    hist = [float(v) for v in row["byte_hist"].split(",")]
    assert abs(sum(hist) - 1.0) < 1e-9
    assert hist[ord("a") >> 4] == 1.0  # all bytes are 'a' (0x61 -> bin 6)
    assert max(row["resized_w"], row["resized_h"]) == 256
    assert row["frame_indices"].split(",")[0] == "0"


def test_jaccard_hot_shingle_cap_bounds_candidates(spark):
    """A planted stop-shingle shared by EVERY doc must not blow up the
    candidate join: with the df cap active the quadratic contribution of
    the hot shingle disappears, and Jaccard is computed over the capped
    shingle universe only."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.dedup import _jaccard_pairs

    # 40 docs all sharing shingle "HOT"; docs 0/1 also share A B C (near-dups)
    arr_rows = []
    rows = []
    for d in range(40):
        shs = ["HOT"] + (["A", "B", "C"] if d in (0, 1) else [f"uniq-{d}"])
        arr_rows.append((d, shs))
        rows += [(d, s) for s in shs]
    arrs = spark.createDataFrame(arr_rows, "doc_id long, shingles array<string>")
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")

    capped = _jaccard_pairs(arrs, df_cap=10)
    pairs = capped.collect()
    # only the planted near-dup pair survives: jaccard over capped universe
    # = |{A,B,C}| / |{A,B,C}| = 1.0 for (0,1); every other pair shared only HOT
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in pairs] == [(0, 1, 1.0)]

    # without the cap the hot shingle alone creates all 40*39/2 candidates
    uncapped = _jaccard_pairs(arrs.alias("u"), df_cap=10**9)
    n_cand = (
        sh.selectExpr("doc_id AS doc_a", "shingle")
        .join(sh.selectExpr("doc_id AS doc_b", "shingle"), "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .count()
    )
    assert n_cand >= 40 * 39 / 2
    # capped candidate volume is bounded by the non-hot shingles only
    kept_cand = (
        sh.where(F.col("shingle") != "HOT")
        .selectExpr("doc_id AS doc_a", "shingle")
        .join(
            sh.where(F.col("shingle") != "HOT").selectExpr(
                "doc_id AS doc_b", "shingle"
            ),
            "shingle",
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .count()
    )
    assert kept_cand == 3  # A, B, C each pair (0,1) once
    assert uncapped.where(F.col("jaccard") >= 0.2).count() >= 1


def test_dedup_embedding_lsh_subset_and_recall(spark, tmp_path):
    """The bucketed path must return a subset of the exact all-pairs result,
    and must recover planted near-identical vectors (cos ~ 1 agrees on every
    projection sign, so the pair always shares its bucket)."""
    import math
    import random

    from hedera_spark.operators.similarity import (
        dedup_embedding,
        dedup_embedding_lsh,
    )

    rng = random.Random(7)
    rows = []
    for vid in range(30):
        rows.append((vid, [rng.uniform(-1, 1) for _ in range(64)], 0))
    base = [rng.uniform(-1, 1) for _ in range(64)]
    jit = [x + 1e-4 for x in base]
    rows.append((100, base, 1))
    rows.append((101, jit, 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "mini"
    emb.write.parquet(str(out / "embeddings.parquet"))

    exact = {(r.vec_a, r.vec_b) for r in dedup_embedding(spark, str(out)).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in dedup_embedding_lsh(spark, str(out)).collect()}
    assert lsh <= exact
    assert (100, 101) in lsh


def test_max_multiplicity_matches_counter_on_random_arrays(spark):
    """The sorted-run fold behind text_repetition's top-n-gram fraction,
    checked against collections.Counter over 300 seeded-random arrays
    (including empties, singletons, all-equal, and high-duplication
    shapes) in ONE Spark job."""
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from hedera_spark.operators.text_analysis import _max_multiplicity

    rng = random.Random(20260813)
    cases = [[]] + [["x"]] + [["y"] * 50]
    for _ in range(297):
        n = rng.randrange(0, 40)
        alphabet = rng.randrange(1, 6)
        cases.append([f"t{rng.randrange(alphabet)}" for _ in range(n)])
    want = [max(Counter(c).values()) if c else 0 for c in cases]

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i INT, arr ARRAY<STRING>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", _max_multiplicity(F.col("arr")).alias("m")
        ).collect()
    }
    assert [got[i] for i in range(len(cases))] == want


def test_ann_lsh_multi_dominates_single_table(spark):
    """Table 0 of ann_lsh_multi IS ann_lsh's plane set, so the multi-table
    candidate pool is a superset per query — its 3rd-best cosine can never
    be worse than the single-table one, and aggregate recall@3 against
    the exact top-3 (ann_topk) can only go up."""
    from hedera_spark.operators.similarity import ann_lsh, ann_lsh_multi, ann_topk
    from tests.conftest import SF_DIR

    sf = SF_DIR
    exact = {
        (r["q_id"], r["neighbor_id"])
        for r in ann_topk(spark, sf).where("rk <= 3").collect()
    }
    single = ann_lsh(spark, sf).collect()
    multi = ann_lsh_multi(spark, sf).collect()

    # per-rank dominance: at every rank the single-table result reaches,
    # the multi-table result must score at least as well (the pool can
    # only grow; NB a larger pool can add a lower-scored rank-3 row where
    # the single table found fewer than 3 candidates, so comparing the
    # per-query minimum would be wrong)
    m_by_rank = {(r["q_id"], r["rk"]): r["cos"] for r in multi}
    for r in single:
        assert m_by_rank[(r["q_id"], r["rk"])] >= r["cos"] - 1e-9, (
            r["q_id"],
            r["rk"],
        )

    def recall(rows):
        hit = sum((r["q_id"], r["neighbor_id"]) in exact for r in rows)
        return hit / max(len(exact), 1)

    assert recall(multi) >= recall(single)


def test_pv_anomaly_flags_planted_spike(spark, tmp_path):
    """A constant daily series with one planted 10x spike must flag
    exactly the spike day; the all-constant prefix (variance 0) must
    yield NULL z and no flag."""
    import datetime

    from pyspark.sql import functions as F

    rows = []
    eid = 0
    for day in range(1, 15):
        n = 50 if day == 10 else 5
        for i in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, day, 12, 0, 0), 1, "view", 1.0, "{}")
            )
            eid += 1
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(sf / "events.parquet"))

    from hedera_spark.operators.timeseries import pv_anomaly

    out = pv_anomaly(spark, str(sf)).orderBy("day").collect()
    flagged = [r["day"] for r in out if r["is_anomaly"]]
    assert flagged == [datetime.date(2024, 1, 10)]
    # constant windows (before the spike): zero variance -> NULL z-score
    pre = [r for r in out if r["day"] < datetime.date(2024, 1, 10)]
    assert pre and all(r["z_score"] is None for r in pre)
    # day 10's z must be large and positive
    spike = [r for r in out if r["day"] == datetime.date(2024, 1, 10)][0]
    assert spike["z_score"] > 2.0 and spike["cnt"] == 50


def test_hits_direction_and_normalization(spark, tmp_path):
    """hits_anchors on a planted star graph: the high-df hub token must
    get hub score 1.0, the leaf entities authority 1.0; scores lie in
    [0, 1]."""
    # "hub" appears in 16 of 20 docs — below the 90% stop-token df cap —
    # and co-occurs with each leaf in 8 docs (>= the n_docs >= 5 cut);
    # hub's df (16) > leaves' (8), so edges point hub -> leaf
    rows = []
    for i in range(8):
        rows.append((i, "hub l1 x%d" % i, "s", "en", 10))
    for i in range(8, 16):
        rows.append((i, "hub l2 y%d" % i, "s", "en", 10))
    for i in range(16, 20):
        rows.append((i, "filler f%d" % i, "s", "en", 10))
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.parquet(str(sf / "documents.parquet"))

    from hedera_spark.operators.graph import hits_anchors

    out = {r["anchor"]: r for r in hits_anchors(spark, str(sf)).collect()}
    assert out["hub"]["hub"] == 1.0  # the only node with out-edges
    assert out["hub"]["authority"] == 0.0  # nothing points at it
    # both leaves are pure authorities with equal weight (10 docs each)
    assert out["l1"]["authority"] == 1.0 and out["l2"]["authority"] == 1.0
    assert out["l1"]["hub"] == 0.0 and out["l2"]["hub"] == 0.0
    for r in out.values():
        assert 0.0 <= r["authority"] <= 1.0 and 0.0 <= r["hub"] <= 1.0


def test_dsir_prefers_target_like_documents(spark, tmp_path):
    """Documents made of target-language (en) tokens must out-score
    documents made of tokens that appear only outside the target slice."""
    rows = (
        [(i, "the quick brown fox", "s", "en", 20) for i in range(8)]
        + [(i + 8, "der schnelle braune fuchs", "s", "de", 25) for i in range(8)]
    )
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.parquet(str(sf / "documents.parquet"))

    from hedera_spark.operators.importance import dsir_weights

    w = {r["doc_id"]: r["dsir_logw"] for r in dsir_weights(spark, str(sf)).collect()}
    assert w[0] > 0 > w[8], (
        "en-token docs must score positive, de-only docs negative"
    )


def test_ann_pq_reconstruction_exact_for_codebook_vectors(spark):
    """A vector that IS a codebook entry reconstructs losslessly, so its
    approximate distance to itself-as-query is what exact distance would
    be; more broadly every adist must be >= 0 and rk deterministic."""
    from hedera_spark.operators.similarity import ann_pq

    out = ann_pq(spark, "/root/testdata/sf0.001").collect()
    assert out and all(r["adist"] >= 0.0 for r in out)
    ranks = {}
    for r in out:
        ranks.setdefault(r["q_id"], []).append(r["rk"])
    for q, rks in ranks.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_dedup_semantic_flags_planted_near_duplicates(spark, tmp_path):
    """Planted near-identical vectors must land in one cluster and all
    but the smallest id must be flagged; well-separated vectors stay
    unflagged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    # 3 copies of an identical vector (ids 100, 101, 102) + isolated
    # orthogonal-ish vectors
    base = [1.0] * 8 + [0.0] * 56
    for vid in (100, 101, 102):
        rows.append((vid, base, 0))
    for i, vid in enumerate((0, 1, 2, 3, 4, 5, 6, 7)):
        v = [0.0] * 64
        v[8 * (i % 8) + 7] = 1.0
        v[i] = -1.0
        rows.append((vid, v, 1))
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        str(sf / "embeddings.parquet"),
    )

    from hedera_spark.operators.kmeans import dedup_semantic

    out = {r["vec_id"]: r for r in dedup_semantic(spark, str(sf)).collect()}
    assert out[100]["is_semantic_dup"] == 0  # smallest id survives
    assert out[101]["is_semantic_dup"] == 1
    assert out[102]["is_semantic_dup"] == 1
    assert out[101]["cluster_id"] == out[100]["cluster_id"]


def test_pv_seasonality_detects_planted_weekly_pattern(spark, tmp_path):
    """User A: strong weekend spike every week -> seasonality near 1.
    User B: identical count every day -> seasonality 0 (SST > 0 fails,
    zero-variance branch)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    for day in range(1, 29):  # 4 full weeks of January 2024
        d = datetime.datetime(2024, 1, day, 10, 0, 0)
        wk = d.weekday()  # Mon=0..Sun=6
        n_a = 30 if wk >= 5 else 3
        for _ in range(n_a):
            rows.append((eid, d, 1)); eid += 1
        for _ in range(5):
            rows.append((eid, d, 2)); eid += 1
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(sf / "events.parquet"),
    )

    from hedera_spark.operators.timeseries import pv_seasonality

    out = {r["user_id"]: r for r in pv_seasonality(spark, str(sf)).collect()}
    assert out[1]["seasonality"] > 0.95, out[1]
    assert out[1]["peak_dow"] in (0, 6)  # Sunday=0 or Saturday=6
    assert out[2]["seasonality"] == 0.0
    assert out[1]["n_days"] == 28 and out[2]["n_days"] == 28


def test_pv_autocorr_planted_alternation(spark, tmp_path):
    """An alternating two-value daily series is exactly linear
    (y = 10 − x), so lag-1 r must be exactly −1.0; a constant series has
    zero variance and must yield the 0.0 sentinel."""
    import datetime

    rows = []
    eid = 0
    for day in range(1, 15):
        # entity 1 alternates 1/9 events per day; entity 2 constant 3
        for _ in range(9 if day % 2 == 0 else 1):
            rows.append(
                (eid, datetime.datetime(2024, 3, day, 8, 0, 0), 1, "view", 1.0, "{}")
            )
            eid += 1
        for _ in range(3):
            rows.append(
                (eid, datetime.datetime(2024, 3, day, 9, 0, 0), 2, "view", 1.0, "{}")
            )
            eid += 1
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(sf / "events.parquet"))

    from hedera_spark.operators.timeseries import pv_autocorr

    out = {r["user_id"]: r for r in pv_autocorr(spark, str(sf)).collect()}
    assert out[1]["autocorr_1"] == -1.0 and out[1]["n_pairs"] == 13
    assert out[2]["autocorr_1"] == 0.0


def test_pv_trending_planted_spike_week(spark, tmp_path):
    """One entity jumps 2→50 events between consecutive weeks; that delta
    must rank first and carry exact integer counts."""
    import datetime

    rows = []
    eid = 0
    # entity 1: weeks of Mon 2024-01-01 and 2024-01-08: 2 then 50 events
    for d, n in ((1, 2), (8, 50)):
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, d, 12, 0, 0), 1, "view", 1.0, "{}")
            )
            eid += 1
    # entity 2: flat 5/5 across the same weeks
    for d in (1, 8):
        for _ in range(5):
            rows.append(
                (eid, datetime.datetime(2024, 1, d, 12, 0, 0), 2, "view", 1.0, "{}")
            )
            eid += 1
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(sf / "events.parquet"))

    from hedera_spark.operators.timeseries import pv_trending

    out = pv_trending(spark, str(sf)).collect()
    top = out[0]
    assert top["user_id"] == 1 and top["prev_cnt"] == 2 and top["cur_cnt"] == 50
    assert top["delta"] == 48
    assert top["week"] == datetime.date(2024, 1, 8)
    deltas = [abs(r["delta"]) for r in out]
    assert deltas == sorted(deltas, reverse=True)


def test_multimodal_dedup_groups_and_waste(spark, tmp_path):
    """Payloads sharing the 64-byte prefix fingerprint form one group with
    min-id survivor; wasted bytes = total minus the SURVIVOR's own bytes
    (members may differ in size); unique payloads emit nothing."""
    docs = spark.createDataFrame(
        [
            (7, "samesame", "p", "en", 8),
            (3, "samesame", "q", "en", 8),
            (9, "samesame", "r", "en", 8),
            (4, "unique", "s", "en", 6),
            # prefix collision past the fingerprint window: same first 64
            # chars, different tails — one group, size-aware waste
            (11, "x" * 64 + "tailA", "t", "en", 69),
            (12, "x" * 64 + "longer-tail-B", "u", "en", 77),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    sf = tmp_path / "sf"
    docs.write.parquet(str(sf / "documents.parquet"))

    from hedera_spark.operators.multimodal import multimodal_dedup

    out = {r["survivor_id"]: r for r in multimodal_dedup(spark, str(sf)).collect()}
    assert len(out) == 2
    g = out[3]
    assert g["n_copies"] == 3
    assert g["wasted_bytes"] == 2 * 8
    assert len(g["fingerprint"]) == 32
    px = out[11]
    assert px["n_copies"] == 2
    assert px["wasted_bytes"] == 64 + len("longer-tail-B")


def test_multimodal_frames_stride_sampling(spark, tmp_path):
    """Frame sampling under the stub decoder: n_frames = 1 + n_bytes % 16,
    stride = max(1, n_frames // 4), at most 4 indices."""
    docs = spark.createDataFrame(
        [(1, "abcd", "p", "en", 4), (2, "a" * 15, "q", "en", 15)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    sf = tmp_path / "sf"
    docs.write.parquet(str(sf / "documents.parquet"))

    from hedera_spark.operators.multimodal import multimodal_frames

    out = {r["doc_id"]: r for r in multimodal_frames(spark, str(sf)).collect()}
    # doc 1: 4 bytes -> 5 frames, stride 1 -> first four indices
    assert out[1]["n_frames"] == 5 and out[1]["frame_indices"] == "0,1,2,3"
    # doc 2: 15 bytes -> 16 frames, stride 4 -> evenly spaced
    assert out[2]["n_frames"] == 16 and out[2]["frame_indices"] == "0,4,8,12"
    assert all(r["n_sampled"] == 4 for r in out.values())


def test_quality_calibration_rolls_up_classifier(spark):
    """The calibration histogram must be exactly the pandas rollup of the
    classifier's per-doc output: same bin totals, label counts, and
    micro-unit mean probabilities."""
    import math

    from hedera_spark.operators.importance import (
        quality_calibration,
        quality_classifier,
    )

    sf = "/root/testdata/sf0.001"
    scored = quality_classifier(spark, sf).toPandas()
    out = {int(r["bin"]): r for r in quality_calibration(spark, sf).collect()}

    scored["bin"] = scored["p"].map(lambda p: min(int(math.floor(p * 10)), 9))
    assert sum(r["n_docs"] for r in out.values()) == len(scored)
    for b, grp in scored.groupby("bin"):
        row = out[int(b)]
        assert row["n_docs"] == len(grp)
        assert row["n_keep_label"] == int(grp["y"].sum())
        assert row["n_correct"] == int((grp["pred"] == (grp["y"] == 1)).sum())
        micro = int(sum(round(p * 1e6) for p in grp["p"]))
        assert row["mean_p"] == round(micro / (len(grp) * 1e6), 6)
        assert 0.0 <= row["frac_keep"] <= 1.0


def test_graph_degree_stats_matches_edge_list(spark):
    """The degree histogram must be exactly the pandas rollup of the
    df-capped co-mention edge list."""
    from collections import Counter

    from hedera_spark.operators.anchors import anchor_cooccur
    from hedera_spark.operators.graph import graph_degree_stats

    sf = "/root/testdata/sf0.001"
    edges = anchor_cooccur(spark, sf).collect()
    deg, strength = Counter(), Counter()
    for r in edges:
        for n in (r["a1"], r["a2"]):
            deg[n] += 1
            strength[n] += r["n_docs"]
    hist = Counter(deg.values())
    mass = Counter()
    for n, d in deg.items():
        mass[d] += strength[n]

    out = {r["degree"]: r for r in graph_degree_stats(spark, sf).collect()}
    assert {d: r["n_nodes"] for d, r in out.items()} == dict(hist)
    assert {d: r["total_strength"] for d, r in out.items()} == dict(mass)


def test_rev_burstiness_periodic_vs_bursty(spark, tmp_path):
    """A perfectly periodic page has CV 0; a bursty page (tight cluster +
    one huge gap) has CV well above 1. Gaps are exact microseconds."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # page 1: exactly hourly -> 6 gaps of 3600s, cv = 0
    for i in range(7):
        rows.append((i, base + datetime.timedelta(hours=i), 1, "edit", 1.0, "{}"))
    # page 2: five edits one second apart, then one 10-day gap
    for i in range(6):
        rows.append((100 + i, base + datetime.timedelta(seconds=i), 2, "edit", 1.0, "{}"))
    rows.append((200, base + datetime.timedelta(days=10), 2, "edit", 1.0, "{}"))
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(sf / "events.parquet"))

    from hedera_spark.operators.revisions import rev_burstiness

    out = {r["page_id"]: r for r in rev_burstiness(spark, str(sf)).collect()}
    assert out[1]["n_gaps"] == 6 and out[1]["cv_gap"] == 0.0
    assert out[1]["mean_gap_s"] == 3600.0
    assert out[2]["n_gaps"] == 6 and out[2]["cv_gap"] > 1.5


def test_doc_entropy_degenerate_and_uniform(spark, tmp_path):
    """All-same-token text has entropy 0; k uniform distinct tokens have
    entropy exactly ln k."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "a a a a a a a a", "p", "en", 15),
            (2, "a b c d", "q", "en", 7),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    sf = tmp_path / "sf"
    docs.write.parquet(str(sf / "documents.parquet"))

    from hedera_spark.operators.text_analysis import doc_entropy

    out = {r["doc_id"]: r for r in doc_entropy(spark, str(sf)).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["n_distinct"] == 1
    assert out[2]["entropy"] == round(math.log(4), 6)
    assert out[2]["n_tokens"] == 4 and out[2]["n_distinct"] == 4


def test_zipf_fit_exact_power_law(spark, tmp_path):
    """A corpus whose term frequencies are an exact power law f = 64/rank
    must regress to slope −1 with R² = 1."""
    words = []
    for rank, tok in enumerate(["w%d" % i for i in range(8)], start=1):
        words.extend([tok] * (64 // rank))
    docs = spark.createDataFrame(
        [(1, " ".join(words), "p", "en", 10)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    sf = tmp_path / "sf"
    docs.write.parquet(str(sf / "documents.parquet"))

    from hedera_spark.operators.text_analysis import zipf_fit

    row = zipf_fit(spark, str(sf)).first()
    assert row["n_terms"] == 8
    # 64//rank is not an exact power law for ranks 3,5,6,7 (floor), so
    # allow the floor noise: slope near −1, R² near 1
    assert abs(row["slope"] + 1.0) < 0.05
    assert row["r2"] > 0.99


def test_dedup_incremental_never_pairs_old_old(spark):
    """Every incremental candidate pair touches at least one
    added/modified doc; pair_kind reflects both-side membership; and the
    pairs agree with a full v2 minhash run restricted to the delta."""
    from hedera_spark.operators.delta import corpus_delta, dedup_incremental

    sf = "/root/testdata/sf0.001"
    changed = {
        r["doc_id"]
        for r in corpus_delta(spark, sf)
        .where("change_type IN ('added', 'modified')")
        .collect()
    }
    pairs = dedup_incremental(spark, sf).collect()
    assert pairs, "planted v2 mutations must produce candidates"
    for p in pairs:
        touched = (p["doc_a"] in changed) + (p["doc_b"] in changed)
        assert touched >= 1, p
        kind = "new_new" if touched == 2 else "new_old"
        assert p["pair_kind"] == kind, p
        assert 0.0 <= p["est_jaccard"] <= 1.0
    # a 'modified' doc (text + ' v2') is a near-dup of ITS OWN unchanged
    # band-mates; at minimum the modified docs appear somewhere
    assert any(p["pair_kind"] == "new_old" for p in pairs)


def test_lang_confusion_rolls_up_lang_id(spark):
    """The confusion matrix must be exactly the pandas rollup of
    lang_id's per-doc predictions, and per-label fractions must sum
    to 1."""
    from collections import Counter

    from hedera_spark.operators.text_analysis import lang_confusion, lang_id

    sf = "/root/testdata/sf0.001"
    preds = lang_id(spark, sf).collect()
    want = Counter((r["lang"], r["pred_lang"]) for r in preds)
    out = lang_confusion(spark, sf).collect()
    assert {(r["lang"], r["pred_lang"]): r["n_docs"] for r in out} == dict(want)
    by_lang = Counter()
    for r in out:
        by_lang[r["lang"]] += r["frac_of_lang"]
    for lang, total in by_lang.items():
        assert abs(total - 1.0) < 1e-4, (lang, total)


@pytest.mark.slow
def test_dedup_cluster_stats_accounts_every_doc(spark):
    """The size histogram must be the exact rollup of dedup_clusters:
    Σ n_docs = clustered docs, Σ n_clusters = distinct clusters."""
    from collections import Counter

    from hedera_spark.operators.clusters import dedup_cluster_stats, dedup_clusters

    sf = "/root/testdata/sf0.001"
    comp = dedup_clusters(spark, sf).collect()
    sizes = Counter(r["cluster_id"] for r in comp)
    hist = Counter(sizes.values())
    out = {r["cluster_size"]: r for r in dedup_cluster_stats(spark, sf).collect()}
    assert {s: r["n_clusters"] for s, r in out.items()} == dict(hist)
    assert sum(r["n_docs"] for r in out.values()) == len(comp)


def test_pv_forecast_backtest_perfect_on_weekly_pattern(spark, tmp_path):
    """A perfectly weekly-periodic series is forecast exactly by the
    seasonal-naive model (MAE 0); a constant-but-shifted series yields
    the analytic error of the expanding mean."""
    import datetime

    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for day in range(28):
        n = [2, 5, 3, 7, 4, 6, 1][day % 7]  # exact weekly pattern
        for _ in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=day, hours=3), 1, "view", 1.0, "{}")
            )
            eid += 1
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(sf / "events.parquet"))

    from hedera_spark.operators.timeseries import pv_forecast_backtest

    out = pv_forecast_backtest(spark, str(sf)).collect()
    assert len(out) == 1
    r = out[0]
    # first 7 days have no prior same-weekday observation -> 21 scored
    assert r["n_scored"] == 21
    assert r["mae"] == 0.0


@pytest.mark.slow
def test_dedup_recall_counts_match_composed_operators(spark):
    """The recall row must be the exact pandas intersection of the two
    composed pair sets, and pigeonhole guarantees: identical docs (est
    1.0 in every band) are always candidates."""
    from hedera_spark.operators.dedup import (
        dedup_minhash,
        dedup_ngram_jaccard,
        dedup_recall,
    )

    sf = "/root/testdata/sf0.001"
    truth = {(r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, sf).collect()}
    cand = {(r["doc_a"], r["doc_b"]) for r in dedup_minhash(spark, sf).collect()}
    row = dedup_recall(spark, sf).first()
    assert row["n_true"] == len(truth)
    assert row["n_cand"] == len(cand)
    assert row["n_hit"] == len(truth & cand)
    assert row["recall"] == round(len(truth & cand) / len(truth), 6)
    assert 0.0 <= row["candidate_precision"] <= 1.0


def test_graph_communities_planted_two_clusters(spark, tmp_path):
    """Two dense planted cliques joined by nothing must converge to two
    communities; each community's label is one of its member anchors."""
    rows = []
    # clique A: tokens p q r co-occur in 8 docs; clique B: x y z in 8
    for i in range(8):
        rows.append((i, "p q r", "s", "en", 5))
    for i in range(8, 16):
        rows.append((i, "x y z", "s", "en", 5))
    # filler so no token trips the 90% stop-token df cap
    for i in range(16, 20):
        rows.append((i, "f%d g%d" % (i, i), "s", "en", 5))
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.parquet(str(sf / "documents.parquet"))

    from hedera_spark.operators.graph import graph_communities

    out = {r["anchor"]: r["community"] for r in graph_communities(spark, str(sf)).collect()}
    a = {out[t] for t in ("p", "q", "r")}
    b = {out[t] for t in ("x", "y", "z")}
    assert len(a) == 1 and len(b) == 1, (a, b)
    assert a != b
    assert a.pop() in ("p", "q", "r") and b.pop() in ("x", "y", "z")


def test_key_skew_stats_uniform_vs_hot_key(spark, tmp_path):
    """A perfectly uniform key distribution has Gini 0; one hot key
    carrying ~all traffic pushes Gini and top1_share toward 1. The
    range-partitioned rank must agree with a direct computation."""
    import datetime

    def write(counts, d):
        rows, eid = [], 0
        for uid, n in counts.items():
            for _ in range(n):
                rows.append(
                    (eid, datetime.datetime(2024, 1, 1 + eid % 20), uid, "view", 1.0, "{}")
                )
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).write.parquet(str(d / "events.parquet"))

    from hedera_spark.operators.timeseries import key_skew_stats

    d1 = tmp_path / "uniform"
    write({u: 5 for u in range(40)}, d1)
    r = key_skew_stats(spark, str(d1)).first()
    assert r["n_keys"] == 40 and r["n_events"] == 200
    assert r["gini"] == 0.0
    assert r["top1_share"] == round(5 / 200, 6)

    d2 = tmp_path / "hot"
    write({0: 1000, **{u: 1 for u in range(1, 21)}}, d2)
    r2 = key_skew_stats(spark, str(d2)).first()
    # direct Gini over the sorted counts
    xs = sorted([1000] + [1] * 20)
    n, t = len(xs), sum(xs)
    srx = sum((i + 1) * x for i, x in enumerate(xs))
    want = round(2.0 * srx / (n * t) - (n + 1) / n, 6)
    assert r2["gini"] == want and r2["gini"] > 0.85
    assert r2["top1_share"] == round(1000 / t, 6)


def test_positional_index_exact_positions(spark, tmp_path):
    """'a b a c' -> a at 1,3; b at 2; c at 4 (1-based original slots)."""
    docs = spark.createDataFrame(
        [(1, "a b a c", "p", "en", 7)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.ir import positional_index

    rows = {r["term"]: r for r in positional_index(spark, str(out)).collect()}
    assert rows["a"]["positions"] == "1,3" and rows["a"]["n_pos"] == 2
    assert rows["b"]["positions"] == "2"
    assert rows["c"]["positions"] == "4"


def test_phrase_search_requires_adjacency(spark, tmp_path):
    """'hash join' matches only adjacent occurrences: doc 1 has the
    phrase twice, doc 2 has both words but never adjacent, doc 3 has a
    'batch batch' run of 3 tokens = 2 overlapping occurrences."""
    docs = spark.createDataFrame(
        [
            (1, "hash join x hash join", "p", "en", 1),
            (2, "hash x join hash", "p", "en", 1),
            (3, "batch batch batch", "p", "en", 1),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.ir import phrase_search

    rows = {
        (r["phrase"], r["doc_id"]): r["n_occurrences"]
        for r in phrase_search(spark, str(out)).collect()
    }
    assert rows[("hash join", 1)] == 2
    assert ("hash join", 2) not in rows
    assert rows[("batch batch", 3)] == 2


def test_graph_kcore_peels_tails_keeps_clique(spark, tmp_path):
    """Planted graph: a 4-clique (a b c d, 5 co-mention docs), a pendant
    pair (e f hanging off a), and a separate triangle (x y z). K=3
    peeling removes the pendant pair and the triangle (degree 2) but
    keeps the clique, where every node retains degree 3."""
    rows = []
    for i in range(5):
        rows.append((i, "a b c d", "p", "en", 1))
    for i in range(5, 10):
        rows.append((i, "a e f", "p", "en", 1))
    for i in range(10, 15):
        rows.append((i, "x y z", "p", "en", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.graph import graph_kcore

    got = {r["anchor"]: r["degree"] for r in graph_kcore(spark, str(out)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_pv_changepoint_finds_planted_step(spark, tmp_path):
    """User with 10 days of 2 events/day then 10 days of 8 events/day:
    the argmax split is exactly the last low day, with the segment
    means recovered."""
    import datetime

    rows = []
    eid = 0
    for d in range(20):
        day = datetime.datetime(2024, 1, 1 + d)
        per = 2 if d < 10 else 8
        for k in range(per):
            rows.append(
                (eid, day + datetime.timedelta(minutes=k), 1, "view", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import pv_changepoint

    got = pv_changepoint(spark, str(out)).collect()
    assert len(got) == 1
    r = got[0]
    assert str(r["split_day"]) == "2024-01-10"
    assert r["mean_before"] == 2.0 and r["mean_after"] == 8.0


def test_embedding_outliers_flags_planted_vector(spark, tmp_path):
    """30 tight vectors around (1,0,0,0) plus one at (-1,0,0,0): only
    the planted far vector is flagged, with the largest z-score."""
    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0], 0) for i in range(30)]
    rows.append((99, [-1.0, 0.0, 0.0, 0.0], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = tmp_path / "mini"
    emb.write.parquet(str(out / "embeddings.parquet"))
    from hedera_spark.operators.similarity import embedding_outliers

    got = {r["vec_id"]: r for r in embedding_outliers(spark, str(out)).collect()}
    assert got[99]["is_outlier"]
    assert not any(got[i]["is_outlier"] for i in range(30))
    assert got[99]["z_score"] == max(r["z_score"] for r in got.values())


def test_rev_reverts_planted_restore(spark, tmp_path):
    """Page p: rev 1 = original, rev 2 = vandalism (disjoint text),
    rev 3 = restore of rev 1. rev 3 is flagged as reverting to rev 1;
    rev 2 (similar to nothing) and adjacent-edit-only page q are not."""
    orig = "alpha beta gamma delta epsilon zeta eta theta"
    vandal = "one two three four five six seven eight"
    near_orig = "alpha beta gamma delta epsilon zeta eta iota"
    docs = spark.createDataFrame(
        [
            (1, orig, "p", "en", 1),
            (2, vandal, "p", "en", 1),
            (3, near_orig, "p", "en", 1),
            (4, orig, "q", "en", 1),
            (5, near_orig, "q", "en", 1),  # adjacent edit: excluded
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.revisions import page_conflict, rev_reverts

    got = rev_reverts(spark, str(out)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["page_id"], r["rev_seq"], r["reverted_to"], r["gap"]) == ("p", 3, 1, 2)
    assert r["jaccard"] >= 0.6

    conf = {c["page_id"]: c for c in page_conflict(spark, str(out)).collect()}
    assert conf["p"]["n_reverts"] == 1 and conf["p"]["n_revs"] == 3
    assert conf["q"]["n_reverts"] == 0 and conf["q"]["conflict_score"] == 0.0


def test_graph_distances_planted_path(spark, tmp_path):
    """Hub clique (a b c, heavily co-mentioned, the 3 strongest nodes =
    seeds at dist 0) with a chain a—d—e: d is 1 hop, e is 2 hops."""
    rows = []
    i = 0
    for _ in range(8):
        rows.append((i, "a b c", "p", "en", 1)); i += 1
    for _ in range(5):
        rows.append((i, "a d", "p", "en", 1)); i += 1
    for _ in range(5):
        rows.append((i, "d e", "p", "en", 1)); i += 1
    for _ in range(10):
        rows.append((i, "x y", "p", "en", 1)); i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.graph import graph_distances

    got = {r["anchor"]: r["dist"] for r in graph_distances(spark, str(out)).collect()}
    assert got["a"] == 0 and got["b"] == 0 and got["c"] == 0
    assert got["d"] == 1 and got["e"] == 2
    assert "x" not in got and "y" not in got  # disconnected component


def test_rocchio_excludes_query_terms_and_ranks_by_tf(spark):
    """Expansion terms never contain the original query terms, and the
    list is ordered by relevant-set tf (desc, term asc)."""
    from tests.conftest import SF_DIR
    from hedera_spark.operators.ir import BM25_QUERY_TERMS, rocchio_expansion

    rows = rocchio_expansion(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    assert not any(r["term"] in BM25_QUERY_TERMS for r in rows)
    keys = [(-r["rel_tf"], r["term"]) for r in rows]
    assert keys == sorted(keys)


def test_lang_id_ngram_recovers_planted_scripts(spark, tmp_path):
    """Two 'languages' with disjoint character inventories: the trigram
    profile classifies every doc back to its own label."""
    rows = []
    for i in range(10):
        rows.append((i, "aaa bbb aaa bbb aaa", "p", "en", 1))
    for i in range(10, 20):
        rows.append((i, "zzz yyy zzz yyy zzz", "p", "fr", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import lang_id_ngram

    got = {r["doc_id"]: r for r in lang_id_ngram(spark, str(out)).collect()}
    assert all(got[i]["pred_lang"] == "en" for i in range(10))
    assert all(got[i]["pred_lang"] == "fr" for i in range(10, 20))
    assert all(r["best_score"] > 0 for r in got.values())


def test_graph_neighbor_jaccard_planted_structure(spark, tmp_path):
    """Clique a-b-c plus pendant d on a: edge (b,c) has common neighbor
    a only, N(b)={a,c}, N(c)={a,b} -> jaccard 1/3; edge (a,d): d's only
    neighbor is a, no common neighbors -> jaccard 0."""
    rows = []
    i = 0
    for _ in range(6):
        rows.append((i, "a b c", "p", "en", 1)); i += 1
    for _ in range(6):
        rows.append((i, "a d", "p", "en", 1)); i += 1
    for _ in range(6):
        rows.append((i, "x y", "p", "en", 1)); i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.graph import graph_neighbor_jaccard

    got = {(r["a1"], r["a2"]): r for r in graph_neighbor_jaccard(spark, str(out)).collect()}
    assert got[("b", "c")]["common_neighbors"] == 1
    assert abs(got[("b", "c")]["jaccard"] - round(1 / 3, 6)) < 1e-9
    assert got[("a", "d")]["common_neighbors"] == 0
    assert got[("a", "d")]["jaccard"] == 0.0


def test_bigram_pmi_prefers_exclusive_pair(spark, tmp_path):
    """'p q' always co-occur exclusively; 'r' pairs with many partners.
    The exclusive bigram gets the highest PMI."""
    rows = []
    i = 0
    for _ in range(10):
        rows.append((i, "p q p q p q", "s", "en", 1)); i += 1
    for part in ["r s", "r t", "r u", "r v"]:
        for _ in range(5):
            rows.append((i, part + " " + part, "s", "en", 1)); i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import bigram_pmi

    got = bigram_pmi(spark, str(out)).collect()
    assert got[0]["w1"] == "p" and got[0]["w2"] == "q"
    keys = [(-r["pmi"], r["w1"], r["w2"]) for r in got]
    assert keys == sorted(keys)


def test_sparse_cosine_identical_docs_score_one(spark, tmp_path):
    """A query doc with an identical twin ranks the twin first with
    cosine 1.0; an orthogonal-vocabulary doc never outranks it."""
    same = "alpha beta gamma delta alpha beta"
    other = "zeta eta theta iota kappa lambda"
    docs = spark.createDataFrame(
        [
            (0, same, "p", "en", 1),     # query (0 % 25 == 0)
            (1, same, "p", "en", 1),     # identical twin
            (2, other, "p", "en", 1),    # disjoint vocabulary
            (3, "alpha beta zeta eta xx yy", "p", "en", 1),  # partial
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.ir import sparse_cosine_topk

    got = {r["rk"]: r for r in sparse_cosine_topk(spark, str(out)).collect()
           if r["q_id"] == 0}
    assert got[1]["neighbor_id"] == 1 and got[1]["cos"] == 1.0
    # disjoint-vocab doc shares no weighted term: absent or last
    ids = [got[k]["neighbor_id"] for k in sorted(got)]
    assert 2 not in ids or ids[-1] == 2


def test_multimodal_resample_integer_plan(spark, tmp_path):
    """The resample plan is exact integer arithmetic on the stub header:
    out_samples = n_samples * 16000 // src_rate, chunk count is ceil
    division, duration follows the source rate."""
    docs = spark.createDataFrame(
        [(1, "x" * 10, "p", "en", 10), (2, "y" * 23, "p", "en", 23)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.multimodal import (
        CHUNK_SAMPLES,
        TARGET_RATE,
        _audio_stub,
        multimodal_resample,
    )

    got = {r["doc_id"]: r for r in multimodal_resample(spark, str(out)).collect()}
    for doc_id, text in [(1, "x" * 10), (2, "y" * 23)]:
        src_rate, n_samples, n = _audio_stub(text.encode())
        r = got[doc_id]
        assert r["src_rate"] == src_rate and r["n_samples"] == n_samples
        assert r["out_samples"] == n_samples * TARGET_RATE // src_rate
        assert r["duration_ms"] == n_samples * 1000 // src_rate
        assert r["chunks"] == (r["out_samples"] + CHUNK_SAMPLES - 1) // CHUNK_SAMPLES


def test_skipgram_pairs_window_and_counts(spark, tmp_path):
    """'a b c d' with window 3 yields forward pairs (a,b) (a,c) (a,d)
    (b,c) (b,d) (c,d); repeated 5 times all clear the min-count cut
    with count 5, and a pair beyond the window never appears."""
    docs = spark.createDataFrame(
        [(i, "a b c d e", "p", "en", 1) for i in range(5)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import skipgram_pairs

    got = {(r["w1"], r["w2"]): r["n_pairs"] for r in skipgram_pairs(spark, str(out)).collect()}
    assert got[("a", "b")] == 5 and got[("a", "d")] == 5
    assert ("a", "e") not in got  # distance 4 > window 3
    assert got[("b", "e")] == 5


def test_sample_fixed_k_is_exact_and_stable(spark, tmp_path):
    """Exactly K docs per language, and the selection is identical
    across two runs (hash-ordered, not scan-ordered)."""
    rows = [(i, f"text {i}", "p", "en" if i % 2 else "fr", 1) for i in range(60)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import (
        SAMPLE_K_PER_GROUP,
        sample_fixed_k,
    )

    a = {(r["lang"], r["doc_id"]) for r in sample_fixed_k(spark, str(out)).collect()}
    b = {(r["lang"], r["doc_id"]) for r in sample_fixed_k(spark, str(out)).collect()}
    assert a == b
    for lang in ("en", "fr"):
        assert sum(1 for l, _ in a if l == lang) == SAMPLE_K_PER_GROUP


def test_text_normalize_detects_variants(spark, tmp_path):
    """Case/punctuation variants normalize to the SAME hash; an already
    clean doc is unchanged with zero chars removed."""
    docs = spark.createDataFrame(
        [
            (1, "Hello,  World! 42", "p", "en", 1),
            (2, "hello world", "p", "en", 1),
            (3, "clean text here", "p", "en", 1),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import text_normalize

    got = {r["doc_id"]: r for r in text_normalize(spark, str(out)).collect()}
    assert got[1]["norm_hash"] == got[2]["norm_hash"]
    assert got[1]["changed"] and not got[3]["changed"]
    assert got[3]["chars_removed"] == 0


def test_graph_assortativity_star_is_negative(spark, tmp_path):
    """A star (hub h with 4 leaves) is maximally disassortative: every
    edge connects degree-4 to degree-1, r = -1."""
    rows = []
    i = 0
    for leaf in ["l1", "l2", "l3", "l4"]:
        for _ in range(5):
            rows.append((i, f"h {leaf}", "p", "en", 1)); i += 1
    for _ in range(10):
        rows.append((i, "x y", "p", "en", 1)); i += 1  # df-cap ballast
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.graph import graph_assortativity

    got = graph_assortativity(spark, str(out)).collect()
    assert len(got) == 1
    # star edges: (4,1)×4 and (1,4)×4 plus the x-y pair (1,1)×2 pulls r
    # off exactly -1 but keeps it strongly negative
    assert got[0]["assortativity"] < -0.5


def test_embedding_pca_recovers_planted_axis(spark, tmp_path):
    """A cloud whose only variance lies along dimension 0 (all other
    coordinates constant) has top principal component e0 with
    explained share 1; the uniform power-iteration start has a positive
    projection on e0, so the loading converges to +1."""
    rows = [
        (i, [float(i)] + [0.5] * 63, 0)
        for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = tmp_path / "mini"
    emb.write.parquet(str(out / "embeddings.parquet"))
    from hedera_spark.operators.pca import embedding_pca

    got = {r["dim"]: r for r in embedding_pca(spark, str(out)).collect()}
    assert len(got) == 64
    assert got[0]["loading"] > 0.999
    assert got[0]["explained_share"] > 0.999
    assert all(abs(got[d]["loading"]) < 1e-3 for d in range(1, 64))


def test_kn_bigram_lm_hand_computed(spark, tmp_path):
    """Interpolated Kneser-Ney on a corpus small enough to smooth by
    hand: bigram types (a,b):5 (a,c):3 (d,b):4, so N1+(a,.)=2,
    N1+(.,b)=2, N1+(.,.)=3, c(a,.)=8, c(d,.)=4, D=0.75:
      P(b|a) = (4.25 + 0.75*2*(2/3)) / 8 = 0.65625
      P(c|a) = (2.25 + 0.75*2*(1/3)) / 8 = 0.34375
      P(b|d) = (3.25 + 0.75*1*(2/3)) / 4 = 0.9375
    """
    rows = (
        [(i, "a b", "p", "en", 3) for i in range(5)]
        + [(i + 10, "a c", "p", "en", 3) for i in range(3)]
        + [(i + 20, "d b", "p", "en", 3) for i in range(4)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.lm import kn_bigram_lm

    got = {(r["w1"], r["w2"]): r for r in kn_bigram_lm(spark, str(out)).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("d", "b")}
    assert got[("a", "b")]["c12"] == 5
    assert got[("a", "b")]["p_kn"] == 0.65625
    assert got[("a", "c")]["p_kn"] == 0.34375
    assert got[("d", "b")]["p_kn"] == 0.9375


def test_late_events_bucket_boundaries_and_permutation(spark, tmp_path):
    """Planted disorder hits every bucket once (user 1: 0.5 s, 30 s,
    300 s, 3000 s, 7200 s behind the running max), and the deterministic
    arrival permutation (id % 8 == 0 displaced 5 positions) turns user
    2's perfectly time-ordered block into one ge_1h late event."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    t = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        (1, t(1000.0), 1), (2, t(999.5), 1), (3, t(2000.0), 1),
        (4, t(1970.0), 1), (5, t(3000.0), 1), (6, t(2700.0), 1),
        (7, t(4000.0), 1), (9, t(1000.0 + 0), 1), (10, t(10000.0), 1),
        (11, t(2800.0), 1),
        # user 2: ids 16..20 time-ordered, but 16 arrives after 20
        (16, t(0.0), 2), (17, t(3600.0), 2), (18, t(7200.0), 2),
        (19, t(10800.0), 2), (20, t(14400.0), 2),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, "view", 1.0, "{}") for i, ts, u in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import late_events

    got = {r["bucket"]: (r["n_events"], r["n_users"]) for r in late_events(spark, str(out)).collect()}
    assert got["0_in_order"] == (9, 2)  # 5 of user 1, 4 of user 2
    assert got["1_lt_1s"] == (1, 1)     # id2: 0.5 s behind id1
    assert got["2_lt_1m"] == (1, 1)     # id4: 30 s behind id3
    assert got["3_lt_10m"] == (1, 1)    # id6: 300 s behind id5
    assert got["4_lt_1h"] == (1, 1)     # id9: 3000 s behind id7
    assert got["5_ge_1h"] == (2, 2)     # id11 (7200 s) + permuted id16


def test_vocab_coverage_known_frequencies(spark, tmp_path):
    """150 terms with frequencies 150..1 (term w_i appears 151-i times):
    the top-100 vocabulary covers sum(51..150) = 10050 of 11325
    occurrences; 1000 and 10000 saturate at full coverage."""
    rows = [
        (i, " ".join([f"w{i:03d}"] * (151 - i)), "p", "en", 1)
        for i in range(1, 151)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import vocab_coverage

    got = {r["vocab_size"]: r for r in vocab_coverage(spark, str(out)).collect()}
    assert set(got) == {100, 1000, 10000}
    assert got[100]["total_tokens"] == 11325
    assert got[100]["covered_tokens"] == 10050
    assert got[100]["coverage"] == round(10050 / 11325, 6)
    assert got[1000]["covered_tokens"] == 11325
    assert got[1000]["coverage"] == 1.0
    assert got[10000]["coverage"] == 1.0


def test_pack_efficiency_hand_computed(spark, tmp_path):
    """Docs of 100/600/1500 tokens at L=512 need 1+2+3 sequences with
    412+424+36 = 872 padded tokens of 6*512 slots."""
    rows = [
        (1, " ".join(["a"] * 100), "p", "en", 1),
        (2, " ".join(["b"] * 600), "p", "en", 1),
        (3, " ".join(["c"] * 1500), "p", "en", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import pack_efficiency

    got = {r["seq_len"]: r for r in pack_efficiency(spark, str(out)).collect()}
    assert set(got) == {512, 1024, 2048, 4096}
    r = got[512]
    assert r["n_docs"] == 3 and r["total_tokens"] == 2200
    assert r["n_sequences"] == 6 and r["padded_tokens"] == 872
    assert r["padding_share"] == round(872 / 3072, 6)
    assert got[4096]["n_sequences"] == 3


def test_dedup_threshold_sweep_monotone_with_planted_trio(spark, tmp_path):
    """Three identical vectors share every LSH bucket, so their three
    pairs fire at every threshold; pair counts are non-increasing in the
    threshold and dropped vectors never exceed pairs."""
    import random

    rng = random.Random(11)
    rows = [(vid, [rng.uniform(-1, 1) for _ in range(64)], 0) for vid in range(30)]
    base = [rng.uniform(-1, 1) for _ in range(64)]
    for vid in (100, 101, 102):
        rows.append((vid, list(base), 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "mini"
    emb.write.parquet(str(out / "embeddings.parquet"))
    from hedera_spark.operators.similarity import SWEEP_THRESHOLDS, dedup_threshold_sweep

    got = {r["threshold"]: r for r in dedup_threshold_sweep(spark, str(out)).collect()}
    assert got[0.8]["n_pairs"] >= 3  # the planted identical trio
    assert got[0.8]["n_dropped"] >= 2  # 101 and 102 drop against 100
    prev = None
    for t in SWEEP_THRESHOLDS:
        if t not in got:
            continue
        assert got[t]["n_dropped"] <= got[t]["n_pairs"]
        if prev is not None:
            assert got[t]["n_pairs"] <= prev
        prev = got[t]["n_pairs"]


def test_mix_temperature_two_langs_hand_computed(spark, tmp_path):
    """Two languages with 100 and 400 tokens: tau=1 gives the natural
    0.2/0.8 mixture; tau=0.5 gives 10/30 and 20/30."""
    rows = [
        (1, " ".join(["x"] * 100), "p", "en", 1),
        (2, " ".join(["y"] * 400), "p", "de", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import mix_temperature

    got = {(r["tau"], r["lang"]): r["mix_weight"] for r in mix_temperature(spark, str(out)).collect()}
    assert got[(1.0, "en")] == 0.2 and got[(1.0, "de")] == 0.8
    assert got[(0.5, "en")] == round(10 / 30, 6)
    assert got[(0.5, "de")] == round(20 / 30, 6)


def test_quality_threshold_sweep_planted_gate(spark, tmp_path):
    """Doc A (60 distinct non-stopword tokens) scores quality 1.0; doc B
    (20 repeated stopwords) scores 0.215 and clears no cutoff — every
    sweep row counts exactly doc A's 60 of 80 tokens."""
    rows = [
        (1, " ".join(f"t{i}" for i in range(60)), "p", "en", 1),
        (2, " ".join(["the"] * 20), "p", "en", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import (
        QUALITY_CUTOFFS,
        quality_threshold_sweep,
    )

    got = {r["cutoff"]: r for r in quality_threshold_sweep(spark, str(out)).collect()}
    assert set(got) == set(QUALITY_CUTOFFS)
    for c in QUALITY_CUTOFFS:
        assert got[c]["n_docs"] == 1 and got[c]["n_tokens"] == 60
        assert got[c]["doc_share"] == 0.5
        assert got[c]["token_share"] == 0.75


def test_contamination_report_planted_buckets(spark, tmp_path):
    """Eval doc 25 contributes two trigram shingles; train doc 1 shares
    one of them, doc 2 shares both, doc 3 is clean — one doc in each of
    buckets 0, 1, 2 over a 3-doc training corpus."""
    rows = [
        (25, "alpha beta gamma delta", "p", "en", 1),  # eval (25 % 25 == 0)
        (1, "x alpha beta gamma y", "p", "en", 1),
        (2, "q1 alpha beta gamma q2 beta gamma delta", "p", "en", 1),
        (3, "totally clean text here now", "p", "en", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.dedup import contamination_report

    got = {r["bucket"]: r for r in contamination_report(spark, str(out)).collect()}
    assert got["0"]["n_docs"] == 1 and got["0"]["share"] == round(1 / 3, 6)
    assert got["1"]["n_docs"] == 1
    assert got["2"]["n_docs"] == 1
    assert set(got) == {"0", "1", "2"}


def test_minhash_band_sweep_nested_configs(spark, tmp_path):
    """Band configs nest by halving, so candidate sets are supersets as
    bands widen: n_candidates is monotone non-increasing in
    rows_per_band. A planted identical pair (all 16 minhashes equal)
    survives even the strictest 2x8 config with est_jaccard 1.0, while
    disjoint-vocabulary docs never produce strict-config candidates."""
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(12)), "p", "en", 1) for i in range(10)]
    dup = " ".join(f"d_{j}" for j in range(12))
    rows += [(100, dup, "p", "en", 1), (101, dup, "p", "en", 1)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.dedup import minhash_band_sweep

    got = {
        (r["n_bands"], r["rows_per_band"]): r
        for r in minhash_band_sweep(spark, str(out)).collect()
    }
    assert got[(2, 8)]["n_candidates"] == 1
    assert got[(2, 8)]["mean_est_jaccard"] == 1.0
    counts = [
        got[cfg]["n_candidates"]
        for cfg in [(16, 1), (8, 2), (4, 4), (2, 8)]
        if cfg in got
    ]
    assert counts == sorted(counts, reverse=True)


def test_doc_perplexity_kn_matches_hand_model(spark, tmp_path):
    """Doc scores are the average ln of the same hand-computed KN values
    as test_kn_bigram_lm_hand_computed: a doc that is exactly 'a b'
    scores ln P(b|a); 'a c' scores ln P(c|a)."""
    import math

    rows = (
        [(i, "a b", "p", "en", 3) for i in range(5)]
        + [(i + 10, "a c", "p", "en", 3) for i in range(3)]
        + [(i + 20, "d b", "p", "en", 3) for i in range(4)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.lm import doc_perplexity_kn

    got = {r["doc_id"]: r for r in doc_perplexity_kn(spark, str(out)).collect()}
    assert len(got) == 12
    assert got[0]["n_bigrams"] == 1
    assert got[0]["avg_logprob_kn"] == round(math.log(0.65625), 6)
    assert got[10]["avg_logprob_kn"] == round(math.log(0.34375), 6)
    assert got[20]["avg_logprob_kn"] == round(math.log(0.9375), 6)


def test_asof_join_nearest_directions_and_ties(spark, tmp_path):
    """Nearest-match picks backward at distance 10 vs 20, forward at 5
    vs 25, backward-only when no later purchase exists, ties resolve
    backward, and purchase-less users keep nulls."""
    import datetime as dt

    base = dt.datetime(2024, 5, 1)
    t = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        (1, t(100), 1, "purchase", 5.0), (2, t(110), 1, "view", 0.0),
        (3, t(130), 1, "purchase", 7.0), (4, t(125), 1, "view", 0.0),
        (5, t(160), 1, "view", 0.0),
        (10, t(100), 2, "view", 0.0),
        (20, t(100), 3, "purchase", 1.0), (21, t(120), 3, "purchase", 2.0),
        (22, t(110), 3, "view", 0.0),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.temporal_join import asof_join_nearest

    got = {r["event_id"]: r for r in asof_join_nearest(spark, str(out)).collect()}
    assert got[2]["purchase_event_id"] == 1 and got[2]["direction"] == "backward"
    assert got[2]["micros_to_purchase"] == 10_000_000
    assert got[4]["purchase_event_id"] == 3 and got[4]["direction"] == "forward"
    assert got[4]["micros_to_purchase"] == 5_000_000
    assert got[5]["purchase_event_id"] == 3 and got[5]["direction"] == "backward"
    assert got[10]["purchase_event_id"] is None and got[10]["direction"] is None
    assert got[22]["purchase_event_id"] == 20 and got[22]["direction"] == "backward"


def test_blocklist_gate_counts_and_keep(spark, tmp_path):
    """Distinct-term and occurrence counts plus the C4 any-hit drop:
    'dup spam dup' drops with 2 distinct / 3 occurrences; case-folded
    'DUP' drops; a clean doc keeps."""
    rows = [
        (1, "dup spam dup spam dup", "p", "en", 1),
        (2, "clean text only", "p", "en", 1),
        (3, "DUP inside", "p", "en", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.corpus_clean import blocklist_gate

    got = {r["doc_id"]: r for r in blocklist_gate(spark, str(out)).collect()}
    assert got[1]["n_blocked_terms"] == 2
    assert got[1]["n_blocked_occurrences"] == 5
    assert not got[1]["keep"]
    assert got[2]["n_blocked_occurrences"] == 0 and got[2]["keep"]
    assert got[3]["n_blocked_occurrences"] == 1 and not got[3]["keep"]


def test_data_profile_counts_and_minmax(spark, tmp_path):
    """Per-column nulls / distincts / typed min-max on a hand-built
    events table, including a NULL props row and duplicate user_ids."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10, "view", 1.5, '{"k":1}'),
        (2, dt.datetime(2024, 1, 2, 0, 0, 0), 10, "view", -2.0, None),
        (3, dt.datetime(2024, 1, 3, 0, 0, 0), 20, "purchase", 0.25, '{"k":2}'),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.profile import data_profile

    got = {r["col_name"]: r for r in data_profile(spark, str(out)).collect()}
    assert set(got) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert all(r["n_rows"] == 3 for r in got.values())
    assert got["props"]["n_nonnull"] == 2 and got["props"]["n_distinct"] == 2
    assert got["user_id"]["n_distinct"] == 2
    assert got["user_id"]["min_num"] == 10.0 and got["user_id"]["max_num"] == 20.0
    assert got["value"]["min_num"] == -2.0 and got["value"]["max_num"] == 1.5
    assert got["event_type"]["min_str"] == "purchase"
    assert got["event_type"]["max_str"] == "view"
    assert got["event_type"]["min_num"] is None
    # ts profiles as epoch micros
    assert got["ts"]["min_num"] == dt.datetime(
        2024, 1, 1, tzinfo=dt.timezone.utc
    ).timestamp() * 1e6


def test_quantile_error_rank_bracket(spark):
    """The sketch audit's observed ranks must bracket the target
    quantile within the approx_percentile rank-error guarantee
    (default accuracy 10000 -> rank error <= 1e-4·n, loosened here to
    1% for tie-width): rank_lt <= q <= rank_le ± eps. The exact
    projection (the gate-graded entry) must bracket q with NO sketch
    slack: rank_lt <= q <= rank_le holds for interpolated percentiles
    by construction."""
    from tests.conftest import SF_DIR
    from hedera_spark.operators.profile import quantile_error, quantile_error_audit

    rows = quantile_error_audit(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["rank_lt"] - 0.01 <= r["q"] <= r["rank_le"] + 0.01, r

    exact = quantile_error(spark, SF_DIR).collect()
    assert len(exact) > 0
    for r in exact:
        # interpolated percentile sits between order statistics, so the
        # observed rank brackets q to within one rank step (1/n)
        step = 1.0 / r["n"]
        assert r["rank_lt"] <= r["q"] + step + 1e-9, r
        assert r["q"] <= r["rank_le"] + step + 1e-9, r


def test_dup_by_source_within_and_cross(spark, tmp_path):
    """Source 'a': two identical docs (in-source dup) plus a doc mirrored
    into source 'b' (cross-source dup); source 'c' is clean."""
    rows = [
        (1, "same text one", "a", "en", 1),
        (2, "same text one", "a", "en", 1),
        (3, "mirrored text", "a", "en", 1),
        (4, "mirrored text", "b", "en", 1),
        (5, "unique text b", "b", "en", 1),
        (6, "unique text c", "c", "en", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.dedup import dup_by_source

    got = {r["source"]: r for r in dup_by_source(spark, str(out)).collect()}
    assert got["a"]["n_docs"] == 3 and got["a"]["n_dup"] == 3
    assert got["a"]["n_cross_dup"] == 1  # only the mirrored doc
    assert got["b"]["n_dup"] == 1 and got["b"]["n_cross_dup"] == 1
    assert got["c"]["n_dup"] == 0 and got["c"]["cross_dup_frac"] == 0.0


def test_attribution_last_touch_ties_and_null(spark, tmp_path):
    """Purchase credits the LATEST at-or-before view (same-ts view wins);
    a purchase with no prior view lands in the NULL-campaign row."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: view(k=7) at t1, view(k=9) at t3, purchase at t3 (tie ->
        # same-ts view k=9 wins), purchase at t5 (still k=9)
        (1, t(1), 1, "view", 0.0, '{"k": 7}'),
        (2, t(3), 1, "view", 0.0, '{"k": 9}'),
        (3, t(3), 1, "purchase", 10.0, '{"k": 0}'),
        (4, t(5), 1, "purchase", 5.0, '{"k": 0}'),
        # user 2: purchase with no view at all
        (5, t(2), 2, "purchase", 2.5, '{"k": 0}'),
        # noise: clicks never attribute
        (6, t(0), 1, "click", 0.0, '{"k": 1}'),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.temporal_join import attribution_last_touch

    got = {r["campaign"]: r for r in attribution_last_touch(spark, str(out)).collect()}
    assert got[9]["n_purchases"] == 2
    assert abs(got[9]["attributed_revenue"] - 15.0) < 1e-9
    assert got[None]["n_purchases"] == 1
    assert abs(got[None]["attributed_revenue"] - 2.5) < 1e-9
    assert 7 not in got


def test_label_cohesion_separates_planted_clusters(spark, tmp_path):
    """Two tight, orthogonal-ish label clusters: own-centroid cosine must
    beat the global-centroid cosine for both labels."""
    import random

    rng = random.Random(7)
    rows = []
    for vid in range(40):
        label = vid % 2
        base = [1.0, 0.0] if label == 0 else [0.0, 1.0]
        vec = [
            base[d % 2] + rng.uniform(-0.05, 0.05) for d in range(64)
        ]
        rows.append((vid, vec, label))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = tmp_path / "mini"
    emb.write.parquet(str(out / "embeddings.parquet"))
    from hedera_spark.operators.similarity import label_cohesion

    got = {r["label"]: r for r in label_cohesion(spark, str(out)).collect()}
    assert set(got) == {0, 1}
    for lab in (0, 1):
        assert got[lab]["n"] == 20
        assert got[lab]["mean_cos_own"] > got[lab]["mean_cos_global"]
        assert got[lab]["separation"] > 0.0


def test_dedup_containment_finds_doc_inside_doc(spark, tmp_path):
    """A short doc quoted whole inside a long one: Jaccard is small (big
    union) but containment of the short doc is 1.0 — the asymmetric
    detector must fire where the symmetric one doesn't."""
    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [
        (1, short, "p", "en", 1),
        (2, filler + " " + short, "p", "en", 1),
        (3, "totally different text here now", "p", "en", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.dedup import (
        dedup_containment,
        dedup_ngram_jaccard,
    )

    cont = {(r["doc_a"], r["doc_b"]): r for r in dedup_containment(spark, str(out)).collect()}
    assert (1, 2) in cont
    assert cont[(1, 2)]["cont_a_in_b"] == 1.0  # all of doc 1's shingles in doc 2
    assert cont[(1, 2)]["cont_b_in_a"] < 0.1
    # the symmetric detector misses the same pair
    jac = {(r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, str(out)).collect()}
    assert (1, 2) not in jac


def test_robust_stats_clips_outliers(spark, tmp_path):
    """One fat-finger value: the clipped mean must sit near the bulk,
    and the outlier is counted in n_above."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i % 60), i, "view", 1.0, "{}")
        for i in range(99)
    ] + [(99, dt.datetime(2024, 1, 1, 0, 1, 0), 99, "view", 10000.0, "{}")]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import robust_stats

    got = robust_stats(spark, str(out)).collect()[0]
    assert got["n"] == 100 and got["n_above"] == 1
    # raw mean would be ~101; clipped mean must stay near 1 (p99 fence
    # interpolates just above the bulk)
    assert got["clipped_mean"] < 110.0 and got["clipped_mean"] >= 1.0


def test_event_transitions_probabilities(spark, tmp_path):
    """Hand-built timeline: view->click twice, view->purchase once for
    user 1; probabilities row-normalize per source type."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(1), 1, "view", 0.0, "{}"),
        (2, t(2), 1, "click", 0.0, "{}"),
        (3, t(3), 1, "view", 0.0, "{}"),
        (4, t(4), 1, "click", 0.0, "{}"),
        (5, t(5), 1, "view", 0.0, "{}"),
        (6, t(6), 1, "purchase", 1.0, "{}"),
        # user 2 contributes the third click->view step (user 1's two
        # clicks each transition back to a view)
        (7, t(1), 2, "click", 0.0, "{}"),
        (8, t(2), 2, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import event_transitions

    got = {
        (r["event_type"], r["next_type"]): (r["n"], r["prob"])
        for r in event_transitions(spark, str(out)).collect()
    }
    assert got[("view", "click")] == (2, 0.666667)
    assert got[("view", "purchase")] == (1, 0.333333)
    assert got[("click", "view")] == (3, 1.0)
    assert ("purchase", "view") not in got  # purchase at t6 is terminal


def test_ql_topk_prefers_term_rich_docs(spark, tmp_path):
    """A doc containing the query terms must outrank an equal-length doc
    without them; smoothing still scores the term-free doc (finite)."""
    from hedera_spark.operators.ir import BM25_QUERY_TERMS, ql_topk

    q0, q1 = BM25_QUERY_TERMS[0], BM25_QUERY_TERMS[1]
    rows = [
        (1, f"{q0} {q1} {q0} filler words here", "p", "en", 1),
        (2, "filler words here and more filler", "p", "en", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    got = {r["doc_id"]: r["score"] for r in ql_topk(spark, str(out)).collect()}
    assert set(got) == {1, 2}
    assert got[1] > got[2]
    import math

    assert all(math.isfinite(v) for v in got.values())


def test_length_quality_curve_deciles_partition_corpus(spark):
    """Deciles cover every doc exactly once and are ordered by length."""
    from tests.conftest import SF_DIR
    from hedera_spark.operators.text_analysis import length_quality_curve
    from hedera_spark.sources.tables import load_table

    rows = sorted(
        length_quality_curve(spark, SF_DIR).collect(), key=lambda r: r["decile"]
    )
    n_total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["max_chars"] <= b["min_chars"] or a["max_chars"] <= b["max_chars"]


def test_profile_drift_detects_planted_shift(spark, tmp_path):
    """Half A uniform-low values, half B shifted high: the top buckets
    must hold B's mass and the PSI terms must be large and positive."""
    import datetime as dt

    rows = []
    for i in range(100):
        # first half: values 0..9; second half: values 100..109
        half_a = i < 50
        ts = dt.datetime(2024, 1, 1 if half_a else 20, 0, 0, i % 60)
        rows.append((i, ts, i, "view", float(i % 10 + (0 if half_a else 100)), "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.profile import profile_drift

    got = {r["bucket"]: r for r in profile_drift(spark, str(out)).collect()}
    assert sum(r["n_a"] for r in got.values()) == 50
    assert sum(r["n_b"] for r in got.values()) == 50
    # every B value exceeds every A fence -> all of B lands in bucket 10
    assert got[10]["n_b"] == 50 and got[10]["n_a"] <= 5
    psi = sum(r["psi_term"] for r in got.values() if r["psi_term"] is not None)
    assert psi > 0.2  # conventional "investigate" threshold


def test_corpus_rollup_totals_reconcile(spark):
    """Grand total row equals the sum of per-lang subtotals equals the
    sum of leaf cells."""
    from tests.conftest import SF_DIR
    from hedera_spark.operators.text_analysis import corpus_rollup

    rows = corpus_rollup(spark, SF_DIR).collect()
    grand = [r for r in rows if r["lang"] is None and r["source"] is None]
    langs = [r for r in rows if r["lang"] is not None and r["source"] is None]
    leaves = [r for r in rows if r["lang"] is not None and r["source"] is not None]
    assert len(grand) == 1
    assert grand[0]["n_docs"] == sum(r["n_docs"] for r in langs) == sum(
        r["n_docs"] for r in leaves
    )
    assert grand[0]["total_chars"] == sum(r["total_chars"] for r in leaves)


def test_fk_integrity_counts_planted_orphans(spark, tmp_path):
    """One orphan nation key on customer (2 rows sharing it) must show up
    as 2 orphan rows / 1 orphan key on exactly that edge."""
    out = tmp_path / "mini"
    spark.createDataFrame(
        [(1, "a", 10, 0.0, "m"), (2, "b", 10, 0.0, "m"), (3, "c", 1, 0.0, "m")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    ).write.parquet(str(out / "customer.parquet"))
    spark.createDataFrame(
        [(1, "n", 1)], "n_nationkey long, n_name string, n_regionkey long"
    ).write.parquet(str(out / "nation.parquet"))
    spark.createDataFrame(
        [(1, "r")], "r_regionkey long, r_name string"
    ).write.parquet(str(out / "region.parquet"))
    for name, schema in [
        ("supplier", "s_suppkey long, s_name string, s_nationkey long,"
                     " s_acctbal double"),
        ("part", "p_partkey long, p_name string, p_brand string,"
                 " p_type string, p_size int, p_retailprice double"),
        ("orders", "o_orderkey long, o_custkey long, o_orderstatus string,"
                   " o_totalprice double, o_orderdate timestamp,"
                   " o_orderpriority string"),
        ("lineitem", "l_orderkey long, l_partkey long, l_suppkey long,"
                     " l_linenumber int, l_quantity double,"
                     " l_extendedprice double, l_discount double,"
                     " l_tax double, l_returnflag string,"
                     " l_linestatus string, l_shipdate timestamp"),
    ]:
        spark.createDataFrame([], schema).write.parquet(
            str(out / f"{name}.parquet")
        )
    from hedera_spark.operators.profile import fk_integrity

    rows = {r["edge"]: r for r in fk_integrity(spark, str(out)).collect()}
    bad = rows["customer.c_nationkey->nation"]
    assert bad["n_child_rows"] == 3 and bad["n_child_keys"] == 2
    assert bad["n_orphan_rows"] == 2 and bad["n_orphan_keys"] == 1
    ok = rows["nation.n_regionkey->region"]
    assert ok["n_orphan_rows"] == 0 and ok["n_orphan_keys"] == 0


def test_fk_integrity_clean_on_testdata(spark):
    """The synthetic star schema must be referentially intact — every
    edge reports zero orphans (the monitor's steady-state reading)."""
    from hedera_spark.operators.profile import fk_integrity
    from tests.conftest import SF_DIR

    for r in fk_integrity(spark, SF_DIR).collect():
        assert r["n_orphan_rows"] == 0, r
        assert r["n_orphan_keys"] == 0, r


def test_session_paths_planted_sequences(spark, tmp_path):
    """Two users with a known shared path and one divergent session."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    # users 1 and 2: view > click in one session each
    for uid in (1, 2):
        for i, et in enumerate(["view", "click"]):
            rows.append((eid, base + dt.timedelta(seconds=i), uid, et, 1.0, "{}"))
            eid += 1
    # user 1, second session (2h later): a lone purchase
    rows.append((eid, base + dt.timedelta(hours=2), 1, "purchase", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import session_paths

    got = {r["path"]: r["n_sessions"] for r in session_paths(spark, str(out)).collect()}
    assert got == {"view>click": 2, "purchase": 1}


def test_attribution_linear_reconciles_and_splits(spark, tmp_path):
    """3 views then one $9.99 purchase: each campaign gets 3.33, the last
    touch absorbs the remainder cent-exactly; total always reconciles."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 7, "view", 0.0, '{"k": 1}'),
        (2, base + dt.timedelta(minutes=1), 7, "view", 0.0, '{"k": 2}'),
        (3, base + dt.timedelta(minutes=2), 7, "view", 0.0, '{"k": 3}'),
        (4, base + dt.timedelta(minutes=3), 7, "purchase", 9.99, '{"k": 0}'),
        # user 8: purchase with no views -> NULL campaign, full amount
        (5, base, 8, "purchase", 5.0, '{"k": 0}'),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.temporal_join import attribution_linear

    got = {r["campaign"]: r for r in attribution_linear(spark, str(out)).collect()}
    assert got[1]["attributed_revenue"] == 3.33
    assert got[2]["attributed_revenue"] == 3.33
    assert got[3]["attributed_revenue"] == 3.33  # 333 + remainder 0
    assert got[None]["attributed_revenue"] == 5.0
    total = sum(r["attributed_revenue"] for r in got.values())
    assert abs(total - 14.99) < 1e-9


def test_attribution_linear_reconciles_on_testdata(spark):
    """Integer micro-cent credits must reconcile to total purchase
    revenue bit-for-bit at corpus scale."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.temporal_join import attribution_linear
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    total_cents = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    )
    attributed = attribution_linear(spark, SF_DIR).agg(
        F.round(F.sum("attributed_revenue"), 2)
    ).collect()[0][0]
    assert abs(attributed - round(total_cents / 100.0, 2)) < 0.01


def test_retrieval_agreement_consistency(spark):
    """n_overlap in [0, 10]; jaccard == overlap / (20 - overlap);
    footrule bounded by 9 per common doc."""
    from hedera_spark.operators.ir import retrieval_agreement
    from tests.conftest import SF_DIR

    r = retrieval_agreement(spark, SF_DIR).collect()[0]
    assert 0 <= r["n_overlap"] <= 10
    assert abs(r["jaccard"] - r["n_overlap"] / (20 - r["n_overlap"])) < 1e-6
    assert 0 <= r["footrule"] <= 9 * r["n_overlap"]


def test_dedup_impact_reconciles_with_dedup_exact(spark):
    """Cell totals must equal the corpus row count and dedup_exact's
    survivor count; fractions sum to ~1 on both sides."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.dedup import dedup_exact, dedup_impact
    from tests.conftest import SF_DIR

    cells = dedup_impact(spark, SF_DIR).collect()
    n_before = sum(r["n_before"] for r in cells)
    n_after = sum(r["n_after"] for r in cells)
    ex = dedup_exact(spark, SF_DIR)
    assert n_before == ex.count()
    assert n_after == ex.where(F.col("is_dup") == 0).count()
    assert abs(sum(r["frac_before"] for r in cells) - 1.0) < 1e-3
    assert abs(sum(r["frac_after"] for r in cells) - 1.0) < 1e-3
    for r in cells:
        assert r["n_after"] <= r["n_before"]


def test_classifier_auc_bounds_and_tie_correction(spark):
    """AUC in [0, 1]; the classifier trained on these labels must rank
    better than chance (> 0.5); counts reconcile with the corpus."""
    from hedera_spark.operators.importance import classifier_auc
    from tests.conftest import SF_DIR

    r = classifier_auc(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["auc"] <= 1.0
    assert r["auc"] > 0.5  # trained on its own labels: must beat chance
    assert r["n_pos"] > 0 and r["n_neg"] > 0


def test_classifier_auc_perfect_and_random_split(spark, monkeypatch, tmp_path):
    """Hand-check the Mann-Whitney midrank formula on a tiny frame by
    monkeypatching the classifier: perfect separation -> 1.0; all-tied
    scores -> 0.5 exactly (the tie-correction's whole point)."""
    import hedera_spark.operators.importance as imp

    def fake_perfect(spark_, sf_dir_):
        return spark.createDataFrame(
            [(1, 0.9, True, 1), (2, 0.8, True, 1), (3, 0.2, False, 0)],
            "doc_id long, p double, pred boolean, y long",
        )

    monkeypatch.setattr(imp, "quality_classifier", fake_perfect)
    r = imp.classifier_auc(spark, "unused").collect()[0]
    assert r["auc"] == 1.0

    def fake_tied(spark_, sf_dir_):
        return spark.createDataFrame(
            [(1, 0.5, True, 1), (2, 0.5, True, 0), (3, 0.5, False, 1), (4, 0.5, False, 0)],
            "doc_id long, p double, pred boolean, y long",
        )

    monkeypatch.setattr(imp, "quality_classifier", fake_tied)
    r = imp.classifier_auc(spark, "unused").collect()[0]
    assert r["auc"] == 0.5


def test_term_entropy_uniform_vs_concentrated(spark, tmp_path):
    """A term spread 1-per-doc must hit norm_entropy 1.0; a term with
    all its mass in one doc plus a single stray occurrence must land
    strictly below."""
    docs = spark.createDataFrame(
        [
            (1, "flat burst burst burst burst burst burst burst", "p", "en", 1),
            (2, "flat burst", "p", "en", 1),
            (3, "flat x", "p", "en", 1),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.ir import term_entropy

    rows = {r["term"]: r for r in term_entropy(spark, str(out)).collect()}
    assert rows["flat"]["norm_entropy"] == 1.0  # 1 occurrence in each doc
    assert rows["burst"]["norm_entropy"] < rows["flat"]["norm_entropy"]
    assert rows["burst"]["df"] == 2 and rows["burst"]["cf"] == 8


def test_sample_weighted_favors_long_docs(spark):
    """The length-weighted sample's mean n_chars must exceed the corpus
    mean, and the selection must be reproducible run to run."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.text_analysis import sample_weighted
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    s1 = sample_weighted(spark, SF_DIR)
    mean_sample = s1.agg(F.avg("n_chars")).collect()[0][0]
    mean_corpus = (
        load_table(spark, SF_DIR, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert mean_sample > mean_corpus
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in sample_weighted(spark, SF_DIR).collect()}
    assert ids1 == ids2


def test_readability_formula_by_hand(spark, tmp_path):
    """4 words / 4 vowel runs, one 20-word sentence segment:
    flesch = 206.835 - 1.015*4 - 84.6*1."""
    docs = spark.createDataFrame(
        [(1, "cat dog bird fish", "p", "en", 17)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.text_analysis import readability

    r = readability(spark, str(out)).collect()[0]
    assert r["n_words"] == 4 and r["n_sentences"] == 1 and r["n_syllables"] == 4
    assert r["flesch"] == round(206.835 - 1.015 * 4 - 84.6 * 1, 4)


def test_ann_mrr_consistent_with_recall(spark):
    """rr > 0 exactly when found; rr = 1 iff the probe ranks the true
    neighbor first; found-rate can never exceed ann_recall's hit rate
    aggregated the same way."""
    from hedera_spark.operators.similarity import ann_mrr
    from tests.conftest import SF_DIR

    rows = ann_mrr(spark, SF_DIR).collect()
    assert rows, "query set is non-empty"
    for r in rows:
        assert (r["rr"] > 0) == (r["found"] == 1)
        assert 0.0 <= r["rr"] <= 1.0


def test_ks_drift_detects_planted_shift(spark, tmp_path):
    """Half A values at 1.00, half B at 101.00: the CDF gap must be 1.0
    at the low value."""
    import datetime as dt

    rows = []
    for i in range(100):
        half_a = i < 50
        ts = dt.datetime(2024, 1, 1 if half_a else 20, 0, 0, i % 60)
        rows.append((i, ts, i, "view", 1.0 if half_a else 101.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.profile import ks_drift

    r = ks_drift(spark, str(out)).collect()[0]
    assert r["d_stat"] == 1.0
    assert r["at_value"] == 1.0
    assert r["n_a"] == 50 and r["n_b"] == 50


def test_ks_drift_identical_halves_is_zero(spark, tmp_path):
    """The same value set in both halves: D must be exactly 0."""
    import datetime as dt

    rows = []
    for i in range(40):
        half_a = i < 20
        ts = dt.datetime(2024, 1, 1 if half_a else 20, 0, 0, i % 60)
        rows.append((i, ts, i, "view", float(i % 20), "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.profile import ks_drift

    r = ks_drift(spark, str(out)).collect()[0]
    assert r["d_stat"] == 0.0


def test_events_gap_stats_hand_computed(spark, tmp_path):
    """One user, events at 0s/10s/30s: gaps are 10 and 20 -> p50 = 15."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1, "view", 0.0, "{}"),
        (2, base + dt.timedelta(seconds=10), 1, "view", 0.0, "{}"),
        (3, base + dt.timedelta(seconds=30), 1, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import events_gap_stats

    r = events_gap_stats(spark, str(out)).collect()[0]
    assert r["n_gaps"] == 2
    assert r["p50_s"] == 15.0
    assert r["p99_s"] == round(10 + 0.99 * (20 - 10), 6)  # interpolated


def test_campaign_cooccur_lift_sanity(spark):
    """Pairs are ordered, shared counts respect the min cut, lift is
    positive, and n_shared can never exceed either reach."""
    from hedera_spark.operators.timeseries import (
        CAMPAIGN_MIN_SHARED,
        campaign_cooccur,
    )
    from tests.conftest import SF_DIR

    rows = campaign_cooccur(spark, SF_DIR).collect()
    assert rows, "sf0.001 corpus has co-exposed campaigns"
    for r in rows:
        assert r["k1"] < r["k2"]
        assert r["n_shared"] >= CAMPAIGN_MIN_SHARED
        assert r["n_shared"] <= min(r["reach1"], r["reach2"])
        assert r["lift"] > 0


def test_graph_two_hop_excludes_existing_edges(spark):
    """No predicted pair may be an edge of the strong backbone (the 60th
    weight-percentile subgraph the prediction runs on), pairs are
    ordered, every pair shares >= 1 common neighbor, and the backbone
    cut keeps the operator non-vacuous on a complete co-mention graph."""
    import statistics

    from hedera_spark.operators.anchors import anchor_cooccur
    from hedera_spark.operators.graph import graph_two_hop
    from tests.conftest import SF_DIR

    all_edges = anchor_cooccur(spark, SF_DIR).collect()
    ws = sorted(r["n_docs"] for r in all_edges)
    cut = statistics.quantiles(ws, n=100, method="inclusive")[59]
    strong = {
        (r["a1"], r["a2"]) for r in all_edges if r["n_docs"] >= cut
    }
    preds = graph_two_hop(spark, SF_DIR).collect()
    assert preds, "complete graph must still yield backbone predictions"
    for r in preds:
        assert r["a1"] < r["a2"]
        assert (r["a1"], r["a2"]) not in strong
        assert r["common_neighbors"] >= 1


def test_quality_mi_terms_sum_nonnegative_and_reconcile(spark):
    """MI = sum of terms must be >= 0 (information is non-negative up to
    rounding); cell counts reconcile to the corpus; independent margins
    appear in every cell."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.text_analysis import quality_mi
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    rows = quality_mi(spark, SF_DIR).collect()
    n_total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n"] for r in rows) == n_total
    mi = sum(r["mi_term"] for r in rows)
    assert mi >= -1e-5  # non-negative up to per-cell rounding
    for r in rows:
        assert 1 <= r["decile"] <= 10 and r["y"] in (0, 1)


def test_pv_dow_hour_reconciles(spark):
    """Cells cover the full log: counts sum to the event total and the
    keys stay inside the 7 x 24 grid."""
    from hedera_spark.operators.timeseries import pv_dow_hour
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    rows = pv_dow_hour(spark, SF_DIR).collect()
    assert sum(r["n_events"] for r in rows) == load_table(
        spark, SF_DIR, "events"
    ).count()
    for r in rows:
        assert 1 <= r["isodow"] <= 7
        assert 0 <= r["hour"] <= 23


def test_rare_token_ratio_planted_rare_token(spark, tmp_path):
    """20 docs of common tokens + one doc carrying a unique token: only
    that doc scores rare mass, exactly 1 of its 3 tokens."""
    rows = [(i, "common words here", "p", "en", 1) for i in range(20)]
    rows.append((99, "common words zyzzyx", "p", "en", 1))
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.ir import rare_token_ratio

    got = {r["doc_id"]: r for r in rare_token_ratio(spark, str(out)).collect()}
    assert got[99]["n_rare"] == 1 and got[99]["n_tokens"] == 3
    assert got[99]["rare_ratio"] == round(1 / 3, 6)
    assert all(got[i]["n_rare"] == 0 for i in range(20))


def test_graph_modularity_reconciles(spark):
    """Sum of internal weights <= m; degree weights sum to 2m; Q in
    [-0.5, 1]."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.anchors import anchor_cooccur
    from hedera_spark.operators.graph import graph_modularity
    from tests.conftest import SF_DIR

    rows = graph_modularity(spark, SF_DIR).collect()
    m = (
        anchor_cooccur(spark, SF_DIR)
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    assert sum(r["internal_w"] for r in rows) <= m
    assert sum(r["degree_w"] for r in rows) == 2 * m
    q = sum(r["q_term"] for r in rows)
    assert -0.5 <= q <= 1.0


def test_champion_lists_prefix_of_postings(spark, tmp_path):
    """Champions are the top-R by (tf desc, doc_id): hand-check on a
    planted frame where doc 3 has the highest tf."""
    docs = spark.createDataFrame(
        [
            (1, "w", "p", "en", 1),
            (2, "w w", "p", "en", 1),
            (3, "w w w", "p", "en", 1),
            (4, "w", "p", "en", 1),
            (5, "w", "p", "en", 1),
            (6, "w", "p", "en", 1),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "mini"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.ir import champion_lists

    r = {x["term"]: x for x in champion_lists(spark, str(out)).collect()}
    assert r["w"]["df"] == 6
    assert r["w"]["champions"] == "3:3,2:2,1:1,4:1,5:1"


def test_k_anonymity_flags_small_groups(spark):
    """Flags match the group sizes and the cells partition the corpus."""
    from hedera_spark.operators.profile import K_ANON, k_anonymity
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    rows = k_anonymity(spark, SF_DIR).collect()
    assert sum(r["n"] for r in rows) == load_table(
        spark, SF_DIR, "documents"
    ).count()
    for r in rows:
        assert r["at_risk"] == (1 if r["n"] < K_ANON else 0)


def test_pv_entropy_uniform_user_hits_one(spark, tmp_path):
    """A user with one event on each of 4 days: norm_entropy exactly 1;
    a user with 9 events on one day + 1 on another is far below."""
    import datetime as dt

    rows = []
    for d in range(4):
        rows.append((d, dt.datetime(2024, 1, 1 + d), 1, "view", 0.0, "{}"))
    eid = 10
    for i in range(9):
        rows.append((eid + i, dt.datetime(2024, 2, 1, i), 2, "view", 0.0, "{}"))
    rows.append((30, dt.datetime(2024, 2, 5), 2, "view", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "mini"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import pv_entropy

    got = {r["user_id"]: r for r in pv_entropy(spark, str(out)).collect()}
    assert got[1]["norm_entropy"] == 1.0
    assert got[2]["norm_entropy"] < 0.7


def test_model_registry_retrains_after_inplace_rewrite(spark, tmp_path):
    """The in-process model registries are keyed by (path, file-metadata
    fingerprint): rewriting a table in place under the SAME path within
    one session must retrain, not serve the stale model (the r4 advice
    item — a path-only key silently changes results with no error)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hedera_spark.operators.kmeans import kmeans_embeddings
    from hedera_spark.sources.tables import table_state_key

    def write(pts: dict) -> None:
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(list(pts), type=pa.int64()),
                    "embedding": pa.array(
                        list(pts.values()), type=pa.list_(pa.float32())
                    ),
                    "label": pa.array([0] * len(pts), type=pa.int32()),
                }
            ),
            tmp_path / "embeddings.parquet",
        )

    write({i: [float(i), 0.0] for i in range(1, 13)})
    key1 = table_state_key(str(tmp_path), "embeddings")
    first = {
        r["vec_id"]: r["dist2"]
        for r in kmeans_embeddings(spark, str(tmp_path)).collect()
    }
    # rewrite in place with DIFFERENT data; bump mtime explicitly so the
    # test never races a same-nanosecond rewrite
    write({i: [0.0, float(i) * 7.0] for i in range(1, 13)})
    st = os.stat(tmp_path / "embeddings.parquet")
    os.utime(tmp_path / "embeddings.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    assert table_state_key(str(tmp_path), "embeddings") != key1
    second = {
        r["vec_id"]: r["dist2"]
        for r in kmeans_embeddings(spark, str(tmp_path)).collect()
    }
    # served from a stale model, the new corpus scores absurd distances;
    # retrained, both runs converge on their own data -> same dist2 curve
    assert first != second  # different corpora -> different assignments
    assert max(second.values()) < 100.0  # not scored under corpus-1 centroids


def test_kmeans_silhouette_bounds_and_coverage(spark):
    """One row per non-empty cluster; mean silhouette in [-1, 1]; ns sum
    to the corpus."""
    from hedera_spark.operators.kmeans import kmeans_silhouette
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    rows = kmeans_silhouette(spark, SF_DIR).collect()
    assert rows
    assert sum(r["n"] for r in rows) == load_table(
        spark, SF_DIR, "embeddings"
    ).count()
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_ivf_nprobe_recall_monotone(spark):
    """Probing more cells can only add candidates, so pooled recall@3
    must be non-decreasing in nprobe — the invariant that makes the
    sweep a trustworthy tuning curve (minhash_band_sweep's nested-
    configs discipline applied to IVF)."""
    from hedera_spark.operators.similarity import ivf_nprobe_sweep
    from tests.conftest import SF_DIR

    rows = sorted(
        ivf_nprobe_sweep(spark, SF_DIR).collect(), key=lambda r: r["nprobe"]
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 3]
    recalls = [r["recall"] for r in rows]
    cands = [r["n_candidates"] for r in rows]
    assert recalls == sorted(recalls)
    assert cands == sorted(cands)


def test_bm25_sweep_default_matches_bm25_topk(spark):
    """The (1.2, 0.75) arm of the sweep must reproduce bm25_topk's
    top-10 doc set exactly — the sweep is a generalization, not a
    second implementation drifting on its own."""
    from hedera_spark.operators.ir import bm25_param_sweep, bm25_topk
    from tests.conftest import SF_DIR

    sweep = {
        (r["pos"], r["doc_id"])
        for r in bm25_param_sweep(spark, SF_DIR).collect()
        if r["k1"] == 1.2 and r["b"] == 0.75
    }
    from pyspark.sql import Window, functions as F

    w = Window.orderBy(F.desc("score"), "doc_id")
    base = {
        (r["pos"], r["doc_id"])
        for r in bm25_topk(spark, SF_DIR)
        .select(F.row_number().over(w).cast("long").alias("pos"), "doc_id")
        .collect()
    }
    assert sweep == base


def test_pv_holt_constant_and_trending_series(spark, tmp_path):
    """Constant series: level == the constant, trend == 0, forecast ==
    level. Strictly increasing series: positive trend, forecast above
    the final level."""
    import datetime as dt

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for day in range(12):
        for _ in range(5):  # user 1: constant 5/day
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "view", 1.0, "{}"))
        for _ in range(1 + 2 * day):  # user 2: 1, 3, 5, ... increasing
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = tmp_path / "holt"
    df.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import pv_holt

    res = {r["user_id"]: r for r in pv_holt(spark, str(out)).collect()}
    assert res[1]["level"] == 5.0
    assert res[1]["trend"] == 0.0
    assert res[1]["forecast_7d"] == 5.0
    assert res[2]["trend"] > 0
    assert res[2]["forecast_7d"] > res[2]["level"]


def test_bootstrap_means_concentrate_around_true_mean(spark):
    """Poisson-bootstrap replicate means must cluster around the plain
    mean (weights are Poisson(1): E[n_eff] = n), and every replicate's
    effective sample size must be within a loose CLT band of n."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.timeseries import bootstrap_means
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    base = ev.agg(
        F.count(F.lit(1)).alias("n"),
        (F.avg(F.floor(F.col("value") * 100) / 100.0)).alias("mean"),
    ).collect()[0]
    rows = bootstrap_means(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert abs(r["n_eff"] - base["n"]) < 6 * (base["n"] ** 0.5)
        assert abs(r["mean_value"] - base["mean"]) / abs(base["mean"]) < 0.1


def test_hll_error_within_sketch_guarantee(spark):
    """approx_count_distinct's default rsd is ~2.3%; at the testdata
    cardinalities every per-type estimate must sit well inside 10% —
    and inside the ±3·rsd acceptance interval the exact projection
    (the gate-graded hll_error entry) publishes."""
    from hedera_spark.operators.timeseries import hll_error, hll_error_audit
    from tests.conftest import SF_DIR

    rows = hll_error_audit(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] > 0
        assert r["rel_error"] < 0.1

    bounds = {r["event_type"]: r for r in hll_error(spark, SF_DIR).collect()}
    for r in rows:
        b = bounds[r["event_type"]]
        assert b["hll_lo_3sigma"] <= r["n_approx"] <= b["hll_hi_3sigma"], (r, b)


def test_approx_stats_audit_within_budgets(spark):
    """The sketch profile must sit within the documented budgets of its
    exact twin: HLL users within ±3·rsd, and each approx percentile's
    OBSERVED rank within q ± (rank-error + one rank step) — a value
    tolerance would be wrong where the tail has big gaps between order
    statistics."""
    from hedera_spark.operators.timeseries import approx_stats, approx_stats_audit
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    exact = {r["event_type"]: r for r in approx_stats(spark, SF_DIR).collect()}
    rows = approx_stats_audit(spark, SF_DIR).collect()
    assert rows and set(exact) == {r["event_type"] for r in rows}

    by_type: dict[str, list[float]] = {}
    for v in load_table(spark, SF_DIR, "events").select("event_type", "value").collect():
        by_type.setdefault(v["event_type"], []).append(v["value"])
    for vals in by_type.values():
        vals.sort()

    def rank_of(vals: list[float], x: float) -> float:
        import bisect

        return bisect.bisect_right(vals, x) / len(vals)

    for r in rows:
        e = exact[r["event_type"]]
        vals = by_type[r["event_type"]]
        assert 0.85 * e["n_users"] <= r["approx_users"] <= 1.15 * e["n_users"]
        # the 2-decimal rounding of ap50/ap99 can push the value just
        # below its true rank neighbor, hence the extra rank step
        budget = 1e-4 + 2.0 / len(vals)
        assert abs(rank_of(vals, r["ap50"]) - 0.5) <= budget + 0.5 / len(vals) or (
            rank_of(vals, r["ap50"] + 0.005) >= 0.5 - budget
        ), (r, e)
        assert rank_of(vals, r["ap99"] + 0.005) >= 0.99 - budget, (r, e)
        assert rank_of(vals, r["ap99"] - 0.005) <= 1.0, (r, e)


def test_cms_topk_one_sided_and_bounded(spark):
    """Count-Min guarantees: the estimate never undercounts, and the
    min over 4 independent rows keeps the overestimate far below the
    single-row expectation N/w (loose 2% of N bound)."""
    from hedera_spark.operators.sketches import cms_topk
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    n_total = load_table(spark, SF_DIR, "events").count()
    rows = cms_topk(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_cms"] >= r["n_exact"]
        assert r["overestimate"] == r["n_cms"] - r["n_exact"]
        assert r["overestimate"] <= 0.02 * n_total


def test_bloom_semi_join_no_false_negatives(spark):
    """A Bloom filter may pass a non-member but must NEVER drop a
    member: every true member passes, and the realized fp_rate stays
    within ~4x of the (1 - e^(-kn/m))^k design point."""
    import math

    from hedera_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_K,
        bloom_semi_join,
    )
    from tests.conftest import SF_DIR

    r = bloom_semi_join(spark, SF_DIR).collect()[0]
    assert r["n_true_pass"] == r["n_member"]
    assert r["n_pass"] == r["n_true_pass"] + r["n_false_pos"]
    design = (1 - math.exp(-BLOOM_K * r["n_keys"] / BLOOM_BITS)) ** BLOOM_K
    if r["fp_rate"] is not None:
        assert r["fp_rate"] <= max(4 * design, 0.01)


def test_rrf_fusion_both_lists_dominate(spark):
    """With k=60 and 10-deep lists, any doc retrieved by BOTH systems
    (score >= 2/70) outranks any doc retrieved by one (score <= 1/61),
    and the fused scores are non-increasing down the list."""
    from hedera_spark.operators.ir import rrf_fusion
    from tests.conftest import SF_DIR

    rows = rrf_fusion(spark, SF_DIR).collect()
    assert rows
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    min_both = min(
        (r["rrf_score"] for r in rows if r["n_systems"] == 2), default=None
    )
    max_single = max(
        (r["rrf_score"] for r in rows if r["n_systems"] == 1), default=None
    )
    if min_both is not None and max_single is not None:
        assert min_both > max_single


def test_join_size_estimate_exact_and_sane(spark):
    """The exact pair count must equal the materialized self-join's
    row count (on the small fixture only — the operator's whole point
    is NOT doing this at scale), and the MCV+uniform-tail estimate must
    land within 50% of it on this mildly-skewed key."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.planner import join_size_estimate
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    r = join_size_estimate(spark, SF_DIR).collect()[0]
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey")
    truth = li.alias("a").join(li.alias("b"), "l_partkey").count()
    assert r["exact_pairs"] == truth
    assert abs(r["rel_error"]) < 0.5


def test_partition_planner_covers_tables_with_sane_bytes(spark):
    """Every non-empty table gets one row; byte estimates are at least
    the numeric floor (rows x 8) and the 128MB partition count is
    consistent with est_bytes."""
    from hedera_spark.operators.planner import (
        PARTITION_TARGET_BYTES,
        partition_planner,
    )
    from tests.conftest import SF_DIR

    rows = {r["table_name"]: r for r in partition_planner(spark, SF_DIR).collect()}
    assert len(rows) == 10
    for r in rows.values():
        assert r["est_bytes"] >= 8 * r["n_rows"]
        expected = max(1, -(-r["est_bytes"] // PARTITION_TARGET_BYTES))
        assert r["parts_128mb"] == expected
    assert rows["documents"]["est_bytes"] > rows["region"]["est_bytes"]


def test_mv_refresh_plan_statuses(spark):
    """Days after the build cutoff are 'missing'; historical days are
    listed iff they contain a late (event_id % 97 == 0) row, as
    'stale'; and no listed day is fresh."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.planner import (
        MV_LATE_MOD,
        MV_STALE_DAYS,
        mv_refresh_plan,
    )
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        F.col("ts").cast("date").alias("day"), "event_id"
    )
    cutoff = ev.agg(F.date_sub(F.max("day"), MV_STALE_DAYS)).collect()[0][0]
    got = {r["day"]: r for r in mv_refresh_plan(spark, SF_DIR).collect()}
    late_hist_days = {
        r["day"]
        for r in ev.where(
            (F.col("day") <= F.lit(cutoff))
            & (F.col("event_id") % MV_LATE_MOD == 0)
        ).select("day").distinct().collect()
    }
    new_days = {
        r["day"]
        for r in ev.where(F.col("day") > F.lit(cutoff))
        .select("day").distinct().collect()
    }
    assert set(got) == late_hist_days | new_days
    for d in new_days:
        assert got[d]["status"] == "missing"
    for d in late_hist_days:
        assert got[d]["status"] == "stale"
        assert got[d]["n_mv"] < got[d]["n_current"]


def test_zonemap_clustered_layout_prunes_more(spark):
    """Date-partitioned storage must scan no more rows than the
    insertion-chunk layout for the single-day probe, both layouts must
    find the same matching rows, and scanned+pruned must account for
    every unit."""
    from hedera_spark.operators.planner import zonemap_prune_stats
    from tests.conftest import SF_DIR

    rows = {r["layout"]: r for r in zonemap_prune_stats(spark, SF_DIR).collect()}
    assert set(rows) == {"insertion_chunks", "date_partitions"}
    ch, dp = rows["insertion_chunks"], rows["date_partitions"]
    assert ch["rows_matched"] == dp["rows_matched"] > 0
    assert dp["rows_scanned"] <= ch["rows_scanned"]
    assert dp["n_scanned_units"] == 1
    for r in rows.values():
        assert r["n_units"] == r["n_scanned_units"] + r["n_pruned_units"]
        assert r["rows_scanned"] >= r["rows_matched"]


def test_dim_truncation_recall_bounds_and_signal(spark):
    """Per-query recall lives in [0, 1] and beats the ~TOPK/n random
    baseline by an order of magnitude. (The absolute level is LOW on
    the synthetic embeddings — they are isotropic, not
    Matryoshka-trained, which is precisely what the dial reports.)"""
    from hedera_spark.operators.similarity import dim_truncation_recall
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    n_corpus = load_table(spark, SF_DIR, "embeddings").count()
    rows = dim_truncation_recall(spark, SF_DIR).collect()
    assert rows
    rec = [r["recall"] for r in rows]
    assert all(0.0 <= x <= 1.0 for x in rec)
    # measured 0.04 at sf0.001 vs 0.01 random — assert 2x random so a
    # testdata regeneration can't flake the margin
    assert sum(rec) / len(rec) > 2 * 5.0 / n_corpus


def test_keyword_rake_planted_phrase_wins(spark, tmp_path):
    """On a planted corpus where stop tokens separate a repeated
    multi-word phrase from filler unigrams, RAKE must (a) rank the
    multi-word phrase first (degree rewards co-occurrence), (b) never
    emit a stop token inside any phrase, and (c) keep at most 3 phrases
    per doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hedera_spark.operators.text_analysis import (
        RAKE_STOP_K,
        RAKE_TOP_K,
        keyword_rake,
    )

    # exactly RAKE_STOP_K=8 tokens appear in EVERY doc (df 12, the
    # maximum) so the data-derived stop set is precisely them; the
    # planted phrase has df 11 and is always bounded by stops
    stops8 = "the of and a in to is it"
    docs = []
    fillers = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(11):
        f = fillers[i % len(fillers)]
        f2 = fillers[(i + 1) % len(fillers)]
        docs.append(
            f"{stops8} the red sparse matrix of {f} the red sparse"
            f" matrix in {f2} is"
        )
    docs.append(f"{stops8} the {fillers[0]} of {fillers[1]} in")
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(12)),
                "text": docs,
                "lang": ["en"] * 12,
                "source": ["t"] * 12,
                "n_chars": [len(d) for d in docs],
            }
        ),
        str(sf / "documents.parquet"),
    )
    rows = keyword_rake(spark, str(sf)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(12))
    for d in range(11):
        doc_rows = by_doc[d]
        assert len(doc_rows) <= RAKE_TOP_K
        top = min(doc_rows, key=lambda r: r["rnk"])
        assert top["phrase"] == "red sparse matrix"
        assert top["n_occur"] == 2
        for r in doc_rows:
            assert not set(r["phrase"].split()) & set(stops8.split())
    # the phrase-free doc still reports its filler unigrams
    assert all(r["n_words"] == 1 for r in by_doc[11])


def test_skew_salt_plan_spreads_planted_hot_key(spark, tmp_path):
    """On a planted log where ONE key owns half the rows, the salted
    layout must strictly reduce the max bucket occupancy (the hot key's
    rows now land on SALT_FACTOR buckets) while conserving total rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hedera_spark.operators.planner import skew_salt_plan

    keys, lines = [], []
    for i in range(500):  # the hot key: 500 rows
        keys.append(7)
        lines.append(i)
    for k in range(500):  # 500 singleton keys
        keys.append(1000 + k)
        lines.append(1)
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({"l_orderkey": keys, "l_linenumber": lines}),
        str(sf / "lineitem.parquet"),
    )
    rows = {r["layout"]: r for r in skew_salt_plan(spark, str(sf)).collect()}
    assert set(rows) == {"plain", "salted"}
    assert rows["plain"]["n_rows"] == rows["salted"]["n_rows"] == 1000
    # plain: >= 500 rows pile into the hot key's single bucket
    assert rows["plain"]["max_rows"] >= 500
    assert rows["salted"]["max_rows"] < rows["plain"]["max_rows"]
    assert rows["salted"]["skew_ratio"] < rows["plain"]["skew_ratio"]


def test_salted_join_matches_plain_join_and_shuffles(spark):
    """The salted join must (a) reproduce the plain join's aggregate
    exactly and (b) actually run as a shuffle join on the salted key —
    a broadcast would dodge the skew instead of spreading it."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.planner import salted_join
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    got = salted_join(spark, SF_DIR)
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    want = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan


def test_wand_bounds_ceiling_and_top10_consistency(spark):
    """The upper-bound sum must dominate the true score for every
    candidate, the bm25 top-10 docs must all be non-skippable (their
    real score meets θ, so their ceiling does too), and every skippable
    doc's ceiling must sit strictly below the 10th-best score."""
    from hedera_spark.operators.ir import bm25_topk, wand_bounds
    from tests.conftest import SF_DIR

    rows = wand_bounds(spark, SF_DIR).collect()
    assert rows
    top = {r["doc_id"]: r["score"] for r in bm25_topk(spark, SF_DIR).collect()}
    theta = min(top.values())
    by_doc = {r["doc_id"]: r for r in rows}
    for r in rows:
        assert r["ub_sum"] >= r["score"]
        assert r["skippable"] == (r["ub_sum"] < theta)
    for doc_id in top:
        assert not by_doc[doc_id]["skippable"]
    # the audit only earns its keep if pruning is real on this corpus
    assert any(r["skippable"] for r in rows)


def test_audience_overlap_matches_direct_set_algebra(spark):
    """Every pair row must reproduce exact python set algebra over the
    (user, type) pairs, and the matrix must cover all C(T, 2) pairs."""
    from itertools import combinations

    from hedera_spark.operators.timeseries import audience_overlap
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    members: dict[str, set[int]] = {}
    for u, t in ev.select("user_id", "event_type").distinct().collect():
        members.setdefault(t, set()).add(u)
    rows = {(r["type_a"], r["type_b"]): r
            for r in audience_overlap(spark, SF_DIR).collect()}
    assert set(rows) == set(combinations(sorted(members), 2))
    for (a, b), r in rows.items():
        sa, sb = members[a], members[b]
        assert r["n_a"] == len(sa) and r["n_b"] == len(sb)
        assert r["n_both"] == len(sa & sb)
        assert r["n_union"] == len(sa | sb)
        assert r["jaccard"] == round(len(sa & sb) / len(sa | sb), 6)


def test_embedding_drift_identical_snapshots_read_flat(spark, tmp_path):
    """When both snapshots contain the SAME vectors, the mean vectors
    coincide: cosine must read exactly 1.0 and shift exactly 0.0 for
    every label; a planted shifted label must read cosine < 1 and
    shift > 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hedera_spark.operators.similarity import embedding_drift

    vecs, labels, ids = [], [], []
    base = [0.5] * 64
    shifted = [0.5] * 32 + [-0.5] * 32
    vid = 0
    for _ in range(6):  # label 0: identical halves
        vecs.append(base)
        labels.append(0)
        ids.append(vid)
        vid += 1
    for k in range(6):  # label 1: even ids at base, odd ids shifted
        vecs.append(base if k % 2 == 0 else shifted)
        labels.append(1)
        ids.append(vid)
        vid += 1
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(sf / "embeddings.parquet"),
    )
    rows = {r["label"]: r for r in embedding_drift(spark, str(sf)).collect()}
    assert rows[0]["mean_cosine"] == 1.0
    assert rows[0]["mean_shift"] == 0.0
    assert rows[0]["n_a"] == rows[0]["n_b"] == 3
    assert rows[1]["mean_cosine"] < 1.0
    assert rows[1]["mean_shift"] > 0.0


def test_zorder_serves_both_predicates(spark):
    """The clustering pitch, asserted: each single-column sort scans
    ~1 unit for its own predicate and EVERYTHING for the other; z-order
    must scan a small fraction (< 0.5, > the single-sort optimum) for
    BOTH predicates."""
    from hedera_spark.operators.planner import zorder_layout_audit
    from tests.conftest import SF_DIR

    rows = {
        (r["layout"], r["predicate"]): r
        for r in zorder_layout_audit(spark, SF_DIR).collect()
    }
    assert len(rows) == 6
    assert rows[("day_sorted", "user_eq")]["scan_fraction"] == 1.0
    assert rows[("user_sorted", "day_eq")]["scan_fraction"] == 1.0
    assert rows[("day_sorted", "day_eq")]["n_scanned_units"] <= 2
    assert rows[("user_sorted", "user_eq")]["n_scanned_units"] <= 2
    for pred in ("day_eq", "user_eq"):
        z = rows[("zorder", pred)]
        assert z["scan_fraction"] < 0.5
        assert z["n_scanned_units"] < z["n_units"]


def test_markov_attribution_planted_journeys(spark, tmp_path):
    """On a planted log where every conversion flows through 'view' and
    'click' journeys never convert, the removal effect of view must be
    1 (removing it kills all conversions), click's must be 0, and the
    normalized attribution must hand view everything."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hedera_spark.operators.temporal_join import markov_attribution

    rows = []
    eid = 0
    t0 = dt.datetime(2024, 1, 1)

    def add(u, typ, k):
        nonlocal eid
        rows.append((eid, t0 + dt.timedelta(minutes=k), u, typ, 1.0, "{}"))
        eid += 1

    for u in range(6):  # view -> purchase
        add(u, "view", 0)
        add(u, "purchase", 1)
    for u in range(6, 9):  # click -> click -> (end)
        add(u, "click", 0)
        add(u, "click", 1)
    sf = tmp_path / "sf"
    sf.mkdir()
    ids, ts, us, tys, vals, props = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(us, pa.int64()),
                "event_type": pa.array(tys),
                "value": pa.array(vals),
                "props": pa.array(props),
            }
        ),
        str(sf / "events.parquet"),
    )
    got = {r["channel"]: r for r in markov_attribution(spark, str(sf)).collect()}
    assert set(got) == {"view", "click"}
    assert got["view"]["base_conv_prob"] == round(2 / 3, 6)
    assert got["view"]["removal_effect"] == 1.0
    assert got["view"]["attribution"] == 1.0
    assert got["click"]["removal_effect"] == 0.0
    assert got["click"]["attribution"] == 0.0
    assert got["click"]["conv_prob_without"] == round(2 / 3, 6)


def test_hll_union_merge_equals_direct_and_bounded_error(spark):
    """The merged sketch's registers are register-wise maxima, so the
    month estimate from merging the 30 day sketches must EQUAL the
    estimate of one sketch built over the whole month; every scope's
    relative error must sit inside ~5x the theoretical 1.04/sqrt(256)
    rsd (generous, but a broken hash/rho would blow past it)."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.sketches import HLL_M, hll_union
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    rows = {r["scope"]: r for r in hll_union(spark, SF_DIR).collect()}
    assert "MERGED" in rows and len(rows) >= 2
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.agg(F.countDistinct("user_id")).first()[0]
    merged = rows.pop("MERGED")
    assert merged["n_exact"] == n_users
    rsd = 1.04 / (HLL_M ** 0.5)
    for r in list(rows.values()) + [merged]:
        assert r["rel_error"] <= 5 * rsd, r
    # mergeability: the merged estimate must also be what a single
    # sketch over the undayed stream reads — replay it directly
    import duckdb

    sql = f"""
    WITH h AS (
      SELECT ('0x' || substr(md5(concat_ws('~', '0',
                CAST(user_id AS VARCHAR))), 1, 12))::BIGINT AS hv
      FROM '{SF_DIR}/events.parquet'
    ),
    r AS (
      SELECT hv % {HLL_M} AS bucket,
             max(CASE WHEN hv // {HLL_M} > 0
                 THEN 41 - length(bin(hv // {HLL_M})) ELSE 41 END) AS r
      FROM h GROUP BY 1
    )
    SELECT ({0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M!r})
           / (({HLL_M} - count(*)) + sum(power(2.0, -r))) AS raw,
           {HLL_M} - count(*) AS v
    FROM r
    """
    raw, v = duckdb.sql(sql).fetchone()
    direct = HLL_M * __import__("math").log(HLL_M / v) if (raw <= 2.5 * HLL_M and v > 0) else raw
    assert merged["n_hll"] == round(direct, 4)


def test_equi_depth_histogram_depth_and_coverage(spark):
    """Buckets must cover all rows exactly once, boundaries must be
    monotone from min to max, and every bucket's depth must be within
    25% of the ideal 1/16 (the column has few heavy ties, so equi-depth
    should be nearly flat)."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.planner import HIST_BUCKETS, equi_depth_histogram
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    rows = sorted(
        equi_depth_histogram(spark, SF_DIR).collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in rows] == list(range(1, HIST_BUCKETS + 1))
    li = load_table(spark, SF_DIR, "lineitem")
    n, lo, hi = li.agg(
        F.count(F.lit(1)), F.min("l_extendedprice"), F.max("l_extendedprice")
    ).first()
    assert sum(r["n_rows"] for r in rows) == n
    assert rows[0]["lo"] == round(lo, 6)
    assert rows[-1]["hi"] == round(hi, 6)
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] == b["lo"]
        assert a["lo"] <= a["hi"]
    for r in rows:
        assert 0.75 <= r["depth_ratio"] <= 1.25, r


def test_rev_token_provenance_planted_history(spark, tmp_path):
    """Planted 3-revision page: rev 1 writes 'alpha beta', rev 2
    replaces beta with 'gamma', rev 3 (final) keeps 'alpha gamma' and
    adds 'delta'. Credit: rev 1 → alpha, rev 2 → gamma, rev 3 → delta
    (beta earned nothing — it didn't survive); shares sum to 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hedera_spark.operators.revisions import rev_token_provenance

    texts = ["alpha beta", "alpha gamma", "alpha gamma delta"]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": texts,
                "lang": ["en"] * 3,
                "source": ["p1"] * 3,
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(sf / "documents.parquet"),
    )
    rows = {r["rev_seq"]: r for r in rev_token_provenance(spark, str(sf)).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_tokens_introduced"] == 1  # alpha
    assert rows[2]["n_tokens_introduced"] == 1  # gamma
    assert rows[3]["n_tokens_introduced"] == 1  # delta
    # shares are individually rounded to 6 dp (1/3 → 0.333333)
    assert abs(sum(r["survival_share"] for r in rows.values()) - 1.0) < 1e-5


def test_encoding_advisor_rules(spark):
    """The rule fences must fire on the events table's known shapes:
    event_id is unique → plain_delta; event_type has 5 values →
    dict with entropy ≈ log2(5); every column's entropy is bounded by
    log2(n_distinct)."""
    import math

    from hedera_spark.operators.planner import encoding_advisor
    from tests.conftest import SF_DIR

    rows = {r["column_name"]: r for r in encoding_advisor(spark, SF_DIR).collect()}
    assert set(rows) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert rows["event_id"]["encoding"] == "plain_delta"
    assert rows["event_id"]["n_distinct"] == rows["event_id"]["n_rows"]
    et = rows["event_type"]
    assert et["encoding"] == "dict"
    assert et["n_distinct"] == 5
    assert 2.0 < et["entropy_bits"] <= math.log2(5) + 1e-9
    for r in rows.values():
        assert r["entropy_bits"] <= math.log2(r["n_distinct"]) + 1e-9
        assert 0 < r["top1_share"] <= 1


def test_doremi_weights_tilt_direction_and_normalization(spark):
    """Weights must sum to 1 (both raw tilt and smoothed), the hardest
    language (max excess) must gain weight relative to its natural
    share, zero-excess languages must lose or hold, and smoothing must
    pull every weight toward 1/n_langs."""
    from hedera_spark.operators.importance import DOREMI_ALPHA, doremi_weights
    from tests.conftest import SF_DIR

    rows = doremi_weights(spark, SF_DIR).collect()
    assert len(rows) >= 2
    n = len(rows)
    assert abs(sum(r["doremi_weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["smoothed_weight"] for r in rows) - 1.0) < 1e-4
    hardest = max(rows, key=lambda r: r["excess_nll"])
    if hardest["excess_nll"] > 0:
        assert hardest["doremi_weight"] > hardest["share"] - 1e-9
    for r in rows:
        if r["excess_nll"] == 0.0:
            assert r["doremi_weight"] <= r["share"] + 1e-9
        uniform = 1.0 / n
        # smoothing contracts the distance to uniform (1e-5 slack: both
        # weights are independently 6-dp rounded)
        assert abs(r["smoothed_weight"] - uniform) <= (
            (1 - DOREMI_ALPHA) * abs(r["doremi_weight"] - uniform) + 1e-5
        )


def test_graph_walks_validity(spark):
    """Every walk must have exactly WALK_STEPS+1 hops, start at its
    start node, and every consecutive hop must be a real co-mention
    edge; re-running must reproduce the identical corpus
    (determinism)."""
    from hedera_spark.operators.anchors import anchor_cooccur
    from hedera_spark.operators.graph import WALK_STEPS, graph_walks
    from tests.conftest import SF_DIR

    rows = graph_walks(spark, SF_DIR).collect()
    assert rows
    edges = set()
    for r in anchor_cooccur(spark, SF_DIR).collect():
        edges.add((r["a1"], r["a2"]))
        edges.add((r["a2"], r["a1"]))
    for r in rows:
        hops = r["walk"].split("->")
        assert len(hops) == WALK_STEPS + 1 == r["walk_len"]
        assert hops[0] == r["start_anchor"]
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in edges
    again = {r["start_anchor"]: r["walk"] for r in graph_walks(spark, SF_DIR).collect()}
    assert again == {r["start_anchor"]: r["walk"] for r in rows}


def test_pv_stl_planted_trend_and_weekly_pattern(spark, tmp_path):
    """Planted series: user 1 has a pure linear trend (trend removal
    should eat most variance, weekly share ≈ low), user 2 a pure weekly
    square wave (trend removes little; dow explains nearly all of the
    detrended variance). Shares live in [0, 1] (+rounding slack)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hedera_spark.operators.timeseries import pv_stl

    rows, eid = [], 0
    t0 = dt.datetime(2024, 1, 1)
    for d in range(28):
        for _ in range(2 + d):  # user 1: cnt = 2 + day (pure trend)
            rows.append((eid, t0 + dt.timedelta(days=d), 1))
            eid += 1
        for _ in range(10 if d % 7 == 0 else 2):  # user 2: weekly spike
            rows.append((eid, t0 + dt.timedelta(days=d), 2))
            eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str((tmp_path / "sf").mkdir() or tmp_path / "sf" / "events.parquet"),
    )
    out = {r["user_id"]: r for r in pv_stl(spark, str(tmp_path / "sf")).collect()}
    assert set(out) == {1, 2}
    trendy, weekly = out[1], out[2]
    assert trendy["trend_share"] > 0.95
    # the 7-day MA reproduces a linear series exactly, so the detrended
    # variance is 0 and the seasonal share is undefined (NULL)
    assert trendy["var_detrended"] == 0.0
    assert trendy["seasonal_share"] is None
    assert weekly["seasonal_share"] > 0.95
    assert weekly["trend_share"] < trendy["trend_share"]
    for r in out.values():
        if r["seasonal_share"] is not None:
            assert -1e-6 <= r["seasonal_share"] <= 1 + 1e-6
        assert r["var_total"] > 0


def test_dp_counts_noise_properties(spark):
    """The noisy release must be reproducible (two runs identical),
    each |noise| must reconcile with n_dp − n_true, the noise must be
    nonzero (the mechanism actually fired), and with ε = 1 Laplace
    noise all realized errors should sit well under the ~14-nat 1e-6
    tail bound."""
    from hedera_spark.operators.profile import dp_counts
    from tests.conftest import SF_DIR

    rows = dp_counts(spark, SF_DIR).collect()
    assert rows
    again = {r["event_type"]: r["n_dp"] for r in dp_counts(spark, SF_DIR).collect()}
    for r in rows:
        assert again[r["event_type"]] == r["n_dp"]
        assert abs(abs(r["n_dp"] - r["n_true"]) - r["abs_err"]) < 1e-3
        assert r["abs_err"] > 0
        assert r["abs_err"] < 14.0  # P(|Lap(1)| > 14) ≈ 1e-6
        assert r["epsilon"] == 1.0


def test_ann_pareto_structure(spark):
    """Five rows (flat + 4 structures), flat pinned at recall 1.0 and
    compression 1.0, PQ the smallest footprint, every recall in (0, 1],
    and each dial's mean must match the mean of its per-query dial."""
    from hedera_spark.operators.similarity import (
        ANN_BYTES,
        ann_pareto,
        ann_recall,
    )
    from tests.conftest import SF_DIR

    rows = {r["method"]: r for r in ann_pareto(spark, SF_DIR).collect()}
    assert set(rows) == {"flat", "lsh", "ivf", "pq", "sq"}
    assert rows["flat"]["mean_recall"] == 1.0
    assert rows["flat"]["compression_x"] == 1.0
    assert min(rows.values(), key=lambda r: r["bytes_per_vec"])["method"] == "pq"
    for m, r in rows.items():
        assert r["bytes_per_vec"] == ANN_BYTES[m]
        assert 0 < r["mean_recall"] <= 1.0
        assert abs(r["compression_x"] - round(256 / ANN_BYTES[m], 4)) < 1e-9
    lsh_rows = [x["recall"] for x in ann_recall(spark, SF_DIR).collect()]
    want = round(sum(round(v * 1e6) for v in lsh_rows) / len(lsh_rows) / 1e6, 6)
    assert rows["lsh"]["mean_recall"] == want


def test_scd2_intervals_partition_the_timeline(spark):
    """SCD2 invariants: per user the validity intervals are contiguous
    (valid_to == next valid_from), versions are 1..n, exactly one open
    (is_current) row, adjacent versions change the attribute, and every
    event resolves to exactly one version whose interval contains it —
    a change event resolving to the version it opens."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.scd import scd2_build, scd2_resolve
    from tests.conftest import SF_DIR

    dim = scd2_build(spark, SF_DIR).collect()
    by_user: dict = {}
    for r in dim:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for rows in by_user.values():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["attr"] != b["attr"]

    res = scd2_resolve(spark, SF_DIR)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert res.count() == n_events
    assert res.where(F.col("version").isNull()).count() == 0
    # the change event itself carries the attr it introduced
    joined = res.join(
        scd2_resolve(spark, SF_DIR)
        .groupBy("user_id")
        .agg(F.max("version").alias("maxv")),
        "user_id",
    )
    assert joined.where(F.col("version") > F.col("maxv")).count() == 0


def test_dp_mean_release_structure(spark):
    """Reproducible release: re-running emits the identical noisy means;
    the clipped true mean is within the clip range; realized error is
    positive (Laplace never exactly 0 on md5 uniforms) and bounded by
    the ε-scaled tail at these group sizes; epsilon echoed."""
    from hedera_spark.operators.profile import DP_CLIP, DP_EPSILON, dp_mean
    from tests.conftest import SF_DIR

    rows = {r["event_type"]: r for r in dp_mean(spark, SF_DIR).collect()}
    again = {r["event_type"]: r for r in dp_mean(spark, SF_DIR).collect()}
    assert set(rows) and set(rows) == set(again)
    for t, r in rows.items():
        assert again[t]["mean_dp"] == r["mean_dp"]
        assert 0.0 <= r["mean_true"] <= DP_CLIP
        assert r["abs_err"] > 0
        # noisy_sum noise scale = 2C/eps; with n_true >= ~100 events the
        # mean perturbation stays far under C
        assert r["abs_err"] < DP_CLIP
        assert r["epsilon"] == DP_EPSILON


def test_moments_quantiles_accuracy_and_mergeability(spark):
    """The Cornish–Fisher estimates land within a fraction of the
    group stddev of the exact percentiles, the skew sign matches the
    heavy-right-tail synthetic distribution, and the sketch state is
    mergeable: power sums over two disjoint halves add exactly to the
    full-table sums (the property that makes it a 5-integer partial
    agg at 100 TB)."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.sketches import moments_quantiles
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    rows = moments_quantiles(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        sd = r["stddev_value"]
        assert r["skewness"] > 0  # synthetic values are right-skewed
        assert r["p50_err"] < 0.10 * sd
        assert r["p90_err"] < 0.25 * sd
        assert r["p99_err"] < 0.50 * sd
        assert r["p50_mom"] < r["p90_mom"] < r["p99_mom"]

    ev = load_table(spark, SF_DIR, "events")
    cents = F.floor(F.col("value") * 100).cast("decimal(38,0)")
    sums = lambda df: {  # noqa: E731
        r["event_type"]: (r["s1"], r["s4"])
        for r in df.groupBy("event_type")
        .agg(
            F.sum(cents).alias("s1"),
            F.sum(cents * cents * cents * cents).alias("s4"),
        )
        .collect()
    }
    full = sums(ev)
    lo = sums(ev.where(F.col("user_id") % 2 == 0))
    hi = sums(ev.where(F.col("user_id") % 2 == 1))
    for t, (s1, s4) in full.items():
        assert lo[t][0] + hi[t][0] == s1
        assert lo[t][1] + hi[t][1] == s4


def test_frequent_itemsets_apriori_antimonotone(spark):
    """Support is anti-monotone: every surviving triple's three sub-pairs
    are present with support >= the triple's support (the property that
    makes A-Priori candidate pruning sound); itemsets are sorted,
    distinct, and meet the integer support floor."""
    from hedera_spark.operators.tpch import (
        ITEMSET_SUPPORT_PER_MILLE,
        frequent_itemsets,
    )
    from tests.conftest import SF_DIR

    rows = frequent_itemsets(spark, SF_DIR).collect()
    assert rows
    sup = {r["itemset"]: r["support"] for r in rows}
    n_orders = round(rows[0]["support"] / rows[0]["support_ratio"])
    for r in rows:
        items = r["itemset"].split("|")
        assert items == sorted(items) and len(set(items)) == len(items)
        assert r["k"] == len(items)
        assert r["support"] * 1000 >= n_orders * ITEMSET_SUPPORT_PER_MILLE
        if r["k"] == 3:
            a, b, c = items
            for pair in (f"{a}|{b}", f"{a}|{c}", f"{b}|{c}"):
                assert sup.get(pair, 0) >= r["support"]


def test_constraint_audit_suite(spark):
    """The suite covers all ten declared constraints; structural
    invariants of the synthetic warehouse hold (keys unique, FKs
    intact, domains closed), the value-cap guardrail is the one
    constraint allowed to fire, and passed <=> violations == 0."""
    from hedera_spark.operators.profile import constraint_audit
    from tests.conftest import SF_DIR

    rows = {r["check_name"]: r for r in constraint_audit(spark, SF_DIR).collect()}
    assert len(rows) == 10
    for name, r in rows.items():
        assert r["violations"] >= 0
        assert r["passed"] == (r["violations"] == 0)
        if name != "events_value_cap":
            assert r["passed"], f"{name} unexpectedly failing"


def test_ab_permutation_test_structure(spark):
    """Deterministic rerun, a real two-sided split, p in the closed
    Monte-Carlo range [1/(R+1), 1], and the observed diff consistent
    with the group means."""
    from hedera_spark.operators.timeseries import (
        AB_PERM_REPS,
        ab_permutation_test,
    )
    from tests.conftest import SF_DIR

    r1 = ab_permutation_test(spark, SF_DIR).collect()[0]
    r2 = ab_permutation_test(spark, SF_DIR).collect()[0]
    assert r1 == r2
    assert r1["n_exposed"] > 0 and r1["n_rest"] > 0
    assert r1["n_reps"] == AB_PERM_REPS
    assert 1.0 / (AB_PERM_REPS + 1) <= r1["p_value"] <= 1.0
    assert abs(
        (r1["mean_exposed"] - r1["mean_rest"]) - r1["diff_obs"]
    ) < 1e-4


def test_survival_repurchase_km_invariants(spark):
    """KM invariants: survival starts <= 1 and is non-increasing in t,
    risk sets shrink as t grows, and the censoring accounting is exact
    — every customer contributes exactly ONE censored interval (the
    one after their last order), every other order one observed gap."""
    from pyspark.sql import functions as F

    from hedera_spark.operators.timeseries import survival_repurchase
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    rows = sorted(
        survival_repurchase(spark, SF_DIR).collect(),
        key=lambda r: r["t_days"],
    )
    assert rows
    assert rows[0]["survival"] <= 1.0
    for a, b in zip(rows, rows[1:]):
        assert b["survival"] <= a["survival"] + 1e-9
        assert b["n_risk"] <= a["n_risk"]
    orders = load_table(spark, SF_DIR, "orders")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_censored"] for r in rows) == n_cust
    assert sum(r["d_repurchase"] for r in rows) == n_orders - n_cust


def test_classifier_auc_matches_bruteforce_pairs(spark):
    """The folded U-statistic must equal the O(n_pos*n_neg) pairwise
    definition computed directly from the text_quality scores (ties at
    half weight), and the counts must match the lang split."""
    from hedera_spark.operators.text_analysis import (
        classifier_auc,
        text_quality,
    )
    from tests.conftest import SF_DIR

    got = classifier_auc(spark, SF_DIR).collect()[0]
    scored = [
        (r["quality"], 1 if r["lang"] == "en" else 0)
        for r in text_quality(spark, SF_DIR).collect()
    ]
    pos = [s for s, p in scored if p]
    neg = [s for s, p in scored if not p]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    wins = sum(
        1.0 if sp > sn else (0.5 if sp == sn else 0.0)
        for sp in pos
        for sn in neg
    )
    brute = wins / (len(pos) * len(neg))
    assert abs(got["auc_en"] - brute) < 1e-6
    assert abs(got["gini"] - (2 * brute - 1)) < 1e-5


def test_score_quantile_norm_uniformizes_per_source(spark):
    """Within every source: ranks are 1..n with quantiles 0..1 strictly
    increasing in rank, and the normalized scores are uniform (mean
    exactly (n+1)/2n-ish) — the property that makes cross-source
    mixing fair."""
    from collections import defaultdict

    from hedera_spark.operators.text_analysis import score_quantile_norm
    from tests.conftest import SF_DIR

    by_src = defaultdict(list)
    for r in score_quantile_norm(spark, SF_DIR).collect():
        by_src[r["source"]].append(r)
    assert by_src
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r["src_rank"])
        n = rows[0]["src_n"]
        assert len(rows) == n
        assert [r["src_rank"] for r in rows] == list(range(1, n + 1))
        assert rows[0]["quantile"] == 0.0 and rows[-1]["quantile"] == 1.0
        mean_q = sum(r["quantile"] for r in rows) / n
        assert abs(mean_q - 0.5) < 1e-6


def test_coreset_maxmin_greedy_invariants(spark):
    """Farthest-point invariants: K distinct picks, the coverage radius
    is non-increasing (the k-center guarantee), and each reported
    radius2 equals the recomputed min squared distance from that pick
    to all earlier picks."""
    from hedera_spark.operators.kmeans import CORESET_K, coreset_maxmin
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    from pyspark.sql import functions as F

    rows = sorted(
        coreset_maxmin(spark, SF_DIR).collect(), key=lambda r: r["sel_rank"]
    )
    assert len(rows) == CORESET_K
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == CORESET_K
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings")
        .where(F.col("vec_id").isin(ids))
        .collect()
    }
    radii = [r["radius2"] for r in rows]
    assert radii[0] is None
    for a, b in zip(radii[1:], radii[2:]):
        assert b <= a + 1e-9
    for i, r in enumerate(rows[1:], start=1):
        v = emb[r["vec_id"]]
        mind = min(
            sum((x - y) * (x - y) for x, y in zip(v, emb[p]))
            for p in ids[:i]
        )
        assert abs(mind - r["radius2"]) < 1e-5


def test_coreset_scan_budget(spark):
    """Pool refinement must resolve the K picks in at most ceil(log2 K)+1
    driver scans on the test corpus — the r5 replacement for the K-1
    sequential argmax round-trips (at 100 TB each scan is a full pass)."""
    import math

    from hedera_spark.operators.kmeans import CORESET_K, _coreset_rows
    from tests.conftest import SF_DIR

    rows, n_scans = _coreset_rows(spark, SF_DIR)
    assert len(rows) == CORESET_K
    assert n_scans <= math.ceil(math.log2(CORESET_K)) + 1


@pytest.mark.slow
def test_coreset_degenerate_corpus_matches_oracle(spark, tmp_path):
    """Fewer distinct embedding points than K: the operator stops once
    the argmax min-distance hits 0 on an already-selected vec_id, and
    the unrolled DuckDB oracle must stop at the SAME row (operator/
    oracle parity on duplicate-heavy corpora — the r4 advice item)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hedera_spark.operators.kmeans import coreset_maxmin
    from hedera_spark.registry import ORACLE

    # 2 distinct points across 5 vectors: picks = vec 1 (seed), vec 3
    # (the far point), then every min-distance is 0 and the argmax
    # tie-breaks to vec 1 (already selected) -> stop at 2 rows
    pts = {1: [0.0, 0.0], 2: [0.0, 0.0], 3: [3.0, 4.0], 4: [3.0, 4.0], 5: [3.0, 4.0]}
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(pts), type=pa.int64()),
                "embedding": pa.array(list(pts.values()), type=pa.list_(pa.float32())),
                "label": pa.array([0] * len(pts), type=pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    got = sorted(
        coreset_maxmin(spark, str(tmp_path)).collect(), key=lambda r: r["sel_rank"]
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
    )
    want = con.execute(
        ORACLE["coreset_maxmin"] + " ORDER BY sel_rank"
    ).fetchall()
    con.close()
    assert [(r["sel_rank"], r["vec_id"], r["radius2"]) for r in got] == [
        (int(a), int(b), c) for a, b, c in want
    ]
    assert len(got) == 2  # stopped, not padded to K


def test_coreset_pool_refinement_bit_identical_under_ties(spark, tmp_path, monkeypatch):
    """Adversarial tie stress for the pool refinement (r5 ADVICE medium):
    embeddings on a tiny integer grid make 6-dp-quantized distances tie
    exactly, and a shrunken pool forces the cut threshold to engage. A
    pool member whose distance DECAYS to exactly the cut after an
    in-pool pick must not be accepted over an outside point tied at the
    cut with a smaller vec_id — the operator must stay bit-identical to
    sequential Gonzalez (argmax quantized min-distance, ties to the
    smallest vec_id) on every seed."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hedera_spark.operators import kmeans as km

    def seq_gonzalez(pts, k):
        ids = sorted(pts)
        sel = [ids[0]]
        rows = [(1, ids[0], None)]
        mind = {i: km._py_dist2(pts[i], pts[sel[0]]) for i in ids}
        while len(sel) < k:
            best = max(ids, key=lambda i: (mind[i], -i))
            v = mind[best]
            if v == 0.0 and best in sel:
                break
            sel.append(best)
            rows.append((len(sel), best, v))
            for i in ids:
                nd = km._py_dist2(pts[i], pts[best])
                if nd < mind[i]:
                    mind[i] = nd
        return rows

    monkeypatch.setattr(km, "CORESET_POOL", 5)  # cut engages on 48 points
    for seed in range(4):
        rng = random.Random(seed)
        pts = {
            vid: [float(rng.randrange(4)), float(rng.randrange(4))]
            for vid in range(1, 49)
        }
        d = tmp_path / f"tie{seed}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(list(pts), type=pa.int64()),
                    "embedding": pa.array(
                        list(pts.values()), type=pa.list_(pa.float32())
                    ),
                    "label": pa.array([0] * len(pts), type=pa.int32()),
                }
            ),
            d / "embeddings.parquet",
        )
        got, _ = km._coreset_rows(spark, str(d))
        assert got == seq_gonzalez(pts, km.CORESET_K), f"seed {seed}"


def test_linreg_value_hour_matches_direct_fit(spark):
    """The closed-form integer-sum fit must equal a direct Python OLS
    over the same (hour, cents) pairs, and r2 must be in [0, 1]."""
    from hedera_spark.operators.timeseries import linreg_value_hour
    from hedera_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    import math

    from pyspark.sql import functions as F

    got = {r["event_type"]: r for r in linreg_value_hour(spark, SF_DIR).collect()}
    assert got
    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_type",
            F.hour("ts").alias("x"),
            F.floor(F.col("value") * 100).alias("y"),
        )
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append((r["x"], r["y"]))
    for etype, pts in by_type.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        row = got[etype]
        assert row["n_events"] == n
        denom = n * sxx - sx * sx
        if denom:
            want = (n * sxy - sx * sy) / denom
            assert math.isclose(row["slope_cph"], want, abs_tol=1e-6)
        if row["r2"] is not None:
            assert -1e-9 <= row["r2"] <= 1 + 1e-9


def test_chi2_independence_margins_and_grid(spark):
    """Chi-square grid invariants: the grid is the full category
    product, expected counts reproduce both margins, and every
    contribution is non-negative."""
    from hedera_spark.operators.timeseries import chi2_independence

    from tests.conftest import SF_DIR

    rows = chi2_independence(spark, SF_DIR).collect()
    types = {r["event_type"] for r in rows}
    dows = {r["dow"] for r in rows}
    assert len(rows) == len(types) * len(dows)
    total = sum(r["observed"] for r in rows)
    exp_total = sum(r["expected"] for r in rows)
    assert abs(exp_total - total) < 1e-3
    for t in types:
        obs = sum(r["observed"] for r in rows if r["event_type"] == t)
        exp = sum(r["expected"] for r in rows if r["event_type"] == t)
        assert abs(obs - exp) < 1e-3
    assert all(r["contrib"] >= 0 for r in rows)


def test_calibration_isotonic_is_monotone_mean_preserving(spark):
    """PAV invariants: the fit is non-decreasing over bins, stays in
    [0, 1], and its doc-weighted mean equals the overall keep rate
    (L2 isotonic regression preserves the weighted mean)."""
    from hedera_spark.operators.importance import calibration_isotonic

    from tests.conftest import SF_DIR

    rows = sorted(
        calibration_isotonic(spark, SF_DIR).collect(),
        key=lambda r: r["bin"],
    )
    assert rows
    fits = [r["iso_fit"] for r in rows]
    assert all(0 - 1e-9 <= f <= 1 + 1e-9 for f in fits)
    assert all(b >= a - 1e-9 for a, b in zip(fits, fits[1:]))
    n_all = sum(r["n_docs"] for r in rows)
    keep_all = sum(r["frac_keep"] * r["n_docs"] for r in rows)
    fit_mass = sum(r["iso_fit"] * r["n_docs"] for r in rows)
    assert abs(fit_mass - keep_all) / n_all < 1e-4


def test_revenue_gini_bounds_and_uniform_case(spark):
    """Gini invariants: every per-nation gini lies in [0, 1), and a
    planted perfectly-equal frame yields gini == 0 while a maximally
    concentrated one approaches 1 - 1/n."""
    from hedera_spark.operators.tpch import revenue_gini

    from tests.conftest import SF_DIR

    rows = revenue_gini(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 - 1e-9 <= r["gini"] < 1
        assert r["n_customers"] > 0 and r["total_cents"] > 0


def test_benford_audit_shares_sum_to_one(spark):
    """The Benford expectation column must sum to 1 over digits 1..9,
    the observed fractions must sum to 1, and observed counts must
    account for every positive-cents event."""
    from hedera_spark.operators.profile import benford_audit
    from hedera_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    rows = benford_audit(spark, SF_DIR).collect()
    assert len(rows) == 9
    assert abs(sum(r["benford_p"] for r in rows) - 1.0) < 1e-5
    assert abs(sum(r["frac_observed"] for r in rows) - 1.0) < 1e-5
    n_pos = (
        load_table(spark, SF_DIR, "events")
        .where(F.floor(F.col("value") * 100) >= 1)
        .count()
    )
    assert sum(r["n_observed"] for r in rows) == n_pos


def test_curriculum_buckets_partition_and_order(spark):
    """Curriculum invariants: the 4 phases partition the corpus, and
    length boundaries are non-decreasing phase over phase (easy→hard)."""
    from hedera_spark.operators.text_analysis import curriculum_buckets
    from hedera_spark.sources.tables import load_table

    from tests.conftest import SF_DIR

    rows = sorted(
        curriculum_buckets(spark, SF_DIR).collect(), key=lambda r: r["phase"]
    )
    assert [r["phase"] for r in rows] == [1, 2, 3, 4]
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for a, b in zip(rows, rows[1:]):
        assert a["max_tokens"] <= b["min_tokens"]
        assert abs(a["n_docs"] - b["n_docs"]) <= 1


def test_heaps_law_fit_plausible_exponent(spark):
    """Heaps fit sanity: one row, 0 < beta <= 1 on a natural-ish
    corpus (vocabulary grows, sublinearly or at worst linearly), K > 0,
    and r2 in [0, 1]."""
    from hedera_spark.operators.corpus_clean import heaps_law_fit

    from tests.conftest import SF_DIR

    rows = heaps_law_fit(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_points"] > 1
    # the synthetic corpus draws from a ~20-word vocabulary, so the
    # curve saturates in bucket 1 and beta sits at/near 0; natural
    # corpora sit near 0.5 — the dial still must never exceed linear
    assert 0 <= r["beta"] <= 1 + 1e-9
    assert r["k"] > 0
    assert 0 <= r["r2"] <= 1 + 1e-9


def test_pv_holt_winters_planted_weekly_pattern(spark, tmp_path):
    """A purely-weekly series (count = 10 + weekday, constant across
    weeks, starting on a Monday) deseasonalizes to a constant: trend
    must be exactly 0, level exactly the overall mean 13, seasonal of
    the last day (Sunday) exactly +3, forecast exactly 16."""
    import datetime as dt

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1, 12, 0, 0)  # 2024-01-01 is a Monday
    for day in range(14):
        for _ in range(10 + day % 7):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(days=day), 7, "view", 1.0, "{}")
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "hw"
    ev.write.parquet(str(out / "events.parquet"))
    from hedera_spark.operators.timeseries import pv_holt_winters

    got = pv_holt_winters(spark, str(out)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_days"] == 14
    assert r["last_dow"] == 6
    assert r["level"] == 13.0
    assert r["trend"] == 0.0
    assert r["seasonal"] == 3.0
    assert r["forecast_7d"] == 16.0


def test_pv_holt_winters_forecast_identity(spark):
    """forecast_7d must equal level + 7*trend + seasonal for every
    entity (all four columns come from the same micro-unit integers)."""
    from hedera_spark.operators.timeseries import pv_holt_winters

    from tests.conftest import SF_DIR

    for r in pv_holt_winters(spark, SF_DIR).collect():
        want = r["level"] + 7 * r["trend"] + r["seasonal"]
        assert abs(r["forecast_7d"] - want) < 1e-9


def test_order_reconciliation_planted_drift(spark, tmp_path):
    """A planted pair of tables with one agreeing order, one drifted
    order, and one order with no line items must report exactly those
    two mismatches with the exact cent deltas."""
    orders = spark.createDataFrame(
        [
            (1, "O", 110.0),
            (2, "O", 200.0),
            (3, "F", 50.0),
        ],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.0, 0.1),
            (2, 100.0, 0.0, 0.0),
        ],
        "l_orderkey long, l_extendedprice double, l_discount double,"
        " l_tax double",
    )
    out = tmp_path / "rec"
    orders.write.parquet(str(out / "orders.parquet"))
    li.write.parquet(str(out / "lineitem.parquet"))
    from hedera_spark.operators.tpch import order_reconciliation

    got = {r["o_orderstatus"]: r for r in order_reconciliation(
        spark, str(out)
    ).collect()}
    assert got["O"]["n_orders"] == 2
    assert got["O"]["n_mismatch"] == 1
    assert got["O"]["abs_drift_cents"] == 10000
    assert got["O"]["max_drift_cents"] == 10000
    assert got["F"]["n_mismatch"] == 1
    assert got["F"]["abs_drift_cents"] == 5000


def test_dp_quantile_near_median(spark):
    """The exponential mechanism with eps=1 on a large domain must land
    near the true median: realized rank error well under 5% per type,
    and the released value must be an actual domain value."""
    from hedera_spark.operators.profile import dp_quantile
    from hedera_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    rows = dp_quantile(spark, SF_DIR).collect()
    assert rows
    vals = {
        (r["event_type"], r["cents"])
        for r in load_table(spark, SF_DIR, "events")
        .select(
            "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
        )
        .distinct()
        .collect()
    }
    for r in rows:
        assert r["rank_err"] < 0.05, r
        assert (r["event_type"], int(round(r["dp_median"] * 100))) in vals


def test_abc_classification_pareto_invariants(spark):
    """ABC invariants: ranks are a permutation 1..n, cum_share is
    non-decreasing with rank reaching 1.0, classes partition as
    A-then-B-then-C along the rank order, and every part appears once."""
    from hedera_spark.operators.tpch import abc_classification
    from hedera_spark.sources.tables import load_table

    from tests.conftest import SF_DIR

    rows = sorted(
        abc_classification(spark, SF_DIR).collect(), key=lambda r: r["rk"]
    )
    n = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey"
    ).distinct().count()
    assert len(rows) == n
    assert [r["rk"] for r in rows] == list(range(1, n + 1))
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-9
    shares = [r["cum_share"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    classes = "".join(r["abc_class"] for r in rows)
    assert classes == "A" * classes.count("A") + "B" * classes.count(
        "B"
    ) + "C" * classes.count("C")


def test_dispersion_index_matches_direct(spark):
    """Dispersion must equal a direct Python variance/mean over the
    collected daily counts per type."""
    from hedera_spark.operators.timeseries import dispersion_index
    from hedera_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    got = {r["event_type"]: r for r in dispersion_index(spark, SF_DIR).collect()}
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    by_type = {}
    for r in daily:
        by_type.setdefault(r["event_type"], []).append(r["count"])
    for etype, xs in by_type.items():
        m = sum(xs) / len(xs)
        v = sum(x * x for x in xs) / len(xs) - m * m
        row = got[etype]
        assert row["n_days"] == len(xs)
        assert abs(row["mean_daily"] - m) < 1e-4
        assert abs(row["dispersion"] - v / m) < 1e-4


def test_classifier_gains_monotone_to_one(spark):
    """Gains invariants: walking bins high→low, pop_share and capture
    are non-decreasing and both end at exactly 1.0."""
    from hedera_spark.operators.importance import classifier_gains

    from tests.conftest import SF_DIR

    rows = sorted(
        classifier_gains(spark, SF_DIR).collect(),
        key=lambda r: -r["bin"],
    )
    assert rows
    shares = [r["pop_share"] for r in rows]
    caps = [r["capture"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert all(b >= a - 1e-9 for a, b in zip(caps, caps[1:]))
    assert shares[-1] == 1.0 and caps[-1] == 1.0


def test_brand_transitions_rows_are_probabilities(spark):
    """Per from_brand the transition probabilities must sum to 1, and
    hop counts must equal orders-with-a-predecessor."""
    from hedera_spark.operators.tpch import brand_transitions

    from tests.conftest import SF_DIR

    rows = brand_transitions(spark, SF_DIR).collect()
    assert rows
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_brand"], []).append(r)
    for f, rs in by_from.items():
        assert abs(sum(r["p_transition"] for r in rs) - 1.0) < 1e-4, f
        assert all(r["n_hops"] > 0 for r in rs)


def test_ams_f2_estimator_quality(spark):
    """AMS sanity: the 16-estimator average must land within 3/sqrt(K)
    relative error of the exact second moment (Chebyshev on the
    averaged estimator: Var <= 2·F2²/K)."""
    from hedera_spark.operators.sketches import AMS_K, ams_f2

    from tests.conftest import SF_DIR

    rows = ams_f2(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["f2_exact"] > 0
    assert r["rel_error"] <= 3 * (2.0 / AMS_K) ** 0.5


def test_kmv_intersect_exact_when_sets_small(spark):
    """Pairs where both audiences hold fewer than K distinct users run
    the sketch in exact mode (theta = full space): n_est must equal
    n_exact exactly there; everywhere n_est must be non-negative and
    the full pair grid must be emitted."""
    from hedera_spark.operators.sketches import KMV_K, kmv_intersect
    from hedera_spark.sources.tables import load_table

    from tests.conftest import SF_DIR

    rows = kmv_intersect(spark, SF_DIR).collect()
    counts = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    t = len(counts)
    assert len(rows) == t * (t - 1) // 2
    for r in rows:
        assert r["n_est"] >= 0
        if counts[r["type_a"]] < KMV_K and counts[r["type_b"]] < KMV_K:
            assert r["n_est"] == float(r["n_exact"])


def test_bigram_llr_nonnegative_and_ranked(spark):
    """LLR is a likelihood-ratio statistic: every value must be
    >= 0 (up to fp noise) and the output sorted by it descending."""
    from hedera_spark.operators.text_analysis import LLR_TOPK, bigram_llr

    from tests.conftest import SF_DIR

    rows = bigram_llr(spark, SF_DIR).collect()
    assert 0 < len(rows) <= LLR_TOPK
    vals = [r["llr"] for r in rows]
    assert all(v >= -1e-6 for v in vals)
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r["c_ab"] <= r["c_a1"] and r["c_ab"] <= r["c_b2"]


def test_loader_shards_is_a_valid_epoch_plan(spark):
    """The shard plan must (a) cover every packed bin exactly once per
    epoch, (b) number read_order contiguously from 1 inside each
    (epoch, shard), (c) re-shuffle between epochs (different order), and
    (d) be bit-identical across runs (md5, no rand())."""
    from hedera_spark.operators.text_analysis import (
        LOADER_EPOCHS,
        LOADER_SHARDS,
        loader_shards,
        pack_sequences,
    )
    from tests.conftest import SF_DIR

    rows = loader_shards(spark, SF_DIR).collect()
    n_bins = (
        pack_sequences(spark, SF_DIR).select("lang", "bin_id").distinct().count()
    )
    assert len(rows) == n_bins * LOADER_EPOCHS

    per_epoch = {}
    for r in rows:
        assert 0 <= r["shard"] < LOADER_SHARDS
        per_epoch.setdefault(r["epoch"], []).append(r)
    assert set(per_epoch) == set(range(LOADER_EPOCHS))
    for epoch, ers in per_epoch.items():
        assert len({(r["lang"], r["bin_id"]) for r in ers}) == n_bins
        by_shard = {}
        for r in ers:
            by_shard.setdefault(r["shard"], []).append(r["read_order"])
        for orders in by_shard.values():
            assert sorted(orders) == list(range(1, len(orders) + 1))

    # epochs produce different shard/order assignments (the re-shuffle)
    key = lambda r: (r["lang"], r["bin_id"])  # noqa: E731
    e0 = {key(r): (r["shard"], r["read_order"]) for r in per_epoch[0]}
    e1 = {key(r): (r["shard"], r["read_order"]) for r in per_epoch[1]}
    assert any(e0[k] != e1[k] for k in e0)

    rows2 = loader_shards(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_shard_skew_and_overflow_dials_reconcile(spark):
    """Both loader dials must reconcile exactly against their source
    frames: shard totals sum to the packed corpus total per epoch, skew
    >= 1, and the overflow accounting recomputes from pack_sequences
    bins by hand."""
    from hedera_spark.operators.text_analysis import (
        PACK_CAPACITY,
        loader_shards,
        pack_overflow_stats,
        pack_sequences,
        shard_skew_audit,
    )
    from tests.conftest import SF_DIR

    packed = pack_sequences(spark, SF_DIR).collect()
    bins = {}
    for r in packed:
        bins[(r["lang"], r["bin_id"])] = bins.get((r["lang"], r["bin_id"]), 0) + r["n_tokens"]
    corpus_tokens = sum(bins.values())

    for r in shard_skew_audit(spark, SF_DIR).collect():
        assert r["total_tokens"] == corpus_tokens
        assert r["min_tokens"] <= r["max_tokens"]
        assert r["skew_ratio"] >= 1.0
        assert r["n_shards"] >= 1

    got = {r["lang"]: r for r in pack_overflow_stats(spark, SF_DIR).collect()}
    by_lang = {}
    for (lang, _), t in bins.items():
        n, over, tot = by_lang.get(lang, (0, 0, 0))
        by_lang[lang] = (n + 1, over + max(0, t - PACK_CAPACITY), tot + t)
    assert set(got) == set(by_lang)
    for lang, (n, over, tot) in by_lang.items():
        r = got[lang]
        assert r["n_bins"] == n
        assert r["overflow_tokens"] == over
        assert r["total_tokens"] == tot
        assert abs(r["truncation_frac"] - round(over / tot, 6)) < 1e-9


def test_codec_roundtrip_property(spark):
    """VByte and PFor posting blocks must decode back to the exact id
    array for adversarial shapes: gap 0 (id 0 first), singletons, long
    uniform runs, 34-bit jumps, mixed small/huge gaps, and the
    exception-heavy case (one giant gap among tiny ones)."""
    import random

    from pyspark.sql import functions as F

    from hedera_spark.operators.codec import (
        pfor_decode,
        pfor_encode,
        vbyte_decode,
        vbyte_encode,
    )

    rng = random.Random(42)
    cases = [
        [0],
        [0, 1],
        [5],
        [127],
        [128],
        [16384],
        list(range(0, 500)),
        [1, 130, 20000, 3000000, 400000000, 400000000 + (1 << 34)],
        [7, 8, 9, 10, 11, 12, 13, 14, 15, 9999999999],
    ]
    for _ in range(40):
        n = rng.randint(1, 200)
        ids, cur = [], 0
        for _ in range(n):
            cur += rng.choice(
                [1, 2, 3, 7, 127, 128, 129, rng.randint(1, 1 << rng.randint(1, 34))]
            )
            ids.append(cur)
        cases.append(ids)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "case_id long, ids array<bigint>"
    )
    bad = (
        df.withColumn("vb", vbyte_encode("ids"))
        .withColumn("pf", pfor_encode("ids"))
        .where(
            (vbyte_decode("vb") != F.col("ids"))
            | (pfor_decode("pf") != F.col("ids"))
        )
        .count()
    )
    assert bad == 0


def test_codec_realizes_the_vbyte_cost_model(spark):
    """The REAL VByte block length must equal doc_vectors_delta's
    vbyte_bytes accounting for every document on the test corpus (the
    size model and the codec describe the same bytes; they may only
    diverge on >2^28 gaps, where the model caps at 4 bytes and the
    codec spends 5 — absent from any realistic dictionary)."""
    from tests.conftest import SF_DIR

    from hedera_spark.operators.codec import doc_vectors_codec
    from hedera_spark.operators.ir import doc_vectors, doc_vectors_delta

    real = {
        r["doc_id"]: (r["vbyte_bytes"], r["vector"])
        for r in doc_vectors_codec(spark, SF_DIR).collect()
    }
    model = {
        r["doc_id"]: r["vbyte_bytes"]
        for r in doc_vectors_delta(spark, SF_DIR).collect()
    }
    plain = {r["doc_id"]: r["vector"] for r in doc_vectors(spark, SF_DIR).collect()}
    assert set(real) == set(model) == set(plain)
    for doc_id, (nbytes, vector) in real.items():
        assert nbytes == model[doc_id], doc_id
        assert vector == plain[doc_id], doc_id
