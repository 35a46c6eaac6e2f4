"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style terminal action (collect on the
aggregated result) so the full plan runs but driver transfer stays small.
A warmup pass on sf0.001 JIT-warms the JVM before timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "rev_pairs",
    "rev_diff",
    "rev_interval",
    "anchor_count",
    "term_stats",
    "inverted_index",
    "pv_daily",
    "ts_vector",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_topk",
    "ann_topk_fast",
    "ann_lsh",
    "lang_id",
    "text_quality",
    "fingerprint",
    "session_stats",
]

# heavy operators added after the r1 headline freeze: timed the same way
# and reported as a SEPARATE total so the headline series stays
# round-over-round comparable (the r3 verdict's per-round perf-signal
# gap for the newer families)
EXTENDED = [
    "scd2_build",
    "markov_attribution",
    "kmeans_embeddings",
    "graph_communities",
    "moments_quantiles",
    "quality_classifier",
    "dedup_substring",
    "bm25_topk",
    "graph_kcore",
    "doc_vectors_delta",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from hedera_spark.registry import QUERIES
    from hedera_spark.session import get_spark, reset_session_state

    spark = get_spark("hedera_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    ext_names = [n for n in EXTENDED if n in QUERIES]

    # warmup at the smallest sf: every headline query once on tiny data so
    # codegen compilation + JIT happen outside the timed runs (the generated
    # classes are plan-shaped, not data-shaped, so they are reused at sf0.1)
    for n in names + ext_names:
        QUERIES[n](spark, "/root/testdata/sf0.001").collect()

    # best-of-N per query (default 3): single-shot timings on a shared box
    # swing 2-4x with ambient load and JIT warm-up (r4: the same build
    # measured 22.2s at N=2 and 14.1s at N=3 minutes apart); the min is
    # the reproducible number the plan actually costs. N=1 restores
    # single-shot timing.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # grouped (default): a query's reps run back-to-back — the series
    # every prior round recorded, and the one that measures WARM code
    # (adjacent reps reuse the query's JIT-compiled codegen).
    # interleaved: rep-major round-robin — a diagnostic mode, NOT a
    # headline mode: with ~23 plans cycling in one JVM the reserved code
    # cache flushes between a query's reps (UseCodeCacheFlushing), so
    # later reps re-pay codegen+JIT (measured: dedup_simhash reps
    # [3.6, 10.0, 14.9] interleaved vs [2.4, 2.4, 2.2] grouped on the
    # same tree — see SCALING.md round-6 notes).
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "grouped")

    def one_rep(n: str) -> float:
        # drop caches AND trained in-process models left by prior
        # queries/reps (several operators persist intermediates;
        # kmeans/quality_classifier register models per sf_dir): every
        # rep must pay the same full plan, or min() reports a cache-hit
        # scoring-only time as the operator's cost
        reset_session_state(spark)
        t0 = time.perf_counter()
        QUERIES[n](spark, sf_dir).collect()
        return round(time.perf_counter() - t0, 3)

    def load_now() -> float | None:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return None

    def timed(group: list[str]) -> tuple[dict[str, float], dict[str, dict]]:
        runs: dict[str, list[float]] = {n: [] for n in group}
        loads: dict[str, list[float | None]] = {n: [] for n in group}
        if mode == "interleaved":
            for _ in range(reps):
                for n in group:
                    loads[n].append(load_now())
                    runs[n].append(one_rep(n))
        else:
            for n in group:
                for _ in range(reps):
                    loads[n].append(load_now())
                    runs[n].append(one_rep(n))
        out = {n: min(r) for n, r in runs.items()}
        detail = {
            n: {"reps": runs[n], "load_1m": loads[n]} for n in group
        }
        for n in group:
            print(f"# {n}: {out[n]:.3f}s (reps {runs[n]})", file=sys.stderr)
        return out, detail

    times, detail = timed(names)
    ext_times, ext_detail = timed(ext_names)

    # train-vs-score split for the operators that publish a trained model
    # (r5 VERDICT #3): the timed reps above pay the honest full
    # train+score cost each rep; one extra call with caches cleared but
    # the model registry KEPT isolates score-only, so both regimes are
    # tracked instead of conflated. full ≈ train + score, so
    # train = full − score up to noise; totals above stay full-cost.
    trained: dict[str, dict[str, float]] = {}
    for n in ("kmeans_embeddings", "quality_classifier"):
        if n in ext_times:
            # untimed call trains + registers the model (later queries'
            # resets cleared whatever the timed reps registered), then
            # the timed call hits the registry: score-only
            reset_session_state(spark)
            QUERIES[n](spark, sf_dir).collect()
            spark.catalog.clearCache()  # caches drop, model stays
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).collect()
            score = round(time.perf_counter() - t0, 3)
            trained[n] = {
                "full": ext_times[n],
                "score": score,
                "train": round(max(ext_times[n] - score, 0.0), 3),
            }

    # count-terminal twins for the transfer-bound queries (r6 VERDICT #2):
    # these emit 10^5-10^6 result rows, so their .collect() rep mixes
    # distributed plan cost with driver materialization. One extra timed
    # run each with a .count() terminal isolates the distributed cost —
    # recorded alongside the collect number, never substituted for it.
    count_terminal: dict[str, float] = {}
    for n in ("fingerprint", "scd2_build", "rev_pairs", "rev_interval",
              "pv_daily", "session_stats"):
        if n in QUERIES:
            reset_session_state(spark)
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).count()
            count_terminal[n] = round(time.perf_counter() - t0, 3)

    # 1-minute load average at run time: BENCH_r02's 40.2s "regression"
    # was ambient load on a shared box (controlled rerun: 22.6s). Numbers
    # taken under heavy external load are noise — record the conditions
    # so a reader can tell signal from contention.
    try:
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:
        load_1m = None
    # bulky per-rep instrumentation goes to a SIDE FILE (and stderr),
    # never the metric line: r6's BENCH record was unparseable because
    # the detail blocks grew the one-line JSON past the driver's tail
    # capture (BENCH_r06.json `parsed: null`). The driver contract is a
    # compact metric line, and it must be the LAST stdout line.
    side = {
        # per-rep wall times + 1m load sampled before each rep: lets a
        # reader separate ambient drift (uniform rep inflation, high
        # load) from a plan regression (all reps slow at idle load)
        "detail": detail,
        "extended_detail": ext_detail,
        # full = train+score per rep (honest retrain); score = model-
        # registry hit with caches cleared; train = full - score
        "trained": trained,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(side, fh)
        print(f"# per-rep detail -> {detail_path}", file=sys.stderr)
    except OSError as exc:  # pragma: no cover - read-only checkout
        print(f"# detail not written: {exc}", file=sys.stderr)
    print(json.dumps(side), file=sys.stderr)

    out = {
        "metric": "headline_query_wall_clock_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load_avg_1m": load_1m,
        "reps": reps,
        "mode": mode,
        # post-r1 heavy families, reported separately so the headline
        # total stays comparable across rounds
        "extended_total": round(sum(ext_times.values()), 3),
        "extended": ext_times,
        # distributed-cost-only timing for the two queries whose collect
        # rep is dominated by driver transfer (~1M result rows)
        "count_terminal": count_terminal,
    }
    sys.stderr.flush()
    sys.stdout.flush()
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
