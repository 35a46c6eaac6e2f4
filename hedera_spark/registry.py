"""Central registry: query name → (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 registers here; __spark_entry__.py simply
re-exports. The oracle SQL is ANSI SQL DuckDB can run on the same parquet
tables — the driver (and tests/test_oracle_parity.py) runs both sides and
compares row count + schema + order-insensitive value hash, so **column
names and value rounding must match exactly**.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hedera_spark.operators import anchors as anc
from hedera_spark.operators import ir
from hedera_spark.operators import revisions as rev
from hedera_spark.operators import timeseries as ts
from hedera_spark.operators import tpch

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLE[name] = oracle


# --- Group A: revision / versioned-document processing -------------------

register(
    "rev_ids",
    rev.rev_ids,
    """
    SELECT user_id AS page_id, event_id AS rev_id,
           coalesce(lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS parent_id
    FROM events
    """,
)

register(
    "rev_pairs",
    rev.rev_pairs,
    """
    WITH w AS (
      SELECT user_id AS page_id,
             lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_rev_id,
             event_id AS cur_rev_id,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             value AS cur_value,
             value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_delta,
             (epoch_us(ts) // 1000000) - lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_seconds
      FROM events
    )
    SELECT * FROM w WHERE prev_rev_id IS NOT NULL
    """,
)

register(
    "rev_interval",
    rev.rev_interval,
    """
    WITH w AS (
      SELECT user_id AS page_id, CAST(ts AS DATE) AS day, event_id AS rev_id, ts,
             event_type AS kind, value,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT page_id, day, rev_id, ts, kind, value FROM w WHERE rn = 1
    """,
)

register(
    "rev_filter_time",
    rev.rev_filter_time,
    """
    SELECT user_id AS page_id, event_id AS rev_id, ts, event_type AS kind, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
      AND event_type <> 'error'
    """,
)

register(
    "rev_max_ts",
    rev.rev_max_ts,
    """
    SELECT user_id AS page_id, max(ts) AS max_ts, count(*) AS n_revs
    FROM events GROUP BY ROLLUP(user_id)
    """,
)

register(
    "rev_length",
    rev.rev_length,
    """
    SELECT doc_id, source AS page_id, length(text) AS len_chars,
           len(string_split(text, ' ')) AS len_tokens
    FROM documents
    """,
)

register(
    "rev_concat",
    rev.rev_concat,
    """
    SELECT source AS page_id,
           string_agg(text, ' ' ORDER BY doc_id) AS full_text,
           count(*) AS n_revs
    FROM documents GROUP BY source
    """,
)

register(
    "sample_by_time",
    rev.sample_by_time,
    """
    WITH w AS (
      SELECT user_id AS page_id, CAST(ts AS DATE) AS day, event_id AS rev_id, ts, value,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT page_id, day, rev_id, ts, value FROM w WHERE rn = 1
    """,
)

register(
    "rev_sorted",
    rev.rev_sorted,
    """
    SELECT event_id AS rev_id, user_id AS page_id, ts, event_type AS kind, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15'
    ORDER BY ts, event_id
    """,
)

register(
    "rev_diff",
    rev.rev_diff,
    """
    WITH dtoks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (
      SELECT doc_id, count(*) AS n FROM dtoks GROUP BY doc_id
    ),
    pairs AS (
      SELECT source AS page_id, doc_id,
             lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS prev_id
      FROM documents
    ),
    common AS (
      SELECT p.doc_id, count(*) AS n_common
      FROM pairs p
      JOIN dtoks a ON a.doc_id = p.doc_id
      JOIN dtoks b ON b.doc_id = p.prev_id AND b.tok = a.tok
      GROUP BY p.doc_id
    )
    SELECT p.page_id, p.doc_id, p.prev_id,
           ca.n - coalesce(c.n_common, 0) AS n_inserted,
           cb.n - coalesce(c.n_common, 0) AS n_deleted,
           coalesce(c.n_common, 0) AS n_common
    FROM pairs p
    JOIN cnt ca ON ca.doc_id = p.doc_id
    JOIN cnt cb ON cb.doc_id = p.prev_id
    LEFT JOIN common c ON c.doc_id = p.doc_id
    WHERE p.prev_id IS NOT NULL
    """,
)

# --- Group B: anchor / link analytics --------------------------------------

_DTOKS = """
    dtoks AS (
      SELECT DISTINCT doc_id, source, tok AS anchor
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
    )
"""

register(
    "anchor_count",
    anc.anchor_count,
    """
    SELECT tok AS anchor, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok
    """,
)

register(
    "anchor_targets",
    anc.anchor_targets,
    f"""
    WITH {_DTOKS}
    SELECT doc_id, anchor FROM dtoks
    """,
)

register(
    "temporal_anchor",
    anc.temporal_anchor,
    f"""
    WITH {_DTOKS}
    SELECT anchor, min(doc_id) AS first_seen, max(doc_id) AS last_seen,
           count(*) AS n_docs
    FROM dtoks GROUP BY anchor
    """,
)

register(
    "temporal_title",
    anc.temporal_title,
    """
    SELECT string_split(text, ' ')[1] AS title_tok,
           min(doc_id) AS first_seen, count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)

register(
    "anchor_cooccur",
    anc.anchor_cooccur,
    f"""
    WITH {_DTOKS}
    SELECT a.anchor AS a1, b.anchor AS a2, count(*) AS n_docs
    FROM dtoks a JOIN dtoks b ON a.doc_id = b.doc_id AND a.anchor < b.anchor
    GROUP BY 1, 2
    HAVING count(*) >= 5
    """,
)

register(
    "id2title",
    anc.id2title,
    """
    SELECT c_custkey, c_name, n_name AS nation_name, r_name AS region_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)

# --- Group C: IR structures -------------------------------------------------

_TF = """
    tf AS (
      SELECT doc_id, tok AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
      GROUP BY doc_id, tok
    )
"""

register(
    "bow",
    ir.bow,
    f"""
    WITH {_TF}
    SELECT doc_id, term, tf FROM tf
    """,
)

register(
    "term_stats",
    ir.term_stats,
    f"""
    WITH {_TF}
    SELECT term, count(*) AS df, sum(tf) AS cf, max(tf) AS max_tf
    FROM tf GROUP BY term HAVING count(*) >= 2
    """,
)

register(
    "dictionary",
    ir.dictionary,
    f"""
    WITH {_TF}
    SELECT term, row_number() OVER (ORDER BY term) AS term_id, count(*) AS df
    FROM tf GROUP BY term
    """,
)

register(
    "inverted_index",
    ir.inverted_index,
    f"""
    WITH {_TF}
    SELECT term, count(*) AS df,
           string_agg(doc_id, ',' ORDER BY doc_id) AS postings
    FROM tf GROUP BY term
    """,
)

register(
    "doc_vectors",
    ir.doc_vectors,
    f"""
    WITH {_TF},
    dict AS (
      SELECT term, row_number() OVER (ORDER BY term) AS term_id
      FROM tf GROUP BY term
    )
    SELECT tf.doc_id, count(*) AS n_terms,
           string_agg(dict.term_id, ',' ORDER BY dict.term_id) AS vector
    FROM tf JOIN dict ON tf.term = dict.term
    GROUP BY tf.doc_id
    """,
)

# --- Group D: time-series / pageview analytics ------------------------------

register(
    "pv_hourly",
    ts.pv_hourly,
    """
    SELECT user_id, date_trunc('hour', ts) AS hour,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)

register(
    "pv_daily",
    ts.pv_daily,
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             count(*) AS n_events, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, CAST(hour AS DATE) AS day,
           sum(n_events) AS n_events, round(sum(sum_value), 2) AS sum_value,
           count(*) AS active_hours
    FROM hourly GROUP BY 1, 2
    """,
)

register(
    "ts_vector",
    ts.ts_vector,
    """
    WITH span AS (
      SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events
    ),
    calendar AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM span
    ),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    dense AS (
      SELECT u.user_id, c.day, coalesce(d.n, 0) AS n
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN calendar c
      LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day
    )
    SELECT user_id, string_agg(n, ',' ORDER BY day) AS series, sum(n) AS total
    FROM dense GROUP BY user_id
    """,
)

register(
    "pv_join",
    ts.pv_join,
    """
    WITH agg AS (
      SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
      FROM events GROUP BY user_id
    )
    SELECT user_id, c_name, c_mktsegment, n_events, sum_value
    FROM agg JOIN customer ON user_id = c_custkey
    """,
)

register(
    "session_stats",
    ts.session_stats,
    """
    WITH gapped AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN (epoch_us(ts) // 1000000)
                       - lag(epoch_us(ts) // 1000000)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_seq
      FROM gapped
    )
    SELECT user_id, session_seq, count(*) AS n_events,
           min(ts) AS start_ts, max(ts) AS end_ts,
           round(sum(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_seq
    """,
)

# --- Group F: generic analytics -------------------------------------------

register(
    "tpch_q1",
    tpch.tpch_q1,
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)

register(
    "tpch_q3",
    tpch.tpch_q3,
    """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-15'
      AND l_shipdate > TIMESTAMP '1998-01-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)

register(
    "tpch_q5",
    tpch.tpch_q5,
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)

register(
    "tpch_q6",
    tpch.tpch_q6,
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)

register(
    "topk_per_group",
    tpch.topk_per_group,
    """
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    )
    SELECT n_name, c_custkey, c_name, c_acctbal, rk
    FROM ranked JOIN nation ON c_nationkey = n_nationkey
    WHERE rk <= 3
    """,
)
