"""Temporal join operators — as-of join and interval range join.

Hedera's temporal core is "which revision was live at time T": the
interval readers (reference: java/main/org/hedera/io/etl/
IntervalRevisionETLReader.java, sampling the snapshot valid at each
interval boundary) and the pageview-to-revision attribution implicit in
BuildShortTermTS. Spark has no ASOF JOIN or native interval join, so both
are built here as custom operators from DataFrame primitives — the
mandated pattern for operators Spark lacks.

Scale design (100 TB):

- ``asof_join`` is NOT a join at all: the two event streams are unioned,
  shuffled ONCE on the entity key, and the most recent right-side row is
  carried forward with ``last(..., ignorenulls=True)`` over the
  time-ordered window — the distributed equivalent of a merge-asof. No
  range predicate ever reaches a join operator, so there is no
  BroadcastNestedLoop fallback and no candidate blow-up; cost is one
  shuffle + one per-partition sort, same as any keyed window.
- ``range_join_hot_windows`` makes the interval join an EQUALITY join:
  each interval is exploded into the hour buckets it covers (bounded
  fan-out: interval_len/bucket + 2) and events join on their own hour
  bucket, with the exact containment predicate applied as a post-join
  filter. Equality keys mean hash join — broadcast here (the interval
  side is a top-k, bounded by construction), shuffle-hash when the
  interval table outgrows broadcast. The bucket trick is what keeps the
  plan off BroadcastNestedLoopJoin, which at 100 TB would scan every
  event row against every interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hedera_spark.sources.tables import load_table


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each 'view' event joined AS OF to the latest 'purchase' by the same
    user at or before its timestamp (left-outer: views with no prior
    purchase keep nulls). Union + keyed window, not a join — see module
    docstring. Ties (same user, same ts) rank purchases before views so
    "at or before" is inclusive; among same-ts purchases the highest
    event_id wins, keeping the result deterministic."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_p"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(
            F.col("is_p") == 1,
            F.struct(
                F.col("ts").alias("p_ts"),
                F.col("event_id").alias("p_event_id"),
                F.col("value").alias("p_value"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        tagged.withColumn("p", carried)
        .where(F.col("is_p") == 0)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("p.p_event_id").alias("purchase_event_id"),
            F.col("p.p_value").alias("purchase_value"),
            (F.unix_timestamp("ts") - F.unix_timestamp("p.p_ts")).alias(
                "seconds_since_purchase"
            ),
        )
    )


HOT_WINDOW_TOP_K = 5


def range_join_hot_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: the top-5 busiest hours (by event count,
    ties broken by hour) widened to [hour-30min, hour+90min) incident
    windows, then every event overlapping each window is attributed to it
    (windows may overlap — an event can land in several). The join is an
    hour-bucket EQUALITY join with exact containment as a residual
    filter; see module docstring for why this beats a nested-loop range
    predicate at scale."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket", F.date_trunc("hour", "ts")
    )
    hourly = ev.groupBy(F.col("bucket").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # global top-k over at most |hours| rows — bounded, single light task
    hot = hourly.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("c"), "h"))
    ).where(F.col("rk") <= HOT_WINDOW_TOP_K)
    windows = hot.select(
        (F.col("h") - F.expr("INTERVAL 30 MINUTES")).alias("win_start"),
        (F.col("h") + F.expr("INTERVAL 90 MINUTES")).alias("win_end"),
    )
    buckets = windows.withColumn(
        "bucket",
        F.explode(
            F.expr(
                "sequence(date_trunc('HOUR', win_start),"
                " date_trunc('HOUR', win_end), interval 1 hour)"
            )
        ),
    )
    return (
        ev.join(F.broadcast(buckets), "bucket")
        .where((F.col("ts") >= F.col("win_start")) & (F.col("ts") < F.col("win_end")))
        .groupBy("win_start", "win_end")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-match as-of join: each 'view' event paired with the
    CLOSEST 'purchase' by the same user in either time direction (the
    pandas merge_asof(direction='nearest') / QuestDB ASOF variant;
    attribution pipelines use it when an ad view may precede or trail
    its conversion). Ties between an equally-near earlier and later
    purchase resolve backward; same-timestamp purchases match at
    distance 0 (backward, by the inclusive tie rule).

    Same scale shape as asof_join — NOT a join: one shuffle on user_id,
    then TWO passes over the same time-ordered partition (a backward
    last-carry and a forward first-carry; the exchange is reused, only
    the per-partition sort differs in tie order), and a row-local
    nearest pick. No range predicate ever reaches a join operator.

    Determinism: among same-ts purchases BOTH carries keep the highest
    event_id (backward: last in window order ts, is_p DESC, event_id;
    forward: first in window order ts, is_p, event_id DESC); both rules
    are total orders."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_p"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward window: views sort BEFORE same-ts purchases so the frame
    # starting at the current row still sees them (inclusive "at or
    # after"); first() then takes the earliest (p_ts, p_event_id)
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", F.desc("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_struct = F.when(
        F.col("is_p") == 1,
        F.struct(
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_event_id"),
            F.col("value").alias("p_value"),
        ),
    )
    back = F.last(p_struct, ignorenulls=True).over(wb)
    fwd = F.first(p_struct, ignorenulls=True).over(wf)
    d_b = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("b.p_ts").cast("timestamp")
    )
    d_f = F.unix_micros(F.col("f.p_ts").cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    use_b = F.col("b").isNotNull() & (F.col("f").isNull() | (d_b <= d_f))
    return (
        tagged.withColumn("b", back)
        .withColumn("f", fwd)
        .where(F.col("is_p") == 0)
        .withColumn("nearest", F.when(use_b, F.col("b")).otherwise(F.col("f")))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("nearest.p_event_id").alias("purchase_event_id"),
            F.col("nearest.p_value").alias("purchase_value"),
            F.when(use_b, F.lit("backward"))
            .when(F.col("f").isNotNull(), F.lit("forward"))
            .alias("direction"),
            F.when(use_b, d_b).otherwise(d_f).alias("micros_to_purchase"),
        )
    )


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credited to the campaign
    (props.k) of the LATEST view at-or-before it by the same user, then
    rolled up to (campaign, n_purchases, attributed_revenue) — the
    marketing-attribution query shape, with unattributed purchases kept
    as the NULL-campaign row so revenue always reconciles to the total.

    Same mechanics as asof_join (union + one keyed window, zero join
    operators, one user_id shuffle): views rank before purchases at
    equal ts so a same-instant view gets credit; among same-ts views the
    highest event_id wins. Revenue is summed as exact integer cents
    (pv_rolling_7d's determinism trick) so accumulation order cannot
    move the rounded total."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("event_type") == "view").cast("int").alias("is_v"),
        F.when(
            F.col("event_type") == "view",
            F.get_json_object("props", "$.k").cast("int"),
        ).alias("k"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_v"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(F.col("is_v") == 1, F.struct(F.col("k").alias("k"))),
        ignorenulls=True,
    ).over(w)
    return (
        tagged.withColumn("v", carried)
        .where(F.col("is_v") == 0)
        .groupBy(F.col("v.k").alias("campaign"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)
            ).alias("attributed_revenue"),
        )
        .select(
            "campaign",
            "n_purchases",
            F.round("attributed_revenue", 2).alias("attributed_revenue"),
        )
    )


def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution — last-touch's
    fairer sibling: each purchase's revenue is split equally across ALL
    the views in its conversion window (the views since the previous
    purchase, same-instant views included), so campaigns that open a
    journey get credit, not only the one that closed it. Purchases with
    no preceding view keep their full amount on the NULL-campaign row —
    revenue always reconciles to the total.

    Determinism: revenue is carried as exact integer MICRO-cents; the
    equal split is integer division with the remainder assigned to the
    LAST view (the deterministic tie-break), so partial-agg order cannot
    move a single unit and both engines sum identical integers.

    Plan shape (100 TB): one user_id window carries each event forward
    to its next purchase (asof_join's union-window discipline — zero
    join operators), one (user_id, purchase) aggregate builds the
    ordered touch list (bounded by the conversion window, not the
    user's history), and the credit split is array-local; the final
    campaign roll-up aggregates over the tiny campaign universe."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "view").cast("int").alias("is_v"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        ).alias("cents"),
        F.when(
            F.col("event_type") == "view",
            F.get_json_object("props", "$.k").cast("int"),
        ).alias("k"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_v"), "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    grp = F.first(
        F.when(F.col("is_v") == 0, F.col("event_id")), ignorenulls=True
    ).over(w)
    per = (
        tagged.withColumn("grp", grp)
        .where(F.col("grp").isNotNull())
        .groupBy("user_id", "grp")
        .agg(
            F.max("cents").alias("cents"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_v") == 1, F.struct("ts", "event_id", "k")
                        )
                    )
                ),
                lambda x: x["k"],
            ).alias("ks"),
        )
    )
    credits = F.when(
        F.size("ks") == 0,
        F.expr(
            "array(struct(CAST(NULL AS INT) AS campaign,"
            " cents * 1000 AS micro))"
        ),
    ).otherwise(
        F.expr(
            "transform(ks, (x, i) -> struct(x AS campaign,"
            " CASE WHEN i = size(ks) - 1"
            " THEN cents * 1000 - (cents * 1000 div size(ks)) * (size(ks) - 1)"
            " ELSE cents * 1000 div size(ks) END AS micro))"
        )
    )
    return (
        per.select(F.explode(credits).alias("c"))
        .select(F.col("c.campaign").alias("campaign"), F.col("c.micro").alias("micro"))
        .groupBy("campaign")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.round(F.sum("micro") / 100000.0, 6).alias("attributed_revenue"),
        )
    )


MARKOV_ITERATIONS = 10


def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014, "Mapping
    the customer journey") — the data-driven member of the attribution
    trio (attribution_last_touch credits the final touch,
    attribution_linear splits equally; this one asks the first-order
    Markov chain what each channel is WORTH): build the user-journey
    transition matrix over event types (START at each user's first
    event, 'purchase' absorbed as CONV, sequence end as NULL), compute
    the chain's conversion probability from START, recompute it with
    each channel removed (its outgoing edges dropped, inbound mass
    redirected to NULL), and credit each channel its normalized removal
    effect. Absorption probabilities use MARKOV_ITERATIONS fixed,
    lazily-chained value-iteration steps (the pagerank_anchors
    discipline; the chain's depth makes 10 steps ≈ fixpoint).

    Scale: the at-scale work is ONE user_id-keyed window over the event
    log (journey edges) reduced to the ≤ |states|² transition-count
    table; that table is a BOUNDED driver pull (|event types|+2 states —
    a few dozen rows no matter the corpus size, the similarity_fast
    precedent), and the removal-effect value iteration is plain Python
    algebra on it — a 50-row matrix has no business occupying ten
    chained distributed stages (measured: 10.3 s → ~1 s at sf0.1).

    Determinism: transition weights are exact integer-count ratios;
    value iteration sums ≤ |states| doubles per step unrounded in
    sorted-state order, and every output column rounds once at the
    end (round-6 absorbs last-ulp ordering differences)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.coalesce(F.lead("event_type").over(w), F.lit("NULL")).alias(
            "dst_raw"
        ),
        F.row_number().over(w).alias("rn"),
    )
    edges = (
        seq.where(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("src"), "dst_raw")
        .unionByName(
            seq.where(F.col("rn") == 1).select(
                F.lit("START").alias("src"),
                F.col("event_type").alias("dst_raw"),
            )
        )
        .select(
            "src",
            F.when(F.col("dst_raw") == "purchase", F.lit("CONV"))
            .otherwise(F.col("dst_raw"))
            .alias("dst"),
        )
    )
    counts = edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # BOUNDED pull: ≤ (|event types|+2)² rows regardless of corpus size
    rows = counts.collect()
    out_schema = (
        "channel string, conv_prob_without double, base_conv_prob double, "
        "removal_effect double, attribution double"
    )
    if not rows:
        return spark.createDataFrame([], out_schema)

    totals: dict[str, int] = {}
    for r in rows:
        totals[r["src"]] = totals.get(r["src"], 0) + r["c"]
    w = {(r["src"], r["dst"]): r["c"] / totals[r["src"]] for r in rows}

    def conv_prob(removed: str | None) -> float:
        # edges of the scenario chain: removed channel's outgoing edges
        # dropped, inbound mass redirected to NULL
        tp: dict[str, list[tuple[str, float]]] = {}
        for (src, dst), wt in sorted(w.items()):
            if src == removed:
                continue
            tp.setdefault(src, []).append(
                ("NULL", wt) if dst == removed else (dst, wt)
            )
        p: dict[str, float] = {s: 0.0 for s in tp}
        for _ in range(MARKOV_ITERATIONS):
            p = {
                src: sum(
                    wt
                    * (
                        1.0
                        if dst == "CONV"
                        else 0.0 if dst == "NULL" else p.get(dst, 0.0)
                    )
                    for dst, wt in outs
                )
                for src, outs in tp.items()
            }
        return p.get("START", 0.0)

    p_base = conv_prob(None)
    channels = sorted({src for src, _ in w if src != "START"})
    rem = {
        ch: (1 - conv_prob(ch) / p_base) if p_base > 0 else None
        for ch in channels
    }
    tot = sum(v for v in rem.values() if v is not None)
    data = [
        (
            ch,
            round(conv_prob(ch), 6),
            round(p_base, 6),
            None if rem[ch] is None else round(rem[ch], 6),
            (
                round(rem[ch] / tot, 6)
                if rem[ch] is not None and tot > 0
                else None
            ),
        )
        for ch in channels
    ]
    return spark.createDataFrame(data, out_schema)
