"""Stateful / streaming-semantic queries over the ``events`` table.

``events`` is the Kafka-record analog (FIXTURES.md §1): ``event_id`` is the
per-key offset, ``ts`` the record timestamp, ``user_id`` the key.

The registered fold-semantic queries are expressed with Window/agg built-ins
(JVM-side, whole-stage codegen — the plan you'd run at 100 TB).  The same
semantics through the real fold machinery (operators.keyed — the reference's
FoldToState hot path) live in the ``*_via_fold`` variants below, which
``tests/test_fold_vs_window.py`` checks are row-identical to the registered
plans: the fold operator is proven against the relational plan, and the
relational plan against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flow_spark.functions import cents, csum
from kafka_flow_spark.operators.asof import asof_join
from kafka_flow_spark.operators.fold import fold_option
from kafka_flow_spark.operators.keyed import keyed_fold, keyed_fold_final
from kafka_flow_spark.plans.registry import register
from kafka_flow_spark.tables import load


# --- per-key ordered fold, per-record emit (reference Fold semantics, #9) ---
@register(
    "q_fold_running_totals",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS run_count,
           ROUND(SUM(value) OVER w, 4) AS run_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    bench=True,
)
def q_fold_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (count, sum) per user — Window built-ins (running-frame agg).

    Semantics: reference Fold contract core/.../Fold.scala:14; ordered-per-key
    execution PartitionFlow.scala:160-194.  The fold-machinery rendition is
    ``fold_running_totals_via_fold`` (differential-tested equal).
    """
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("run_count"),
        F.round(F.sum("value").over(w), 4).alias("run_sum"),
    )


def fold_running_totals_via_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fold_running_totals through the generic fold operator (test-only path)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def step(s, rec):
        s = s or {"n": 0, "total": 0.0}
        return {"n": s["n"] + 1, "total": s["total"] + rec["value"]}

    def emit(key, rec, before, after):
        return {
            "user_id": key["user_id"],
            "event_id": rec["event_id"],
            "run_count": after["n"],
            "run_sum": round(after["total"], 4),
        }

    return keyed_fold(
        e,
        key_cols=["user_id"],
        order_col="event_id",
        fold=fold_option(step),
        output_schema="user_id BIGINT, event_id BIGINT, run_count BIGINT, run_sum DOUBLE",
        emit=emit,
    )


# --- delete-on-None contract (FoldOption, #9 + FoldToState.scala:62-89) ---
@register(
    "q_fold_reset_on_error",
    oracle="""
    SELECT user_id, event_id,
           CASE WHEN event_type = 'error' THEN NULL
                ELSE ROUND(SUM(CASE WHEN event_type = 'error' THEN 0 ELSE value END)
                     OVER (PARTITION BY user_id, seg ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           END AS state_sum
    FROM (
      SELECT user_id, event_id, event_type, value,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
      FROM events)
    """,
)
def q_fold_reset_on_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-on-'error' fold — Window built-ins (segment = running error count)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")
    running = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    is_err = F.col("event_type") == "error"
    seg = F.sum(F.when(is_err, 1).otherwise(0)).over(running)
    e = e.withColumn("seg", seg)
    per_seg = Window.partitionBy("user_id", "seg").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    state_sum = F.when(is_err, F.lit(None).cast("double")).otherwise(
        F.round(F.sum(F.when(is_err, F.lit(0.0)).otherwise(F.col("value"))).over(per_seg), 4)
    )
    return e.select("user_id", "event_id", state_sum.alias("state_sum"))


def fold_reset_on_error_via_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fold_reset_on_error through the fold operator (delete-on-None contract)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")

    def step(s, rec):
        if rec["event_type"] == "error":
            return None  # delete state (FoldOption None contract)
        return (s or 0.0) + rec["value"]

    def emit(key, rec, before, after):
        return {
            "user_id": key["user_id"],
            "event_id": rec["event_id"],
            "state_sum": None if after is None else round(after, 4),
        }

    return keyed_fold(
        e,
        key_cols=["user_id"],
        order_col="event_id",
        fold=fold_option(step),
        output_schema="user_id BIGINT, event_id BIGINT, state_sum DOUBLE",
        emit=emit,
    )


# --- final-state mode (snapshot read analog, #24) ---
@register(
    "q_fold_final_state",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_fold_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-state fold — a plain hash aggregate (map-side partials, one shuffle)."""
    e = load(spark, sf_dir, "events").select("user_id", "value")
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"), csum(cents("value"), "total_value")
    )


def fold_final_state_via_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fold_final_state through keyed_fold_final (snapshot-read analog)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    from decimal import Decimal

    def step(s, rec):
        s = s or {"n": 0, "total": Decimal(0)}
        # decimal accumulation → order-insensitive-exact, matches oracle's DECIMAL sum
        return {"n": s["n"] + 1, "total": s["total"] + Decimal(f"{rec['value']:.2f}")}

    def finish(key, s):
        return {"user_id": key["user_id"], "n_events": s["n"], "total_value": float(s["total"])}

    return keyed_fold_final(
        e,
        key_cols=["user_id"],
        order_col="event_id",
        fold=fold_option(step),
        output_schema="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
        finish=finish,
    )


# --- offset-dedup guard (SnapshotFold, #26: skip offsets <= snapshot offset) ---
@register(
    "q_offset_dedup_replay",
    oracle="""
    WITH snap AS (
      SELECT user_id, CAST(MAX(event_id) AS BIGINT) AS snap_offset
      FROM events WHERE event_type = 'signup' GROUP BY user_id)
    SELECT e.user_id, COUNT(*) AS replayed,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS replay_value
    FROM events e JOIN snap s ON e.user_id = s.user_id
    WHERE e.event_id > s.snap_offset
    GROUP BY e.user_id
    """,
)
def q_offset_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-idempotence guard: drop records at or below the snapshot offset.

    Reference: SnapshotFold.apply — core/.../snapshot/SnapshotFold.scala:13-23.
    The 'snapshot offset' here is each user's last 'signup' event.
    """
    e = load(spark, sf_dir, "events")
    snap = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.max("event_id").alias("snap_offset"))
    )
    return (
        e.join(snap, "user_id")
        .filter(F.col("event_id") > F.col("snap_offset"))
        .groupBy("user_id")
        .agg(F.count("*").alias("replayed"), csum(cents("value"), "replay_value"))
    )


# --- latest-state lookup (state read path / max_by, #24) ---
@register(
    "q_events_last_state",
    oracle="""
    SELECT user_id,
           CAST(MAX(event_id) AS BIGINT) AS last_event_id,
           ARG_MAX(event_type, event_id) AS last_event_type,
           ARG_MAX(value, event_id) AS last_value
    FROM events GROUP BY user_id
    """,
)
def q_events_last_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.max_by("value", "event_id").alias("last_value"),
    )


# --- tumbling window aggregation (streaming window, batch-checkable) ---
@register(
    "q_events_tumbling_hourly",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), csum(cents("value"), "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- session windows (gap-based; reference's canonical tick use-case) ---
@register(
    "q_events_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap.

    Reference analog: session expiry via fold + tick (docs/overview.md:303-306);
    batch form uses Spark's native session_window.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), csum(cents("value"), "sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# --- JSON payload decode (journal-format parser analog, #28) ---
@register(
    "q_json_payload_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k
    FROM events GROUP BY event_type
    """,
)
def q_json_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic JSON payload parsing (reference: JournalParser.scala:29,71-86)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k")
    )


# --- as-of join (purchase ← latest prior click of same user) ---
@register(
    "q_asof_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           c.event_id AS click_event_id, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    bench=True,
)
def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        payload_cols=["click_event_id", "click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        "click_event_id",
        "click_value",
    )


# --- forward as-of with tolerance (purchase → next click within 1 hour) ---
@register(
    "q_asof_forward_tolerance",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.event_id, c.event_id AS cid, c.value AS cval,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts ASC, c.event_id DESC) AS rk
      FROM p JOIN c ON p.user_id = c.user_id
                   AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR)
    SELECT p.event_id, p.user_id,
           j.cid AS next_click_id, j.cval AS next_click_value
    FROM p LEFT JOIN (SELECT * FROM j WHERE rk = 1) j ON p.event_id = j.event_id
    """,
)
def q_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-merge_asof-style forward as-of with a 1-hour tolerance: each
    purchase picks the user's EARLIEST subsequent click no more than an hour
    later (ties on equal ts break to the larger click id — the union+window
    last-one-wins rule, mirrored in the oracle's ORDER BY).  Same
    single-shuffle union+window plan as the backward form, traversed
    descending."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("next_click_id"),
        F.col("value").alias("next_click_value"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        payload_cols=["next_click_id", "next_click_value"],
        right_order=["next_click_id"],
        direction="forward",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return joined.select("event_id", "user_id", "next_click_id", "next_click_value")


# --- regular-grid resampling with forward-fill (timeseries gap-fill) ---
@register(
    "q_resample_ffill_hourly",
    oracle="""
    WITH ev AS (SELECT user_id, ts AS t, arg_max(value, event_id) AS v,
                       0 AS is_grid
                FROM events GROUP BY user_id, ts),
    b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS mn,
                 date_trunc('hour', MAX(ts)) AS mx
          FROM events GROUP BY user_id),
    g AS (SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS t,
                 CAST(NULL AS DOUBLE) AS v, 1 AS is_grid FROM b),
    u AS (SELECT * FROM ev UNION ALL SELECT * FROM g),
    f AS (SELECT user_id, t, is_grid,
                 last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill
          FROM u)
    SELECT user_id, t AS grid_ts, fill AS value FROM f WHERE is_grid = 1
    """,
    bench=True,
)
def q_resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly forward-filled resampling of each user's value series — the
    gap-filling/alignment step time-series models need (see
    operators/timeseries.py; one key shuffle, grid generated narrowly)."""
    from kafka_flow_spark.operators.timeseries import resample_ffill

    return resample_ffill(
        load(spark, sf_dir, "events"), "user_id", "ts", "value",
        step="1 hour", tiebreak_col="event_id",
    )


# --- ordered-step funnel (view -> click -> purchase) ---
@register(
    "q_funnel_view_click_purchase",
    oracle="""
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events),
    w2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
               OVER (PARTITION BY user_id) AS t2
      FROM w1),
    w3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
               OVER (PARTITION BY user_id) AS t3
      FROM w2)
    SELECT user_id, t1, t2, t3,
           CAST((CASE WHEN t1 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS INT) AS depth
    FROM (SELECT DISTINCT user_id, t1, t2, t3 FROM w3)
    """,
)
def q_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest ordered view→click→purchase chain per user with reached
    depth — ordered-funnel semantics (strictly-after steps), one exchange
    for all three conditional-min windows (operators/timeseries.py)."""
    from kafka_flow_spark.operators.timeseries import funnel_steps

    return funnel_steps(
        load(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    )


# --- cohort retention triangle (weekly) ---
@register(
    "q_cohort_retention_weekly",
    oracle="""
    WITH per AS (
      SELECT user_id, date_trunc('week', ts) AS p,
             MIN(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort
      FROM events),
    counts AS (SELECT cohort, p, COUNT(DISTINCT user_id) AS n_active
               FROM per GROUP BY cohort, p),
    sized AS (SELECT *, MAX(CASE WHEN p = cohort THEN n_active END)
                          OVER (PARTITION BY cohort) AS n_cohort
              FROM counts)
    SELECT cohort,
           CAST(date_diff('day', cohort, p) // 7 AS INT) AS period_offset,
           n_active, n_cohort,
           CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
    FROM sized
    """,
)
def q_cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle over events — first-activity-week
    cohorts × distinct-active counts per offset (operators/timeseries.py;
    cohort assigned by an in-place key window, no event self-join)."""
    from kafka_flow_spark.operators.timeseries import cohort_retention

    out = cohort_retention(load(spark, sf_dir, "events"), "user_id", "ts", "week")
    # DuckDB's date_trunc('week') yields DATE; align the cohort label type
    return out.withColumn("cohort", F.col("cohort").cast("date"))


def funnel_via_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_funnel_view_click_purchase through the generic fold machinery
    (test-only path — tests/test_fold_vs_window.py proves it row-identical
    to the registered window plan, which the oracle proves against DuckDB).
    A ts-ordered left fold computes the same strictly-after chain: the first
    qualifying step-k event in ts order IS the min over qualifying events."""
    from kafka_flow_spark.operators.keyed import keyed_fold_final

    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    steps = ["view", "click", "purchase"]

    def step_fn(s, rec):
        s = dict(s) if s else {"t1": None, "t2": None, "t3": None}
        t, ty = rec["ts"], rec["event_type"]
        if ty == steps[0] and s["t1"] is None:
            s["t1"] = t
        elif ty == steps[1] and s["t2"] is None and s["t1"] is not None and t > s["t1"]:
            s["t2"] = t
        elif ty == steps[2] and s["t3"] is None and s["t2"] is not None and t > s["t2"]:
            s["t3"] = t
        return s

    def finish(key, s):
        return {
            "user_id": key["user_id"],
            "t1": s["t1"], "t2": s["t2"], "t3": s["t3"],
            "depth": sum(s[k] is not None for k in ("t1", "t2", "t3")),
        }

    return keyed_fold_final(
        e, ["user_id"], "ts", fold_option(step_fn),
        "user_id BIGINT, t1 TIMESTAMP_NTZ, t2 TIMESTAMP_NTZ, t3 TIMESTAMP_NTZ, depth INT",
        finish,
    )


_ROLL_7D_US = 7 * 86400 * 1_000_000


@register(
    "q_user_spend_trend",
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY 1, 2),
    x0 AS (SELECT user_id, MIN(day) AS xmin FROM d GROUP BY 1),
    p AS (SELECT d.user_id, d.day - x0.xmin AS x, d.yc AS y
          FROM d JOIN x0 USING (user_id)),
    m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM p GROUP BY 1),
    f AS (SELECT user_id, n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den, sy
          FROM m)
    SELECT user_id, n AS n_points,
           CASE WHEN den > 0 THEN
             CASE WHEN num >= 0 THEN (num * 10000) // den
                  ELSE -(((-num) * 10000) // den) END
           END AS slope_scaled,
           CASE WHEN sy >= 0 THEN (sy * 10000) // n
                ELSE -(((-sy) * 10000) // n) END AS avg_y_scaled
    FROM f
    """,
)
def q_user_spend_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS spend trend over daily integer-cents rollups
    (operators/timeseries.group_trend): slope in cents/day x 1e4 and mean
    daily cents x 1e4, all-bigint moments with sign-adjusted truncating
    division — the trend-detection analytics primitive, engine-exact
    (both engines' integer division truncates toward zero; the explicit
    sign-adjusted form pins that semantics in the contract)."""
    from kafka_flow_spark.functions import cents
    from kafka_flow_spark.operators.timeseries import group_trend

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("_day"),
        )
        .agg(F.sum(cents("value")).alias("_yc"))
    )
    return group_trend(daily, "user_id", "_day", "_yc")


@register(
    "q_rolling_user_value_7d",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(value AS DECIMAL(18,2)) AS dv
      FROM events)
    , win AS (
      SELECT event_id, user_id,
             COUNT(*) OVER w AS roll_n,
             CAST(SUM(dv) OVER w AS DOUBLE) AS roll_sum,
             CAST(CAST(SUM(dv) OVER w * 100 AS BIGINT) * 100 AS DOUBLE) AS s4
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN {_ROLL_7D_US} PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, roll_n, roll_sum,
           (SIGN(s4) * FLOOR((ABS(s4) * 2 + roll_n) / (roll_n * 2))) / 10000.0 AS roll_avg
    FROM win
    """,
)
def q_rolling_user_value_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-7-day rolling count/sum/avg of event value at every
    event — the time-RANGE window frame (operators/timeseries.rolling_stats;
    integer-cents moving sum for cross-engine exactness)."""
    from kafka_flow_spark.operators.timeseries import rolling_stats

    events = load(spark, sf_dir, "events")
    return rolling_stats(
        events, "user_id", "ts", "value", _ROLL_7D_US // 1_000_000
    ).select(
        "event_id", "user_id", "roll_n", "roll_sum", "roll_avg"
    )


@register(
    "q_mad_outliers",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM events),
    c1 AS (SELECT event_type, vc, COUNT(*) AS cnt FROM e GROUP BY event_type, vc),
    w1 AS (SELECT event_type, vc, cnt,
                  SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  SUM(cnt) OVER (PARTITION BY event_type) AS n
           FROM c1),
    med AS (SELECT event_type,
                   MIN(CASE WHEN cum * 2 >= n
                            THEN vc END) AS med
            FROM w1 GROUP BY event_type),
    dev AS (SELECT e.event_id, e.event_type, e.vc, m.med,
                   ABS(e.vc - m.med) AS abs_dev
            FROM e JOIN med m USING (event_type)),
    c2 AS (SELECT event_type, abs_dev, COUNT(*) AS cnt FROM dev GROUP BY event_type, abs_dev),
    w2 AS (SELECT event_type, abs_dev, cnt,
                  SUM(cnt) OVER (PARTITION BY event_type ORDER BY abs_dev
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  SUM(cnt) OVER (PARTITION BY event_type) AS n
           FROM c2),
    mad AS (SELECT event_type,
                   MIN(CASE WHEN cum * 2 >= n
                            THEN abs_dev END) AS mad
            FROM w2 GROUP BY event_type)
    SELECT dev.event_id, dev.event_type, dev.vc AS value_cents,
           dev.med AS med_cents, dev.abs_dev AS dev_cents, mad.mad AS mad_cents
    FROM dev JOIN mad USING (event_type)
    WHERE dev.abs_dev > 3 * mad.mad
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers per event type: |value - median| > 3 * MAD, all in
    exact integer cents (operators/profile.mad_outliers — two counting-sort
    percentile passes + broadcast stat joins)."""
    from kafka_flow_spark.functions import cents
    from kafka_flow_spark.operators.profile import mad_outliers

    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", cents("value").alias("value_cents")
    )
    out = mad_outliers(e, "value_cents", ["event_type"], k=3)
    return out.select(
        "event_id",
        "event_type",
        "value_cents",
        F.col("med").alias("med_cents"),
        F.col("abs_dev").alias("dev_cents"),
        F.col("mad").alias("mad_cents"),
    )


_DRIFT_SPLIT = "2024-03-01"
_DRIFT_BIN = 100  # one-dollar bins over integer cents


@register(
    "q_distribution_drift",
    oracle=f"""
    WITH e AS (
      SELECT event_type, ts,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM events),
    ha AS (SELECT event_type, (vc - ((vc % {_DRIFT_BIN} + {_DRIFT_BIN}) % {_DRIFT_BIN})) // {_DRIFT_BIN} AS bin, COUNT(*) AS ca
           FROM e WHERE ts < TIMESTAMP '{_DRIFT_SPLIT}'
           GROUP BY event_type, bin),
    hb AS (SELECT event_type, (vc - ((vc % {_DRIFT_BIN} + {_DRIFT_BIN}) % {_DRIFT_BIN})) // {_DRIFT_BIN} AS bin, COUNT(*) AS cb
           FROM e WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT}'
           GROUP BY event_type, bin),
    h AS (SELECT COALESCE(ha.event_type, hb.event_type) AS event_type,
                 COALESCE(ha.bin, hb.bin) AS bin,
                 COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
          FROM ha FULL JOIN hb ON ha.event_type = hb.event_type AND ha.bin = hb.bin),
    cum AS (SELECT event_type, bin,
                   SUM(ca) OVER (PARTITION BY event_type ORDER BY bin
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
                   SUM(cb) OVER (PARTITION BY event_type ORDER BY bin
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
                   SUM(ca) OVER (PARTITION BY event_type) AS na,
                   SUM(cb) OVER (PARTITION BY event_type) AS nb,
                   COALESCE(LEAD(bin) OVER (PARTITION BY event_type ORDER BY bin), bin)
                     - bin AS span
            FROM h),
    agg AS (SELECT event_type, MAX(na) AS n_a, MAX(nb) AS n_b,
                   SUM(ABS(cuma * nb - cumb * na) * span) AS emd_num
            FROM cum GROUP BY event_type)
    SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(emd_num AS BIGINT) AS emd_num,
           CASE WHEN n_a * n_b = 0 THEN NULL
                ELSE ({_DRIFT_BIN}.0 * CAST(emd_num AS DOUBLE)) / CAST(n_a * n_b AS DOUBLE)
           END AS emd
    FROM agg
    """,
)
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type earth-mover drift of the value distribution between the
    early and late halves of the stream (split at {split}), over one-dollar
    bins of exact integer cents — operators/profile.histogram_emd."""
    from kafka_flow_spark.functions import cents
    from kafka_flow_spark.operators.profile import histogram_emd

    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", cents("value").alias("vc")
    )
    early = e.where(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp_ntz"))
    late = e.where(F.col("ts") >= F.lit(_DRIFT_SPLIT).cast("timestamp_ntz"))
    return histogram_emd(early, late, "vc", ["event_type"], _DRIFT_BIN)


_OVL_W_US = 1800 * 1_000_000  # 30-minute windows and bins


@register(
    "q_interval_overlap_attribution",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
    v AS (SELECT event_id AS view_id, user_id, us AS v_lo, us + {_OVL_W_US} AS v_hi
          FROM e WHERE event_type = 'view'),
    p AS (SELECT event_id AS purchase_id, user_id, us AS p_lo, us + {_OVL_W_US} AS p_hi
          FROM e WHERE event_type = 'purchase')
    SELECT v.view_id, p.purchase_id, v.user_id,
           CAST(LEAST(v.v_hi, p.p_hi) - GREATEST(v.v_lo, p.p_lo) AS BIGINT)
             AS overlap_us
    FROM v JOIN p ON v.user_id = p.user_id
                 AND v.v_lo < p.p_hi AND p.p_lo < v.v_hi
    """,
)
def q_interval_overlap_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (operators/rangejoin.py
    interval_overlap_join): per user, every (view, purchase) pair whose
    30-minute attention windows intersect, with the exact overlap span —
    the attribution-window primitive.  Binned equi-join on (user, 30-min
    bin), each pair emitted once in its overlap-start bin; the oracle is
    the direct quadratic-within-user join."""
    from kafka_flow_spark.operators.rangejoin import interval_overlap_join

    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
    )
    v = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("_us").alias("v_lo"),
        (F.col("_us") + F.lit(_OVL_W_US)).alias("v_hi"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("_ruid"),
        F.col("_us").alias("p_lo"),
        (F.col("_us") + F.lit(_OVL_W_US)).alias("p_hi"),
    )
    j = interval_overlap_join(
        v.withColumnRenamed("user_id", "uid"),
        p.withColumnRenamed("_ruid", "uid"),
        "v_lo",
        "v_hi",
        "p_lo",
        "p_hi",
        bin_width=_OVL_W_US,
        key_cols=["uid"],
    )
    return j.select(
        "view_id",
        "purchase_id",
        F.col("uid").alias("user_id"),
        (
            F.least(F.col("v_hi"), F.col("p_hi"))
            - F.greatest(F.col("v_lo"), F.col("p_lo"))
        ).alias("overlap_us"),
    )


@register(
    "q_psi_drift",
    oracle=f"""
    WITH e AS (
      SELECT event_type, ts,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM events),
    ha AS (SELECT event_type, (vc - ((vc % {_DRIFT_BIN} + {_DRIFT_BIN}) % {_DRIFT_BIN})) // {_DRIFT_BIN} AS bin, COUNT(*) AS ca
           FROM e WHERE ts < TIMESTAMP '{_DRIFT_SPLIT}'
           GROUP BY event_type, bin),
    hb AS (SELECT event_type, (vc - ((vc % {_DRIFT_BIN} + {_DRIFT_BIN}) % {_DRIFT_BIN})) // {_DRIFT_BIN} AS bin, COUNT(*) AS cb
           FROM e WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT}'
           GROUP BY event_type, bin),
    h AS (SELECT COALESCE(ha.event_type, hb.event_type) AS event_type,
                 COALESCE(ha.bin, hb.bin) AS bin,
                 CAST(COALESCE(ca, 0) AS BIGINT) AS ca,
                 CAST(COALESCE(cb, 0) AS BIGINT) AS cb
          FROM ha FULL JOIN hb ON ha.event_type = hb.event_type AND ha.bin = hb.bin),
    t AS (SELECT event_type, ca, cb,
                 CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS na,
                 CAST(SUM(cb) OVER (PARTITION BY event_type) AS BIGINT) AS nb,
                 CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nbins
          FROM h),
    terms AS (SELECT event_type, na, nb, nbins,
                     CAST(ROUND(
                       (CAST((ca + 1) * (nb + nbins) - (cb + 1) * (na + nbins) AS DOUBLE)
                        / CAST((na + nbins) * (nb + nbins) AS DOUBLE))
                       * LN(CAST((ca + 1) * (nb + nbins) AS DOUBLE)
                            / CAST((cb + 1) * (na + nbins) AS DOUBLE))
                       * 1000000) AS BIGINT) AS term
              FROM t)
    SELECT event_type, MAX(na) AS n_a, MAX(nb) AS n_b, MAX(nbins) AS n_bins,
           CASE WHEN MAX(na) > 0 AND MAX(nb) > 0
                THEN CAST(SUM(term) AS BIGINT) END AS psi_micro
    FROM terms GROUP BY event_type
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Population Stability Index between the early and late
    halves of the stream (same split/bins as q_distribution_drift) —
    operators/profile.histogram_psi, the model-monitoring drift metric in
    micro-units, add-one smoothed, exact per-bin integer terms."""
    from kafka_flow_spark.functions import cents
    from kafka_flow_spark.operators.profile import histogram_psi

    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", cents("value").alias("vc")
    )
    early = e.where(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp_ntz"))
    late = e.where(F.col("ts") >= F.lit(_DRIFT_SPLIT).cast("timestamp_ntz"))
    return histogram_psi(early, late, "vc", ["event_type"], _DRIFT_BIN)


@register(
    "q_session_paths",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    g AS (SELECT user_id, event_id, event_type, us,
                 CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                              ORDER BY us, event_id)
                           > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM e),
    s AS (SELECT user_id, event_id, event_type, us,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS sess
          FROM g),
    p AS (SELECT event_type AS from_label,
                 LEAD(event_type) OVER (PARTITION BY user_id, sess
                                        ORDER BY us, event_id) AS to_label
          FROM s),
    c AS (SELECT from_label, to_label, COUNT(*) AS n
          FROM p WHERE to_label IS NOT NULL GROUP BY from_label, to_label)
    SELECT from_label, to_label, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, from_label, to_label) AS INT)
             AS rank
    FROM c QUALIFY rank <= 20
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event-type transitions inside 30-minute-gap sessions
    (operators/timeseries.session_transitions) — user path analysis with a
    total (ts, event_id) order so counts are partitioning-invariant."""
    from kafka_flow_spark.operators.timeseries import session_transitions

    return session_transitions(
        load(spark, sf_dir, "events"),
        "user_id",
        "ts",
        "event_type",
        "event_id",
        gap_seconds=1800,
        k=20,
    )


@register(
    "q_scd2_history",
    bench=True,
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    m AS (SELECT user_id, event_id, event_type, us,
                 CASE WHEN event_type IS DISTINCT FROM
                           LAG(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY us, event_id)
                      THEN 1 ELSE 0 END AS new_run
          FROM e),
    r AS (SELECT user_id, event_type, us,
                 SUM(new_run) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS run
          FROM m),
    i AS (SELECT user_id, run, MIN(event_type) AS event_type,
                 MIN(us) AS valid_from_us, COUNT(*) AS n_events
          FROM r GROUP BY user_id, run)
    SELECT user_id, event_type, valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY run)
             AS valid_to_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY run) IS NULL
             AS is_current,
           n_events
    FROM i
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history of each user's event_type state
    (operators/timeseries.scd2_history): one interval per consecutive run of
    equal values, [valid_from_us, valid_to_us) with an open current row —
    the Kimball dimension-history build, partitioning-invariant via the
    total (ts, event_id) order.  Timestamps surface as epoch micros (BIGINT)
    so the comparison is integer-exact across engines."""
    from kafka_flow_spark.operators.timeseries import scd2_history

    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        # session tz is pinned UTC; unix_micros rejects TIMESTAMP_NTZ input
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
    )
    out = scd2_history(e, "user_id", "_us", "event_type", "event_id")
    return out.select(
        "user_id",
        "event_type",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "is_current",
        "n_events",
    )


@register(
    "q_winsorized_values",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM events),
    c AS (SELECT event_type, vc, COUNT(*) AS cnt FROM e GROUP BY event_type, vc),
    w AS (SELECT event_type, vc, cnt,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 SUM(cnt) OVER (PARTITION BY event_type) AS n
          FROM c),
    cuts AS (SELECT event_type,
                    MIN(CASE WHEN cum * 100 >= 5 * n THEN vc END) AS p_lo,
                    MIN(CASE WHEN cum * 100 >= 95 * n THEN vc END) AS p_hi
             FROM w GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.vc AS value_cents,
           cuts.p_lo, cuts.p_hi,
           GREATEST(cuts.p_lo, LEAST(cuts.p_hi, e.vc)) AS value_w
    FROM e JOIN cuts USING (event_type)
    """,
)
def q_winsorized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization of value cents into the [p5, p95]
    discrete-percentile band (operators/profile.winsorize — exact
    integer-predicate order statistics, broadcast cut points, map-side
    clamp)."""
    from kafka_flow_spark.functions import cents
    from kafka_flow_spark.operators.profile import winsorize

    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", cents("value").alias("value_cents")
    )
    out = winsorize(e, "value_cents", ["event_type"], lo=0.05, hi=0.95)
    return out.select(
        "event_id", "event_type", "value_cents", "p_lo", "p_hi", "value_w"
    )


@register(
    "q_windowed_drift",
    oracle=f"""
    WITH e AS (
      SELECT date_trunc('hour', ts) AS w,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM events),
    b AS (SELECT w, (vc - ((vc % {_DRIFT_BIN} + {_DRIFT_BIN}) % {_DRIFT_BIN}))
                    // {_DRIFT_BIN} AS bin
          FROM e),
    wh AS (SELECT w, bin, COUNT(*) AS ca FROM b GROUP BY w, bin),
    ref AS (SELECT bin, COUNT(*) AS cb FROM b GROUP BY bin),
    wins AS (SELECT DISTINCT w FROM wh),
    refk AS (SELECT wins.w, ref.bin, ref.cb FROM wins CROSS JOIN ref),
    h AS (SELECT COALESCE(wh.w, refk.w) AS w, COALESCE(wh.bin, refk.bin) AS bin,
                 COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
          FROM wh FULL JOIN refk ON wh.w = refk.w AND wh.bin = refk.bin),
    cum AS (SELECT w, bin,
                   SUM(ca) OVER (PARTITION BY w ORDER BY bin
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
                   SUM(cb) OVER (PARTITION BY w ORDER BY bin
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
                   SUM(ca) OVER (PARTITION BY w) AS na,
                   SUM(cb) OVER (PARTITION BY w) AS nb,
                   COALESCE(LEAD(bin) OVER (PARTITION BY w ORDER BY bin), bin) - bin
                     AS span
            FROM h),
    agg AS (SELECT w, MAX(na) AS n_a, MAX(nb) AS n_b,
                   SUM(ABS(cuma * nb - cumb * na) * span) AS emd_num
            FROM cum GROUP BY w)
    SELECT w AS window_start, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(emd_num AS BIGINT) AS emd_num,
           CASE WHEN n_a * n_b = 0 THEN NULL
                ELSE ({_DRIFT_BIN}.0 * CAST(emd_num AS DOUBLE)) / CAST(n_a * n_b AS DOUBLE)
           END AS emd
    FROM agg
    """,
)
def q_windowed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-window drift monitor: EMD of each hour's value distribution
    against the full-period reference histogram
    (operators/profile.windowed_histogram + windowed_drift — the streaming
    form runs the identical plan on a stream; batch-vs-stream differential
    in tests/test_rolling.py)."""
    from kafka_flow_spark.functions import cents
    from kafka_flow_spark.operators.profile import (
        floor_bin_expr,
        windowed_drift,
        windowed_histogram,
    )

    e = load(spark, sf_dir, "events").select("ts", cents("value").alias("vc"))
    wh = windowed_histogram(e, "ts", "vc", _DRIFT_BIN, "1 hour")
    ref = e.select(floor_bin_expr("vc", _DRIFT_BIN).alias("_bin")).groupBy(
        "_bin"
    ).agg(F.count(F.lit(1)).alias("n"))
    out = windowed_drift(wh, ref, _DRIFT_BIN)
    return out.select("window_start", "n_a", "n_b", "emd_num", "emd")


# --- CUSUM changepoint (temporal drift: where did the level shift?) ---------

_DAY_US = 86_400_000_000


@register(
    "q_cusum_changepoint",
    oracle=f"""
    WITH e AS (SELECT event_type, epoch_us(ts) // {_DAY_US} AS day FROM events),
    c AS (SELECT event_type, day, COUNT(*) AS n FROM e GROUP BY event_type, day),
    tot AS (SELECT event_type, COUNT(*) AS d, SUM(n) AS t FROM c GROUP BY event_type),
    r AS (SELECT c.event_type, c.day, tot.d, tot.t,
                 ROW_NUMBER() OVER (PARTITION BY c.event_type ORDER BY c.day) AS k,
                 SUM(c.n) OVER (PARTITION BY c.event_type ORDER BY c.day
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM c JOIN tot USING (event_type)),
    s AS (SELECT event_type, day, d, t, d * cum - k * t AS sv FROM r),
    sel AS (SELECT event_type, day, sv,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY ABS(sv) DESC, day) AS rn
            FROM s)
    SELECT sel.event_type,
           CAST(tot.d AS BIGINT) AS n_buckets,
           CAST(tot.t AS BIGINT) AS total,
           CAST(sel.day AS BIGINT) AS cp_day,
           CAST(ABS(sel.sv) AS BIGINT) AS cusum_scaled
    FROM sel JOIN tot USING (event_type) WHERE rn = 1
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint over the daily volume series
    (operators/profile.cusum_changepoint): the day that best splits the
    series into two level regimes, by max |D·cum_k − k·T| — exact bigints,
    the temporal member of the drift family (PSI/EMD are distributional)."""
    from kafka_flow_spark.operators.profile import cusum_changepoint

    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_DAY_US}").alias("_day"),
    )
    counts = e.groupBy("event_type", "_day").agg(F.count(F.lit(1)).alias("_n"))
    out = cusum_changepoint(counts, "event_type", "_day", "_n")
    return out.select(
        "event_type",
        "n_buckets",
        "total",
        F.col("cp_time").cast("long").alias("cp_day"),
        "cusum_scaled",
    )


# --- truncated-EWMA residual anomalies --------------------------------------

_EWMA_THRESH_C = 10000  # cents: flag |x - ewma| > $100


@register(
    "q_ewma_anomaly",
    oracle=f"""
    WITH v AS (SELECT user_id, event_id, ts,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_c
               FROM events),
    l AS (SELECT user_id, event_id, value_c,
                 LAG(value_c, 1) OVER w AS x1,
                 LAG(value_c, 2) OVER w AS x2,
                 LAG(value_c, 3) OVER w AS x3,
                 LAG(value_c, 4) OVER w AS x4
          FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, event_id, value_c,
                 COALESCE(8 * x1, 0) + COALESCE(4 * x2, 0)
                   + COALESCE(2 * x3, 0) + COALESCE(x4, 0) AS num,
                 (CASE WHEN x1 IS NULL THEN 0 ELSE 8 END)
                   + (CASE WHEN x2 IS NULL THEN 0 ELSE 4 END)
                   + (CASE WHEN x3 IS NULL THEN 0 ELSE 2 END)
                   + (CASE WHEN x4 IS NULL THEN 0 ELSE 1 END) AS den
          FROM l)
    SELECT user_id, event_id, value_c,
           CASE WHEN den > 0 THEN num // den END AS ewma,
           CASE WHEN den > 0 THEN value_c - num // den END AS deviation,
           COALESCE(ABS(value_c - CASE WHEN den > 0 THEN num // den END)
                    > {_EWMA_THRESH_C}, FALSE) AS is_anomaly
    FROM s
    """,
)
def q_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user truncated-EWMA residual anomaly flags over the event value
    stream (operators/timeseries.ewma_anomaly): values quantized to exact
    cents, alpha=1/2 power-of-two weights over the last 4 observations, all
    bigint — the streaming "is this spend off its own recent level?" test,
    bit-reproducible on any engine.  One window exchange on user_id."""
    from kafka_flow_spark.operators.timeseries import ewma_anomaly

    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("value_c"),
    )
    out = ewma_anomaly(
        e, "user_id", ["ts", "event_id"], "value_c", k=4, threshold=_EWMA_THRESH_C
    )
    return out.select(
        "user_id", "event_id", "value_c", "ewma", "deviation", "is_anomaly"
    )


# --- Poisson bootstrap of the mean event value -------------------------------

_BOOT_B = 32


def _bootstrap_oracle() -> str:
    from kafka_flow_spark.operators.sampling import poisson1_thresholds

    ts = ", ".join(f"'{t:06x}'" for t in poisson1_thresholds())
    return f"""
    WITH v AS (SELECT event_id,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
               FROM events),
    f AS (SELECT event_id, vc, UNNEST(range({_BOOT_B})) AS replicate FROM v),
    w AS (SELECT replicate, vc,
                 len(list_filter([{ts}],
                     t -> t <= substring(md5('boot:' || replicate || ':'
                                             || event_id), 1, 6))) AS w
          FROM f),
    a AS (SELECT replicate, CAST(SUM(w) AS BIGINT) AS n_eff,
                 CAST(SUM(w * vc) AS BIGINT) AS sum_value
          FROM w GROUP BY replicate)
    SELECT CAST(replicate AS BIGINT) AS replicate, n_eff, sum_value,
           CASE WHEN n_eff > 0 THEN
             CASE WHEN sum_value >= 0 THEN sum_value // n_eff
                  ELSE -((-sum_value) // n_eff) END
           END AS mean_value
    FROM a
    """


@register("q_bootstrap_mean_value", oracle=_bootstrap_oracle())
def q_bootstrap_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-replicate deterministic Poisson bootstrap of the mean event value
    in exact cents (operators/sampling.poisson_bootstrap): the error bar a
    data card carries at 100 TB, from ONE pass — content-addressed
    Poisson(1) weights against the shared CDF thresholds, one
    map-combinable (replicate) aggregate."""
    from kafka_flow_spark.operators.sampling import poisson_bootstrap

    e = load(spark, sf_dir, "events").select(
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("vc"),
    )
    out = poisson_bootstrap(e, "event_id", "vc", replicates=_BOOT_B, salt="boot")
    return out.select(
        F.col("replicate").cast("long").alias("replicate"),
        "n_eff",
        "sum_value",
        "mean_value",
    )


# --- exact-moment Pearson correlation ---------------------------------------


@register(
    "q_price_quantity_corr",
    oracle="""
    WITH p AS (SELECT l_returnflag,
                      CAST(l_quantity AS BIGINT) AS x,
                      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
               FROM lineitem),
    m AS (SELECT l_returnflag,
                 COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM p GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_points,
           CASE WHEN n >= 2
                 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
           THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           END AS corr
    FROM m
    """,
)
def q_price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-moment Pearson correlation of quantity vs extended price per
    return flag (operators/profile.group_corr) — F.corr/DuckDB corr stream
    doubles in engine-specific orders, so the oracle-able form carries the
    five moments as exact DECIMAL(38,0) sums and evaluates the mirrored
    double expression once per group."""
    from kafka_flow_spark.functions import cents
    from kafka_flow_spark.operators.profile import group_corr

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("_x"),
        cents("l_extendedprice").alias("_y"),
    )
    return group_corr(li, "l_returnflag", "_x", "_y")


# --- join/agg key skew diagnosis --------------------------------------------


@register(
    "q_key_skew",
    oracle="""
    WITH c AS (SELECT user_id AS key, COUNT(*) AS key_count
               FROM events GROUP BY user_id),
    st AS (SELECT COUNT(*) AS n_keys, CAST(SUM(key_count) AS BIGINT) AS n_rows,
                  MAX(key_count) AS max_key_count FROM c),
    top AS (SELECT key, key_count,
                   CAST(ROW_NUMBER() OVER (ORDER BY key_count DESC, key) AS INT) AS rank
            FROM c QUALIFY rank <= 5)
    SELECT rank, key, CAST(key_count AS BIGINT) AS key_count,
           st.n_rows, CAST(st.n_keys AS BIGINT) AS n_keys,
           CAST(st.max_key_count AS BIGINT) AS max_key_count,
           CAST(CAST(st.max_key_count AS HUGEINT) * st.n_keys * 1000000
                // st.n_rows AS BIGINT) AS skew_ppm
    FROM top CROSS JOIN st
    """,
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew report for events.user_id (operators/profile
    key_skew_report): hottest 5 keys + global shape stats — the
    pre-flight a 100 TB join runs before picking salting/AQE-skew
    strategies.  TakeOrderedAndProject top-k, no global sort."""
    from kafka_flow_spark.operators.profile import key_skew_report

    return key_skew_report(load(spark, sf_dir, "events"), "user_id", top_k=5)


# --- linear-counting approximate distinct (value-exact sketch) ---------------

_LC_M = 4096
_LC_FOLD = (
    "list_reduce(list_transform(range(1, 7), d -> "
    "CAST(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), d, 1))"
    " - 1 AS BIGINT)), (a, b) -> a * 16 + b)"
)


@register(
    "q_approx_distinct_linear",
    oracle=f"""
    WITH b AS (SELECT DISTINCT event_type, {_LC_FOLD} % {_LC_M} AS bucket
               FROM events WHERE user_id IS NOT NULL),
    occ AS (SELECT event_type, COUNT(*) AS occupied FROM b GROUP BY event_type),
    ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
           FROM events GROUP BY event_type)
    SELECT occ.event_type, CAST(occupied AS BIGINT) AS occupied,
           CASE WHEN occupied < {_LC_M}
                THEN CAST(FLOOR({_LC_M}.0 * LN({_LC_M}.0 / ({_LC_M} - occupied))
                          * 1000000.0) AS BIGINT) END AS est_e6,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
    FROM occ JOIN ex USING (event_type)
    """,
)
def q_approx_distinct_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct users per event type
    (operators/sketches.linear_counting_*): the VALUE-EXACT approximate-
    distinct — the occupancy set is a deterministic md5 hash, the estimate
    one FLOOR-e6 ln per group, so unlike the HLL row
    (q_approx_distinct_users, rows-only: register internals are engine-
    specific) the whole sketch is oracle-gated.  exact_distinct rides along
    for the error story; the sketch itself is |groups|·m-cardinality and
    mergeable across shards by distinct-union."""
    from kafka_flow_spark.operators.sketches import (
        linear_counting_estimate,
        linear_counting_sketch,
    )

    ev = load(spark, sf_dir, "events")
    sk = linear_counting_sketch(ev, ["event_type"], "user_id", m=_LC_M)
    est = linear_counting_estimate(sk, ["event_type"], _LC_M)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


# --- day-of-week seasonal volume outliers ------------------------------------


@register(
    "q_dow_volume_outliers",
    oracle=f"""
    WITH e AS (SELECT event_type, epoch_us(ts) // {_DAY_US} AS day FROM events),
    c AS (SELECT event_type, day, COUNT(*) AS n FROM e GROUP BY event_type, day),
    p AS (SELECT event_type, day, n, ((day % 7) + 7) % 7 AS phase FROM c),
    t AS (SELECT event_type, phase, COUNT(*) AS n_phase, SUM(n) AS phase_total
          FROM p GROUP BY event_type, phase),
    r AS (SELECT p.event_type, p.day, p.n, p.phase,
                 CAST(t.n_phase AS BIGINT) AS n_phase,
                 CAST(t.phase_total AS BIGINT) AS phase_total,
                 CAST(p.n * t.n_phase - t.phase_total AS BIGINT) AS resid_scaled
          FROM p JOIN t USING (event_type, phase))
    SELECT event_type, day, CAST(n AS BIGINT) AS n, phase, n_phase, phase_total,
           resid_scaled, rank
    FROM (SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY event_type
            ORDER BY ABS(resid_scaled) DESC, day) AS INT) AS rank FROM r)
    WHERE rank <= 3
    """,
)
def q_dow_volume_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week-aware volume anomalies (operators/profile
    seasonal_residuals): per event type, the 3 days whose count deviates
    most from their SAME-WEEKDAY mean — exact c·m−t bigint residuals, so
    weekend dips never false-alarm and the ranking is engine-exact."""
    from pyspark.sql.window import Window

    from kafka_flow_spark.operators.profile import seasonal_residuals

    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_DAY_US}").alias("day"),
    )
    counts = e.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    res = seasonal_residuals(counts, "event_type", "day", "n", period=7)
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("resid_scaled")).desc(), F.asc("day")
    )
    return (
        res.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "event_type", "day", "n", "phase", "n_phase", "phase_total",
            "resid_scaled", "rank",
        )
    )


# --- recency-weighted sampling ------------------------------------------------

_RW_ANCHOR, _RW_CAP = "2024-01-31 00:00:00", 8


def _rw_oracle() -> str:
    from kafka_flow_spark.operators.sampling import fraction_threshold

    branches = " ".join(
        f"WHEN {k} THEN hb < '{fraction_threshold(2.0 ** -k)}'"
        for k in range(1, _RW_CAP + 1)
    )
    return f"""
    WITH t AS (
      SELECT event_id,
             GREATEST(0, date_diff('day', ts, TIMESTAMP '{_RW_ANCHOR}') // 7)
               AS age_weeks,
             substring(md5(CAST(event_id AS VARCHAR)), 1, 6) AS hb
      FROM events),
    k AS (SELECT event_id, age_weeks,
                 CASE LEAST(age_weeks, {_RW_CAP}) WHEN 0 THEN TRUE
                      {branches} END AS kept
          FROM t)
    SELECT CAST(age_weeks AS INT) AS age_weeks,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM k GROUP BY age_weeks
    """


@register("q_recency_weighted_sample", oracle=_rw_oracle())
def q_recency_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-biased deterministic sampling over the event stream
    (operators/sampling.recency_weighted_sample): keep probability halves
    per week of age from a fixed anchor — recent data over-weighted, the
    tail kept at a decaying floor instead of cut off.  Content-addressed
    md5 gates with literal per-age thresholds (the hash_sample contract
    with a time-varying fraction), pure scan predicate; output aggregated
    per age (n_total, n_kept) so the parity pins every row's gate."""
    from kafka_flow_spark.operators.sampling import recency_weighted_sample

    events = load(spark, sf_dir, "events")
    out = recency_weighted_sample(
        events, "event_id", "ts", _RW_ANCHOR, half_life_weeks=1,
        max_age_weeks=_RW_CAP,
    )
    return out.groupBy(F.col("age_weeks").cast("int").alias("age_weeks")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
    )
