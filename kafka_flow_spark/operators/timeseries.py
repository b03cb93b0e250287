"""Time-series analytics over keyed event streams: regular-grid resampling
with forward-fill, and ordered-step funnel analysis.

Neither has a counterpart in the reference (kafka-flow folds are the
mechanism a user WOULD build these with — see `MIGRATION.md`); both are
table-stakes event-analytics queries a replacement engine must answer, and
both are expressed as pure DataFrame plans:

- ``resample_ffill``: per-key hourly/step grid between each key's first and
  last observation, carrying the latest observation forward onto every grid
  point (gap-filling for downstream models that want aligned samples).
- ``funnel_steps``: per key, the earliest strictly-ordered completion chain
  of N named steps (first A, first B after that A, first C after that B...)
  and the reached depth.

Scale shape: every shuffle is keyed on the stream key (or (key, ts)) — never
on event-pair volume.  The resample grid is generated narrowly per key
(``sequence`` between aggregated bounds — grid size is bounded by
time-span/step, independent of event count) and the fill is one window pass;
the funnel's N per-step windows all share the same partition key, so
Catalyst plans ONE exchange and N in-place window operators (no per-step
shuffle; plan-verified).  No Python UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Forward-filled regular resampling: one row per (key, grid point).

    The grid for a key spans ``date_trunc(step-unit, min ts)`` through
    ``date_trunc(step-unit, max ts)`` inclusive, stepping by ``step``.  Each
    grid point carries the value of the latest observation at-or-before it;
    leading grid points before the first observation are NULL.  When several
    observations share a timestamp the one with the greatest
    ``tiebreak_col`` wins (required for engine-reproducible output when the
    value column is not functionally determined by (key, ts)).

    Output: (key, grid_ts, value) with ``value`` forward-filled.

    Mechanics: the only observations any grid point can sample are, per
    (key, grid bucket), the bucket's LAST observation (sampled by the NEXT
    grid point) and the observation exactly ON the bucket's grid point
    (sampled by THAT grid point — "coincident observation first").  So
    observations are reduced to at most two survivors per (key,
    ``date_trunc`` bucket) with ``max_by(value, (ts, tiebreak))`` — once
    unrestricted with ``_t = max(ts)``, once restricted to ``ts == bucket
    start`` — a MAP-COMBINABLE aggregate over bucket-count groups (≈ grid
    size, independent of event volume) that replaces a full event-volume
    window sort.  (One survivor is NOT enough: with events at 01:00 v=4 and
    01:30 v=6, the bucket-last reduction alone would leave grid 01:00
    without its coincident 01:00 observation.)  The survivors are unioned
    with the NULL-valued grid rows and forward-filled by one ``last(value,
    ignorenulls)`` window ordered by (ts, is_grid): a bucket survivor at
    10:30 sorts after the 10:00 grid point and before 11:00, and a
    boundary survivor at 10:00 sorts before the 10:00 grid point, so every
    grid point samples exactly the latest at-or-before observation.  NULL
    observation values are treated as gaps (carried over).  Two shuffles
    keyed on (key, bucket)-family keys; the fill window sorts ~2× grid-size
    rows, never event volume (sf10, 10M events: ~16 s → 7.9 s warm for this
    rewrite, vs 9.2 s for the DuckDB oracle on the same data).
    """
    unit = step.split()[-1].rstrip("s")  # "1 hour" -> "hour"
    tb = F.col(tiebreak_col) if tiebreak_col else F.col(value_col)
    at0 = F.col(ts_col) == F.date_trunc(unit, F.col(ts_col))
    surv = df.groupBy(
        F.col(key_col), F.date_trunc(unit, F.col(ts_col)).alias("_bkt")
    ).agg(
        F.max(ts_col).alias("_t"),
        F.max_by(F.col(value_col), F.struct(F.col(ts_col), tb)).alias("_v"),
        F.max_by(
            F.when(at0, F.col(value_col)), F.when(at0, F.struct(F.col(ts_col), tb))
        ).alias("_v0"),
    )
    # NULL-valued boundary survivors are inert under last(ignorenulls), so
    # only a non-null _v0 needs its own row (and only when the bucket-last
    # survivor isn't already the boundary observation itself).
    boundary = F.when(
        F.col("_v0").isNotNull() & (F.col("_t") != F.col("_bkt")),
        F.struct(F.col("_bkt").alias("_t"), F.col("_v0").alias("_v")),
    )
    obs = (
        surv.select(
            F.col(key_col),
            F.explode(
                F.array_compact(
                    F.array(F.struct(F.col("_t"), F.col("_v")), boundary)
                )
            ).alias("_s"),
        )
        .select(
            key_col,
            F.col("_s._t").alias("_t"),
            F.col("_s._v").alias("_v"),
            F.lit(0).alias("_is_grid"),
        )
    )
    grid = (
        df.groupBy(key_col)
        .agg(F.min(ts_col).alias("_mn"), F.max(ts_col).alias("_mx"))
        .select(
            F.col(key_col),
            F.explode(
                F.sequence(
                    F.date_trunc(unit, "_mn"),
                    F.date_trunc(unit, "_mx"),
                    F.expr(f"INTERVAL {step}"),
                )
            ).alias("_t"),
        )
        .select(key_col, "_t", F.lit(None).cast(obs.schema["_v"].dataType).alias("_v"),
                F.lit(1).alias("_is_grid"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        obs.unionByName(grid)
        .withColumn("_fill", F.last("_v", ignorenulls=True).over(w))
        .filter(F.col("_is_grid") == 1)
        .select(F.col(key_col), F.col("_t").alias("grid_ts"), F.col("_fill").alias("value"))
    )


def funnel_steps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Earliest ordered completion of ``steps`` per key.

    ``t1`` is the key's first ``steps[0]`` event; ``t_{i+1}`` is its first
    ``steps[i]`` event STRICTLY AFTER ``t_i`` (the standard ordered-funnel
    semantics: a click before any view does not count).  ``depth`` is the
    number of completed steps.  Each t_i is a deterministic MIN, so output
    is engine-reproducible without tie-break columns.

    Output: (key, t_1 .. t_n, depth) — one row per key that has at least
    one event of any kind.

    Mechanics: N conditional-min windows over the same key partition —
    Catalyst plans ONE exchange and N in-place window operators, so funnel
    depth never multiplies shuffles.  (A self-join formulation would shuffle
    N times and explode on hot keys; the window form is the 100 TB shape.)
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(key_col)
    out = df.select(key_col, ts_col, type_col)
    prev: Column | None = None
    names = []
    for i, s in enumerate(steps, start=1):
        cond = F.col(type_col) == F.lit(s)
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        name = f"t{i}"
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(name)
        names.append(name)
    depth = sum((F.col(n).isNotNull()).cast("int") for n in names)
    return (
        out.groupBy(key_col)
        .agg(*[F.first(n).alias(n) for n in names])
        .withColumn("depth", depth)
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: keys grouped by first-activity period, then
    counted distinct-active per (cohort, period-offset) — the standard
    retention triangle behind "what fraction of week-N signups were still
    active k weeks later".

    Output: (cohort, period_offset, n_active, n_cohort, retention) where
    ``retention = n_active / n_cohort`` (offset 0 rows have retention 1.0 by
    construction).

    Scale shape: one window over the key partition assigns each event its
    key's cohort in place (no self-join back onto the event stream), one
    map-combinable distinct aggregate on (cohort, period) counts actives,
    and the cohort sizes come from the offset-0 rows themselves via a
    cohort-key window — no second scan of the events.  Shuffles are keyed on
    the stream key and on (cohort, period): both tiny key spaces relative to
    event volume.
    """
    supported = {"week": 7, "day": 1}
    if period not in supported:
        raise ValueError(
            f"period must be one of {sorted(supported)} (fixed-length periods; "
            f"calendar periods like 'month' need months_between offset math), "
            f"got {period!r}"
        )
    w = Window.partitionBy(key_col)
    per = df.select(
        F.col(key_col), F.date_trunc(period, F.col(ts_col)).alias("_p")
    ).withColumn("_cohort", F.min("_p").over(w))
    counts = per.groupBy(F.col("_cohort").alias("cohort"), F.col("_p")).agg(
        F.countDistinct(key_col).alias("n_active")
    )
    wc = Window.partitionBy("cohort")
    unit_days = supported[period]
    return (
        counts.withColumn(
            "n_cohort",
            F.max(F.when(F.col("_p") == F.col("cohort"), F.col("n_active"))).over(wc),
        )
        .select(
            "cohort",
            (F.datediff(F.col("_p"), F.col("cohort")) / F.lit(unit_days))
            .cast("int")
            .alias("period_offset"),
            "n_active",
            "n_cohort",
            (F.col("n_active").cast("double") / F.col("n_cohort").cast("double"))
            .alias("retention"),
        )
    )


def rolling_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    frac_digits: int = 2,
) -> DataFrame:
    """Trailing time-RANGE rolling count/sum/avg of ``value_col`` per key:
    for every event, aggregates over the key's events in
    ``[ts - window_seconds, ts]`` (inclusive both ends — SQL RANGE frame
    semantics).

    The moving SUM runs on unscaled integer cents, which makes it exact and
    ORDER-INDEPENDENT — load-bearing for oracle parity, because engines
    disagree on moving-aggregate evaluation order (DuckDB uses a segment
    tree, Spark re-scans bounded frames); double sums would drift in the
    last ulp.  One decimal rescale surfaces the double, one division + 4dp
    round the average (both single deterministic ops).

    Scale shape: ONE shuffle on the key, one ordered window pass per
    partition; the RANGE frame is O(frame span) per row with no state beyond
    the frame.  Key cardinality (users) provides the parallelism — no
    global window, no driver state.
    """
    from kafka_flow_spark.functions import cents, unscaled

    # NTZ -> LTZ is an exact identity on the stored micros (session timezone
    # is pinned UTC in session.py); unix_micros rejects TIMESTAMP_NTZ input.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    sum_cents = F.sum(cents(value_col, frac_digits)).over(w)
    n = F.count(F.lit(1)).over(w)
    roll_sum = unscaled(sum_cents, frac_digits)
    # 4dp average WITHOUT F.round: Spark rounds the shortest-decimal string
    # (BigDecimal.valueOf) while DuckDB rounds the binary value, so ROUND(x,4)
    # disagrees exactly on the .00005-boundary quotients a cents/count
    # division constantly produces.  Instead: round-half-away-from-zero in
    # explicit arithmetic — floor((2|s|+n)/(2n)) on doubles — which both
    # engines evaluate bit-identically (exact below 2^53 numerators).
    s4 = (sum_cents * F.lit(100)).cast("double")  # 1e-4 units
    nd = n.cast("double")
    avg_scaled = (
        F.signum(s4) * F.floor((F.abs(s4) * 2 + nd) / (nd * 2))
    ).cast("long")
    return df.select(
        "*",
        n.alias("roll_n"),
        roll_sum.alias("roll_sum"),
        unscaled(avg_scaled, 4).alias("roll_avg"),
    )


def session_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    label_col: str,
    id_col: str,
    gap_seconds: int,
    k: int = 20,
) -> DataFrame:
    """Top-k label→label transitions within gap-based sessions — the path
    analysis behind "what do users do after X": sessionize per key (a new
    session starts after ``gap_seconds`` of silence), take ADJACENT label
    pairs in (ts, id) order inside each session, count globally.

    All counting is integer; the (ts, id) order key is total, so the
    transition multiset — and the (count DESC, labels ASC) top-k — is
    deterministic under any partitioning.

    Scale shape: ONE shuffle on the key feeds both the session-boundary
    window and the lead() window (same partition key, Catalyst plans one
    exchange); the transition count is map-combinable on a tiny
    (label, label) domain.  Output: (from_label, to_label, n, rank).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    wk = Window.partitionBy(key_col).orderBy(us, F.col(id_col))
    new_sess = (
        us - F.lag(us).over(wk) > gap_seconds * 1_000_000
    ).cast("long")
    with_sess = df.select(
        key_col,
        id_col,
        F.col(label_col).alias("_lab"),
        us.alias("_us"),
        F.sum(F.coalesce(new_sess, F.lit(0))).over(
            wk.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_sess"),
    )
    ws = Window.partitionBy(key_col, "_sess").orderBy("_us", id_col)
    pairs = with_sess.select(
        F.col("_lab").alias("from_label"),
        F.lead("_lab").over(ws).alias("to_label"),
    ).where(F.col("to_label").isNotNull())
    counts = pairs.groupBy("from_label", "to_label").agg(
        F.count(F.lit(1)).alias("n")
    )
    wr = Window.orderBy(F.desc("n"), F.asc("from_label"), F.asc("to_label"))
    return (
        counts.orderBy(F.desc("n"), "from_label", "to_label")
        .limit(k)
        .withColumn("rank", F.row_number().over(wr).cast("int"))
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change-event stream:
    one row per (key, consecutive run of equal values), carrying
    ``valid_from`` (first event of the run), ``valid_to`` (start of the next
    run, NULL for the open interval), ``is_current`` and ``n_events``.
    Consecutive events with the SAME value extend the run — no-op changes
    never open a new interval (the Kimball SCD2 contract).

    Determinism: events are totally ordered by (ts, tiebreak) per key, so
    run boundaries — and therefore every interval — are partitioning-
    invariant (same pattern as session_transitions).  NULL values are a
    legal state: run comparison is NULL-safe (<=>).

    Scale shape: ONE hashpartitioning exchange on the key feeds all three
    windows (lag for boundary detection, running sum for run ids, lead for
    valid_to — Spark reuses the exchange via the subset-clustering rule),
    plus one map-combinable aggregate per run.  Nothing scales beyond
    events-per-key sort cost; at 100 TB keys spread across executors and
    AQE splits skewed ones.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    is_start = ~F.col(value_col).eqNullSafe(
        F.lag(F.col(value_col)).over(w)
    ) | F.row_number().over(w).eqNullSafe(F.lit(1))
    runs = df.select(
        F.col(key_col), F.col(ts_col), F.col(tiebreak_col), F.col(value_col)
    ).withColumn(
        "_run",
        F.sum(F.when(is_start, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = runs.groupBy(key_col, "_run").agg(
        # runs have constant value by construction; min is the deterministic pick
        F.min(value_col).alias(value_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wk = Window.partitionBy(key_col).orderBy("_run")
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(wk))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key_col, value_col, "valid_from", "valid_to", "is_current", "n_events"
        )
    )


def group_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    scale: int = 10_000,
) -> DataFrame:
    """Per-key OLS trend over integer (x, y) points — slope and mean as
    scaled bigints, bit-exact across engines.

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    computed entirely in bigint: x is CENTERED per key on min(x) first (the
    slope is shift-invariant in value, but centering bounds the intermediate
    products — with raw epoch-day x the n·Σxy term alone would overflow the
    scaled numerator).  The final division is sign-adjusted TRUNCATION
    ``sign(num) · (|num|·scale div den)`` — both Spark's ``div`` and
    DuckDB's ``//`` truncate toward zero (verified: -7 // 2 = -3 in BOTH),
    so plain div would also match; the explicit form pins the
    trunc-toward-zero semantics in the contract rather than leaving it to
    each engine's operator definition.

    Scale shape: one map-combinable min(x) aggregate per key joined back
    (|keys| rows, AQE-sized — broadcast when small), then ONE map-combinable
    moment aggregate — two scans, no window, no sort.  Overflow posture is the repo's ANSI contract: loud
    throw, never silent wrap; bound inputs so n·Σ|x'y|·scale < 2^63 (x'
    centered — e.g. day offsets × daily cents are ~1e17 at 10M events).

    Output: (key, n_points, slope_scaled, avg_y_scaled) — slope in y-units
    per x-unit × scale; keys with a degenerate x spread (den = 0) surface
    slope_scaled NULL.
    """
    mins = df.groupBy(key_col).agg(F.min(x_col).alias("_x0"))
    # no broadcast hint: mins is one row per KEY (unbounded at 100 TB —
    # billions of users would force a multi-GB build onto every executor);
    # both join sides are post-aggregation, so AQE's size stats pick
    # broadcast exactly when mins is actually small (review r6).
    pts = df.join(mins, key_col).select(
        F.col(key_col),
        (F.col(x_col) - F.col("_x0")).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    m = pts.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    m = (
        m.withColumn("num_c", F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        .withColumn("den_c", F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
    )
    slope = F.when(
        F.col("den_c") > 0,
        F.when(
            F.col("num_c") >= 0, F.expr(f"(num_c * {int(scale)}) div den_c")
        ).otherwise(-F.expr(f"((-num_c) * {int(scale)}) div den_c")),
    )
    avg = F.when(
        F.col("_sy") >= 0, F.expr(f"(_sy * {int(scale)}) div _n")
    ).otherwise(-F.expr(f"((-_sy) * {int(scale)}) div _n"))
    return m.select(
        F.col(key_col),
        F.col("_n").alias("n_points"),
        slope.alias("slope_scaled"),
        avg.alias("avg_y_scaled"),
    )


def ewma_anomaly(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_int_col: str,
    k: int = 4,
    threshold: int = 0,
) -> DataFrame:
    """Per-key truncated-EWMA residual anomaly flagging in EXACT integers.

    The classic streaming anomaly test — "does this observation sit far from
    the exponentially-weighted level of its own recent history?" — with the
    EWMA truncated to the last ``k`` observations so it is a BOUNDED window
    expression instead of an unbounded recursion:

        ewma_i = (2^{k-1}·x_{i-1} + 2^{k-2}·x_{i-2} + ... + 1·x_{i-k})
                 div (2^k - 1)

    (alpha = 1/2; weights are exact powers of two, the divisor is the sum of
    the weights actually present, and everything stays bigint — ``div``
    truncation toward zero is the only rounding; DuckDB's ``//`` truncates
    identically and the streaming twin mirrors it explicitly, so the output
    is bit-reproducible on NEGATIVE series too — no non-negativity
    assumption).  The first observation of a key has no history:
    ewma/deviation are NULL and the row never flags.  Ramp-in rows (fewer
    than ``k`` predecessors) renormalize over the weights present, exactly.

    ``value_int_col`` must already be an integer column (quantize doubles
    upstream — cents, micro-units — so the fp→int policy is the caller's
    single explicit decision).  ``threshold`` is in the same integer units;
    a row flags when ``abs(x - ewma) > threshold``.

    Scale shape: ONE window (hash-exchange on the key + per-partition sort
    on ``order_cols``) feeding k ``lag`` expressions evaluated in a single
    pass — no self-joins, no recursion, no Python.  At 100 TB this is the
    same exchange every per-key sessionization already pays; k only widens
    the projected expression, not the shuffle.  Output: input columns +
    (ewma, deviation, is_anomaly).
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0, got {threshold}")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    x = F.col(value_int_col).cast("long")
    lags = [F.lag(x, j).over(w) for j in range(1, k + 1)]
    weights = [2 ** (k - j) for j in range(1, k + 1)]
    num = None
    den = None
    for lag_col, wt in zip(lags, weights):
        term = F.when(lag_col.isNotNull(), F.lit(wt) * lag_col).otherwise(F.lit(0))
        wgt = F.when(lag_col.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = wgt if den is None else den + wgt
    staged = df.select(
        "*",
        num.cast("long").alias("_ewma_num"),
        den.cast("long").alias("_ewma_den"),
    )
    # bigint div (truncates toward zero — DuckDB's // and the streaming
    # twin's sign·(|num|//den) match it exactly, negatives included);
    # NULL while the key has no history yet.
    ewma = F.when(F.col("_ewma_den") > 0, F.expr("_ewma_num div _ewma_den"))
    dev = x - ewma
    return staged.select(
        *df.columns,
        ewma.alias("ewma"),
        dev.alias("deviation"),
        F.coalesce(F.abs(dev) > threshold, F.lit(False)).alias("is_anomaly"),
    )
