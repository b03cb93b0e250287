"""Table profiling: the per-column data card (null counts, cardinality,
value range) a corpus release ships with.

No counterpart in the reference (kafka-flow never inspects schemas —
SURVEY.md §1.2: values are opaque bytes); this is pipeline-observability
surface for the curation chain.

Scale shape: one aggregate LEG PER COLUMN, unioned — deliberately not a
single Expand-based multi-distinct pass, because each leg's scan prunes to
exactly one parquet column (ReadSchema shows a single field), so the total
I/O equals one full-width scan while each task stays narrow and
map-combinable.  Exact distinct counts are the audit-grade default; swap
``approx=True`` for HLL sketches when the profile is advisory and the table
is wide."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per column: (column, n_rows, n_nonnull, n_distinct,
    min_value, max_value) — min/max computed on the native type, then cast
    to string for a uniform schema (so numeric ranges are numeric, not
    lexicographic)."""
    cols = df.columns if cols is None else cols
    if not cols:
        raise ValueError("no columns to profile")
    distinct_of = (
        (lambda c: F.approx_count_distinct(c).alias("n_distinct"))
        if approx
        else (lambda c: F.count_distinct(F.col(c)).alias("n_distinct"))
    )
    legs = [
        df.select(F.col(c)).agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col(c)).alias("n_nonnull"),
            distinct_of(c),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        )
        for c in cols
    ]
    return reduce(DataFrame.unionByName, legs)


def equiwidth_histogram(
    df,
    value_col: str,
    group_cols: list[str] | None = None,
    n_buckets: int = 20,
    bounds: tuple | None = None,
) -> "DataFrame":
    """Equi-width histogram of ``value_col`` (optionally per group):
    (group..., bucket, lo, hi, n) for the ``n_buckets`` equal slices of
    [min, max], the max value folded into the last bucket.

    Equi-WIDTH rather than equi-depth on purpose: bucket assignment is
    ``floor((x - lo) · n / span)`` — exact integer-and-double arithmetic
    both engines reproduce bit-identically — while equi-depth boundaries
    ride interpolated quantiles whose engine-specific interpolation breaks
    oracle parity (the same reason the HLL query is rows-only).

    Scale shape: one bounds aggregate (or pass ``bounds`` from table stats)
    + one map-combinable groupBy over at most |groups|·n_buckets cells.
    """
    from pyspark.sql import functions as F

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    group_cols = group_cols or []
    if bounds is None:
        row = df.agg(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).collect()[0]
        if row["lo"] is None:
            raise ValueError(f"equiwidth_histogram: {value_col!r} is empty/all-null")
        bounds = (float(row["lo"]), float(row["hi"]))
    lo, hi = bounds
    span = hi - lo
    if span <= 0:
        bucket = F.lit(0)
    else:
        # clamp BOTH ends: caller-supplied bounds narrower than the data
        # (stale table stats) fold low outliers into bucket 0 and high ones
        # into the last bucket, instead of emitting a negative bucket id on
        # one side while silently folding the other.
        bucket = F.greatest(
            F.lit(0),
            F.least(
                F.floor(
                    (F.col(value_col) - F.lit(lo)) * F.lit(float(n_buckets)) / F.lit(span)
                ).cast("int"),
                F.lit(n_buckets - 1),
            ),
        )
    width = span / n_buckets if span > 0 else 0.0
    return (
        df.groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            *group_cols,
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
    )


def exact_percentiles_disc(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5,),
) -> DataFrame:
    """EXACT discrete percentiles per group without sorting rows — the
    data-card quantile that must be reproducible (approx_percentile's
    interpolation and sketch internals are engine-specific; an exact order
    statistic of integers is not).

    Semantics: percentile_disc — the smallest value v in the group with
    cume_count(v) >= ceil(q * n).  Deterministic for any orderable column;
    bit-reproducible cross-engine for integers/strings (no interpolation).

    Scale shape: one map-combinable ``groupBy(group, value).count()``
    collapses row volume to VALUE CARDINALITY, then one window per group
    ordered by value runs over the distinct values only — a group with 10^9
    rows but 10^4 distinct lengths sorts 10^4 rows, not 10^9.  This is the
    counting-sort trade: right when cardinality << rows (lengths, scores,
    ratings); for a continuous double column bucket first
    (``equiwidth_histogram``) or accept a row sort.

    Output: group_cols + (n_rows, p_<q> per q).
    """
    from pyspark.sql import Window

    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs}")
    counts = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    cum = counts.withColumn(
        "_cum", F.sum("_c").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("_n", F.sum("_c").over(Window.partitionBy(*group_cols)))
    aggs = [F.max("_n").alias("n_rows")]
    for q in qs:
        tag = str(int(round(q * 100)))
        # smallest value whose cumulative count reaches ceil(q*n), decided in
        # EXACT integer arithmetic: q is taken at its decimal face value
        # (Fraction("0.07") = 7/100), and  _cum >= q*n  <=>  _cum*den >= num*n
        # on bigints.  This replaces the former double-product 1e-9 nudge,
        # whose absolute epsilon stopped covering ulp(q*n) once q*n exceeded
        # ~8.4e6 rows per group (review r6) — the skipped-order-statistic bug
        # would have returned at exactly the scale this operator targets.
        # The DuckDB oracles mirror the same integer predicate.
        from fractions import Fraction

        frac = Fraction(str(q))
        num, den = frac.numerator, frac.denominator
        hit = F.when(
            F.col("_cum") * F.lit(den) >= F.lit(num) * F.col("_n"),
            F.col(value_col),
        )
        aggs.append(F.min(hit).alias(f"p_{tag}"))
    return cum.groupBy(*group_cols).agg(*aggs)


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    ks: tuple[int, ...] = (100, 1000, 10000),
) -> DataFrame:
    """Token-mass coverage of the top-k frequency vocabulary — the
    tokenizer-sizing curve: what fraction of all token occurrences in the
    corpus would a vocabulary of the k most frequent (normalized) words
    cover?  One row per requested k: (k, n_types, covered_tokens,
    total_tokens, coverage), with n_types = min(k, |vocab|), ranking by
    (count DESC, word ASC) so ties are deterministic, and ``coverage`` a
    single exact-integer IEEE division (engine-reproducible).

    Scale shape: one map-combinable vocabulary aggregate, one TakeOrdered
    top-max(k) (never a global sort), a cumulative-sum window over AT MOST
    max(k) rows (bounded by the caller, guarded below — never corpus-sized),
    a tiny theta-join of that against the k list, and a broadcast single-row
    total.  The corpus-sized relations are touched exactly twice (vocab
    aggregate + total count), both map-combinable scans.
    """
    from pyspark.sql.window import Window

    from kafka_flow_spark.operators.text import normalize_text, tokens

    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be non-empty positive ints, got {ks}")
    max_k = max(ks)
    if max_k > 1_000_000:
        raise ValueError(
            f"max(ks)={max_k} > 1e6: the cumulative window is sized by max(ks); "
            "a vocabulary curve beyond 1M types needs a partitioned variant"
        )
    words = (
        df.filter(F.length(F.trim(text_col)) > 0)
        .select(F.explode(tokens(normalize_text(text_col))).alias("_w"))
        .filter(F.col("_w") != "")
    )
    uni = words.groupBy("_w").agg(F.count("*").alias("_cw"))
    tot = words.agg(F.count("*").alias("_total"))
    ranked = (
        uni.orderBy(F.desc("_cw"), F.asc("_w"))
        .limit(max_k)
        .withColumn(
            "_rk",
            F.row_number().over(Window.orderBy(F.desc("_cw"), F.asc("_w"))),
        )
        .withColumn(
            "_cum",
            F.sum("_cw").over(
                Window.orderBy("_rk").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    ks_df = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(k)) for k in sorted(set(ks))])).alias("k")
    )
    return (
        ks_df.join(ranked, F.col("_rk") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_types"),
            F.max("_cum").alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_types",
            "covered_tokens",
            F.col("_total").alias("total_tokens"),
            (
                F.col("covered_tokens").cast("double")
                / F.col("_total").cast("double")
            ).alias("coverage"),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 3,
) -> DataFrame:
    """Robust per-group outlier flagging: rows where
    |value - median| > k * MAD (median absolute deviation).

    ``value_col`` must be integer-typed (convert money/doubles with
    functions.cents first): both order statistics then come from
    ``exact_percentiles_disc`` — counting-sort over value cardinality, exact
    and engine-reproducible — and the comparison |v - med| > k*mad is pure
    bigint arithmetic.  Robust-z via MAD is the standard outlier rule where
    mean/stddev are themselves distorted by the outliers being hunted.

    Scale shape: two counting-sort percentile passes (each map-combinable
    groupBy + a window over DISTINCT values) and two broadcast joins of the
    per-group stats (one row per group — group cardinality must be broadcast
    material, the same contract every per-group-stats join here carries).
    Rows flow through ONE filter; no row-volume window, no driver state.

    Output: the input rows (minus internals) + med, abs_dev, mad, filtered
    to outliers only.  Groups with MAD = 0 (majority-constant values) flag
    every row off the median — the textbook MAD degenerate case; pre-filter
    or raise k if that is unwanted.
    """
    med = exact_percentiles_disc(df, value_col, group_cols, (0.5,)).select(
        *group_cols, F.col("p_50").alias("med")
    )
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "abs_dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = exact_percentiles_disc(dev, "abs_dev", group_cols, (0.5,)).select(
        *group_cols, F.col("p_50").alias("mad")
    )
    return dev.join(F.broadcast(mad), group_cols).where(
        F.col("abs_dev") > F.lit(int(k)) * F.col("mad")
    )


def histogram_emd(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    group_cols: list[str],
    bin_width: int,
) -> DataFrame:
    """Per-group 1-Wasserstein (earth-mover) distance between two samples'
    value distributions, computed on a shared equi-width integer binning —
    the standard drift metric between data snapshots (train-vs-serve,
    week-over-week) with an actual unit: "average cents each probability
    mass unit must move".

    EMD over binned data = Σ_boundaries |CDF_a - CDF_b| · bin_width.  Every
    intermediate here is EXACT bigint: counts, cumulative sums, the
    common-denominator |cum_a·n_b - cum_b·n_a|, and the gap-span multiplier
    (sparse histograms contribute |ΔCDF| · gap for empty bin runs).  The
    final rescale to a float is three deterministic IEEE ops.

    ``value_col`` must be integer (cents-convert first).  Scale shape: two
    map-combinable histogram aggregates collapse row volume to BIN
    cardinality; the window + final agg run over distinct bins only.

    Output: group_cols + (n_a, n_b, emd_num, emd) where
    emd = bin_width · emd_num / (n_a · n_b).
    """
    from pyspark.sql import Window

    def hist(df: DataFrame, cname: str) -> DataFrame:
        # FLOOR division, not `div` (which truncates toward zero and would
        # give bin 0 double width across negative values — review r6): the
        # pmod form (v - ((v % w + w) % w)) div w is exact bigint floor-div
        # and DuckDB mirrors it verbatim.
        fd = F.expr(
            f"({value_col} - (({value_col} % {bin_width} + {bin_width})"
            f" % {bin_width})) div {bin_width}"
        )
        return (
            df.withColumn("_bin", fd)
            .groupBy(*group_cols, "_bin")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    h = (
        hist(df_a, "_ca")
        .join(hist(df_b, "_cb"), [*group_cols, "_bin"], "full")
        .fillna(0, subset=["_ca", "_cb"])
    )
    return emd_from_counts(h, group_cols, bin_width)


def emd_from_counts(
    h: DataFrame, group_cols: list[str], bin_width: int
) -> DataFrame:
    """EMD core over a pre-joined per-group bin-count relation
    (group_cols + _bin + _ca + _cb) — shared by ``histogram_emd`` (two
    DataFrames, one full join) and ``windowed_drift`` (streaming windowed
    histogram vs a reference).  Extra zero-count bins are harmless: they
    leave both CDFs flat, and subdividing a gap span changes nothing.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("_bin")
    wp = Window.partitionBy(*group_cols)
    cum = h.select(
        *group_cols,
        "_bin",
        F.sum("_ca").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_cuma"),
        F.sum("_cb").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_cumb"),
        F.sum("_ca").over(wp).alias("_na"),
        F.sum("_cb").over(wp).alias("_nb"),
        (F.coalesce(F.lead("_bin").over(w), F.col("_bin")) - F.col("_bin")).alias(
            "_span"
        ),
    )
    out = cum.groupBy(*group_cols).agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.sum(
            F.abs(F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na"))
            * F.col("_span")
        ).alias("emd_num"),
    )
    # a group entirely absent from one sample has no defined drift -> NULL
    # (ANSI mode: plain / throws on the zero denominator)
    return out.withColumn(
        "emd",
        F.try_divide(
            F.lit(float(bin_width)) * F.col("emd_num").cast("double"),
            (F.col("n_a") * F.col("n_b")).cast("double"),
        ),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` into its group's
    [p_lo, p_hi] discrete-percentile band — the standard robust
    preprocessing step before means/regressions that MAD flagging
    (``mad_outliers``) diagnoses.

    Both cut points are exact order statistics (``exact_percentiles_disc``:
    integer-predicate counting sort — engine-reproducible, no
    interpolation), broadcast-joined back per group; the clamp is one
    map-side ``least/greatest``.  ``value_col`` must be integer-typed
    (cents-convert first), and group cardinality must be broadcast material
    (the same per-group-stats contract as mad_outliers).

    Output: input columns + (p_lo, p_hi, value_w) with value_w clamped.
    """
    if not 0.0 < lo < hi <= 1.0:
        raise ValueError(f"need 0 < lo < hi <= 1, got {lo}, {hi}")
    cuts = exact_percentiles_disc(df, value_col, group_cols, (lo, hi))
    lo_tag = f"p_{int(round(lo * 100))}"
    hi_tag = f"p_{int(round(hi * 100))}"
    cut2 = cuts.select(
        *group_cols, F.col(lo_tag).alias("p_lo"), F.col(hi_tag).alias("p_hi")
    )
    return df.join(F.broadcast(cut2), group_cols).withColumn(
        "value_w",
        F.greatest(F.col("p_lo"), F.least(F.col("p_hi"), F.col(value_col))),
    )


def floor_bin_expr(value_col: str, bin_width: int):
    """Exact bigint floor-division bin id (pmod form — see histogram_emd)."""
    return F.expr(
        f"({value_col} - (({value_col} % {bin_width} + {bin_width})"
        f" % {bin_width})) div {bin_width}"
    )


def windowed_histogram(
    records: DataFrame,
    ts_col: str,
    value_col: str,
    bin_width: int,
    duration: str = "1 hour",
    group_cols: list[str] | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-event-time-window equi-width histogram — the mergeable state
    behind streaming drift monitoring (bin counts are counters, so this
    drops straight into a watermarked windowed aggregate, exactly like
    ``sketches.windowed_cms``).  Works identically on batch and streaming
    inputs; streaming state is one row per (window, group, bin).

    Output: (window_start, window_end, *group_cols, _bin, n).
    """
    group_cols = group_cols or []
    cells = records.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        *group_cols,
        floor_bin_expr(value_col, bin_width).alias("_bin"),
    )
    agged = cells.groupBy(
        F.window(ts_col, duration).alias("w"), *group_cols, "_bin"
    ).agg(F.count(F.lit(1)).alias("n"))
    return agged.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *group_cols,
        "_bin",
        "n",
    )


def windowed_drift(
    window_hist: DataFrame,
    reference_hist: DataFrame,
    bin_width: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-window EMD of each emitted window's histogram against a REFERENCE
    histogram — the serve-time drift monitor: windows whose value
    distribution has moved off the (training-time) reference surface
    ordered by a number with a unit.

    ``window_hist`` is ``windowed_histogram`` output (batch, or the emitted
    rows of its streaming query); ``reference_hist`` is (group_cols?, _bin,
    n).  The reference is expanded across the window universe (broadcast —
    a reference histogram is bin-bounded by construction) and the exact
    bigint EMD core (``emd_from_counts``) runs per (window, group).
    """
    group_cols = group_cols or []
    keys = ["window_start", "window_end", *group_cols]
    wins = window_hist.select(*keys).distinct()
    ref = reference_hist.select(*group_cols, "_bin", F.col("n").alias("_cb"))
    refk = (
        wins.join(F.broadcast(ref), group_cols)
        if group_cols
        else wins.crossJoin(F.broadcast(ref))
    )
    wh = window_hist.select(*keys, "_bin", F.col("n").alias("_ca"))
    h = wh.join(refk, [*keys, "_bin"], "full").fillna(0, subset=["_ca", "_cb"])
    return emd_from_counts(h, keys, bin_width)


def histogram_psi(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    group_cols: list[str],
    bin_width: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group Population Stability Index between two samples over the
    shared equi-width integer binning — the model-monitoring drift metric
    next to ``histogram_emd``'s transport distance:

        PSI = Σ_bins (p'_b − q'_b) · ln(p'_b / q'_b)

    with add-one-smoothed proportions p' = (c_a+1)/(n_a+B), q' =
    (c_b+1)/(n_b+B) over the group's B observed bins (smoothing makes
    empty-on-one-side bins finite — the standard industry convention; PSI
    > 0.2 is the usual "investigate" bar).

    Determinism contract (the DSIR pattern): every count is bigint; each
    bin's term is (exact-bigint numerator / exact-bigint denominator) ·
    ln(exact ratio of bigints), rounded to a scaled bigint micro-unit —
    per-bin integers sum order-independently, so Spark and DuckDB agree
    bit-for-bit given the shared ln contract (tests/test_selection.py pins
    ln on real data).

    Scale shape: identical to histogram_emd — two map-combinable histogram
    aggregates collapse row volume to bin cardinality; the smoothing
    window + final agg run over distinct bins only.

    Output: group_cols + (n_a, n_b, n_bins, psi_micro) — PSI × 1e6 as
    bigint; groups empty on either side surface NULL.
    """
    from pyspark.sql import Window

    def hist(df: DataFrame, cname: str) -> DataFrame:
        fd = F.expr(
            f"({value_col} - (({value_col} % {bin_width} + {bin_width})"
            f" % {bin_width})) div {bin_width}"
        )
        return (
            df.withColumn("_bin", fd)
            .groupBy(*group_cols, "_bin")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    h = (
        hist(df_a, "_ca")
        .join(hist(df_b, "_cb"), [*group_cols, "_bin"], "full")
        .fillna(0, subset=["_ca", "_cb"])
    )
    wp = Window.partitionBy(*group_cols)
    t = h.select(
        *group_cols,
        "_ca",
        "_cb",
        F.sum("_ca").over(wp).alias("_na"),
        F.sum("_cb").over(wp).alias("_nb"),
        F.count(F.lit(1)).over(wp).alias("_nbins"),
    )
    pa = (F.col("_ca") + 1) * (F.col("_nb") + F.col("_nbins"))
    qb = (F.col("_cb") + 1) * (F.col("_na") + F.col("_nbins"))
    den = (F.col("_na") + F.col("_nbins")) * (F.col("_nb") + F.col("_nbins"))
    term = (
        F.round(
            ((pa - qb).cast("double") / den.cast("double"))
            * F.log(pa.cast("double") / qb.cast("double"))
            * F.lit(int(scale))
        ).cast("long")
    )
    out = t.groupBy(*group_cols).agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max("_nbins").alias("n_bins"),
        F.sum(term).alias("_psi"),
    )
    return out.withColumn(
        "psi_micro",
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("_psi")),
    ).drop("_psi")


def group_corr(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Pearson correlation over INTEGER series, exact-moment form.

    ``F.corr``/DuckDB ``corr`` stream doubles in engine-specific orders —
    un-oracle-able.  Here the five moments (n, Σx, Σy, Σxy, Σx², Σy²) are
    EXACT: per-row products stay inside bigint (caller contract: |x·y| <
    2^63 — cents × quantity at any group size qualifies), per-group sums
    ride DECIMAL(38,0) so no scale of group can overflow (the registry's
    decimal-sum discipline).  The final

        corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

    is evaluated in doubles from the decimal moments: both engines convert
    the identical exact decimal to the identical nearest double, and the
    expression tree is mirrored verbatim, so ROUND(corr, 6) is engine-exact
    (generic transcendental class — cross-engine determinism notes).

    Degenerate groups (either variance 0, or n < 2) surface corr NULL.

    Scale shape: ONE map-side-combinable aggregate — no window, no second
    scan, group-cardinality output.  Output: (key, n_points, corr).
    """
    d38 = "decimal(38,0)"
    pts = df.select(
        F.col(key_col),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    m = pts.groupBy(key_col).agg(
        F.count(F.lit(1)).cast(d38).alias("_n"),
        F.sum(F.col("_x").cast(d38)).alias("_sx"),
        F.sum(F.col("_y").cast(d38)).alias("_sy"),
        F.sum((F.col("_x") * F.col("_y")).cast(d38)).alias("_sxy"),
        F.sum((F.col("_x") * F.col("_x")).cast(d38)).alias("_sxx"),
        F.sum((F.col("_y") * F.col("_y")).cast(d38)).alias("_syy"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    corr = F.when(
        (F.col("_n") >= 2) & (varx > 0) & (vary > 0),
        (n * sxy - sx * sy) / F.sqrt(varx * vary),
    )
    return m.select(
        F.col(key_col),
        F.col("_n").cast("long").alias("n_points"),
        F.round(corr, 6).alias("corr"),
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    time_col: str,
    count_col: str,
) -> DataFrame:
    """Per-key CUSUM changepoint over a pre-aggregated count series — where
    did the level of a metric shift?  (Page's cumulative-sum statistic; the
    drift family's TEMPORAL member next to PSI/EMD's distributional ones.)

    For the series c_1..c_D (ordered by ``time_col``) the centered CUSUM is
    S_k = Σ_{i≤k} (c_i − mean).  Scaling by D keeps it integer-exact:

        S'_k = D · cum_k − k · T      (T = Σ c_i, all bigint)

    The changepoint is the time with max |S'_k| (ties → earliest time): the
    split point that best separates the series into two level regimes.
    ``time_col`` must be an integer bucket (epoch day/hour — what a count
    series is keyed by anyway); the tie-break negates it inside max_by.

    Scale shape: input is already count-cardinality (one row per key ×
    bucket); one exchange on the key feeds the totals aggregate + the
    running-sum window (subset-clustering reuse), then one max_by.  Output:
    (key, n_buckets, total, cp_time, cusum_scaled).
    """
    from pyspark.sql.window import Window

    tot = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_d"), F.sum(count_col).cast("long").alias("_t")
    )
    w = Window.partitionBy(key_col).orderBy(time_col)
    ranked = df.join(tot, key_col).select(
        F.col(key_col),
        F.col(time_col),
        F.col("_d"),
        F.col("_t"),
        F.row_number().over(w).alias("_k"),
        F.sum(F.col(count_col).cast("long")).over(w).alias("_cum"),
    )
    scored = ranked.select(
        F.col(key_col),
        F.col(time_col),
        "_d",
        "_t",
        (F.col("_d") * F.col("_cum") - F.col("_k") * F.col("_t")).alias("_s"),
    )
    return scored.groupBy(key_col).agg(
        F.max("_d").cast("long").alias("n_buckets"),
        F.max("_t").alias("total"),
        F.max_by(
            F.col(time_col),
            F.struct(
                F.abs(F.col("_s")).alias("_a"),
                (-F.col(time_col).cast("long")).alias("_nt"),
            ),
        ).alias("cp_time"),
        F.max(F.abs(F.col("_s"))).alias("cusum_scaled"),
    )


def key_skew_report(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Shuffle-skew diagnosis for a prospective join/agg key: per-key row
    counts reduced to the numbers an engineer needs before shipping a job —
    the hottest ``top_k`` keys plus global shape stats on every row.

        skew_ppm = max_key_count · n_keys · 1e6 div n_rows

    (1e6 = perfectly uniform; a key holding 10% of a 1M-key table reads
    ~1e11).  All-integer arithmetic, oracle-exact; the product is carried
    in DECIMAL(38,0) — a 1e9-key table with a 1e5-row hot key puts
    max_key_count·n_keys·1e6 at ~1e20, past int64, and ANSI mode would
    throw at exactly the diagnostic scale this exists for (ADVICE r7).
    The final div result is cast back to BIGINT (a ratio, always small).

    Scale shape: one map-combinable groupBy(key) count, one scalar
    aggregate, and an ``orderBy().limit(top_k)`` that compiles to
    TakeOrderedAndProject (bounded-k at the driver — no global sort, no
    single-partition window).  The rank window then runs over ≤ top_k rows.
    Output: (rank, key, key_count, n_rows, n_keys, max_key_count, skew_ppm).
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("key_count")
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("key_count").cast("long").alias("n_rows"),
        F.max("key_count").alias("max_key_count"),
    )
    top = counts.orderBy(F.desc("key_count"), F.asc("key")).limit(top_k)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("key_count"), F.asc("key"))),
    )
    return ranked.crossJoin(F.broadcast(stats)).select(
        F.col("rank").cast("int").alias("rank"),
        "key",
        "key_count",
        "n_rows",
        "n_keys",
        "max_key_count",
        F.expr(
            "cast(cast(max_key_count as decimal(38,0)) * n_keys * 1000000"
            " div n_rows as bigint)"
        ).alias("skew_ppm"),
    )


def seasonal_residuals(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    count_col: str,
    period: int = 7,
) -> DataFrame:
    """Seasonal-baseline residuals of a count series: how far is each
    bucket's count from its key's SAME-PHASE mean (phase = bucket mod
    period; period 7 over daily buckets = day-of-week seasonality — the
    volume-anomaly check that doesn't false-alarm every weekend).

    Exact integer contract: with m buckets and total t per (key, phase),

        resid_scaled = c · m_phase − t_phase

    (count minus phase-mean, scaled by the phase's bucket count) — bigint,
    engine-identical.  Output: one row per input bucket with (phase,
    n_phase, phase_total, resid_scaled); callers threshold or rank (the
    registered query keeps the top-3 |resid| per key via WindowGroupLimit).

    Scale shape: input is count-cardinality; one exchange on (key, phase)
    feeds a map-combinable totals aggregate joined back — no windows over
    raw events.
    """
    from pyspark.sql import functions as F

    phase = (
        (F.col(bucket_col) % period + period) % period
    )  # pmod: negative buckets fold correctly (cross-engine floor-div note)
    base = df.select(
        F.col(key_col),
        F.col(bucket_col),
        F.col(count_col).cast("long").alias("_c"),
        phase.cast("long").alias("phase"),
    )
    tot = base.groupBy(key_col, "phase").agg(
        F.count(F.lit(1)).alias("n_phase"),
        F.sum("_c").alias("phase_total"),
    )
    return base.join(tot, [key_col, "phase"]).select(
        key_col,
        bucket_col,
        F.col("_c").alias(count_col),
        "phase",
        "n_phase",
        "phase_total",
        (F.col("_c") * F.col("n_phase") - F.col("phase_total")).alias(
            "resid_scaled"
        ),
    )


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    vec_col: str,
    group_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """EXACT per-group centroid drift between two embedding snapshots — the
    vector-space member of the drift family (EMD/PSI/windowed cover scalar
    columns; an embedding model swap or encoder regression moves CENTROIDS,
    which none of those see).

    Contract (the FLOOR-e6 + common-denominator discipline): each component
    quantizes to ``FLOOR(x·scale)`` bigint; with per-(group, dim) sums s and
    group counts n,

        drift_l1_scaled = Σ_d | s_old_d · n_new − s_new_d · n_old |

    — the L1 centroid shift under the common denominator n_old·n_new, so
    there is no division anywhere and the number is engine-identical.
    Callers recover the mean per-dim shift as drift / (n_old·n_new·dims·
    scale).  The Σ products are carried in DECIMAL(38,0) (bigint saturates
    around n≈1e7 per group at scale 1e6 — the key-skew lesson); the final
    value is cast to BIGINT after the sum (bounded by dims·max-product).

    Scale shape: one posexplode per side (dims× row fan-out, map-side) into
    ONE map-combinable groupBy(group, dim) sum — (groups·dims)-cardinality
    relations from there on; counts ride a separate group-cardinality
    aggregate; one (group, dim) equi-join, one final group aggregate.
    Groups present on only one side are dropped (inner join — report
    appearance/disappearance with table_diff, not a centroid).

    Output: (group_col, n_old, n_new, drift_l1_scaled).
    """
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")

    def sums(df: DataFrame, tag: str) -> tuple[DataFrame, DataFrame]:
        q = F.floor(F.col("x").cast("double") * F.lit(float(scale))).cast("long")
        s = (
            df.select(F.col(group_col).alias("g"), F.posexplode(F.col(vec_col)).alias("d", "x"))
            .select("g", "d", q.alias("q"))
            .groupBy("g", "d")
            .agg(F.sum("q").alias(f"s_{tag}"))
        )
        n = df.groupBy(F.col(group_col).alias("g")).agg(
            F.count(F.lit(1)).alias(f"n_{tag}")
        )
        return s, n

    s_old, n_old = sums(old, "old")
    s_new, n_new = sums(new, "new")
    term = F.abs(
        F.col("s_old").cast("decimal(38,0)") * F.col("n_new")
        - F.col("s_new").cast("decimal(38,0)") * F.col("n_old")
    )
    return (
        s_old.join(s_new, ["g", "d"])
        .join(F.broadcast(n_old), "g")
        .join(F.broadcast(n_new), "g")
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.max("n_old").cast("long").alias("n_old"),
            F.max("n_new").cast("long").alias("n_new"),
            F.sum(term).cast("long").alias("drift_l1_scaled"),
        )
    )


# --- referential-integrity audit ---------------------------------------------


def fk_integrity_report(
    fact: DataFrame,
    dim: DataFrame,
    fk_col: str,
    pk_col: str,
) -> DataFrame:
    """ONE-row referential-integrity audit of a fact→dim key — the check a
    100 TB pipeline runs BEFORE a join ships garbage: an inner join silently
    DROPS orphan fact rows and a duplicated dim pk silently MULTIPLIES
    them, and neither failure is visible in the join's own output.

    Output: (n_fact, n_null_fk, n_orphans, orphan_rate_e6, n_dim,
    n_dup_pk_values, n_dup_pk_rows) — orphans are non-null fks with no dim
    match; dup columns count pk values with >1 dim row and the total rows
    in such groups (join multiplication factor = n_dup_pk_rows rows landing
    where n_dup_pk_values were expected).

    Scale shape: one left-anti join on the key (Catalyst broadcasts the dim
    side when it fits, exactly as the production join would) + one
    map-combinable dim aggregate + two global aggregates.  The rate is a
    truncating e6 division in DECIMAL(38,0) (row counts × 1e6 pass int64
    past ~9e12 rows — the kappa class).
    """
    fk, pk = F.col(fk_col), F.col(pk_col)
    fact_stats = fact.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.when(fk.isNull(), 1).otherwise(0)).cast("long").alias("n_null_fk"),
    )
    orphans = (
        fact.where(fk.isNotNull())
        .join(dim.select(pk.alias(fk_col)), [fk_col], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    dim_stats = (
        dim.groupBy(pk.alias("_pk"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.count(F.lit(1)).alias("n_dim"),
            F.sum(F.when(F.col("_c") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_pk_values"),
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0))
            .cast("long")
            .alias("n_dup_pk_rows"),
        )
    )
    return (
        fact_stats.crossJoin(orphans)
        .crossJoin(dim_stats)
        .select(
            "n_fact",
            "n_null_fk",
            "n_orphans",
            F.expr(
                "CAST(n_orphans AS decimal(38,0)) * 1000000"
                " div CAST(n_fact AS decimal(38,0))"
            ).alias("orphan_rate_e6"),
            "n_dim",
            "n_dup_pk_values",
            "n_dup_pk_rows",
        )
    )


def event_order_audit(
    events: DataFrame,
    key_col: str,
    seq_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-key event-time ordering audit: within each key, ordered by the
    SEQUENCE column (offset / event id — the transport order), how often
    does the embedded timestamp step BACKWARDS, and by how much?  The
    out-of-orderness number that sizes a watermark: `withWatermark(delay)`
    drops events later than the delay, so `max_backstep_us` IS the minimum
    safe delay and `n_backwards / n` the damage of choosing less.

    Exact integers: timestamps compare as epoch microseconds
    (``unix_micros`` here, ``epoch_us`` in the DuckDB mirror).  Output one
    row per key: (key, n_events, n_backwards, max_backstep_us,
    backwards_rate_e6).  Keys with one event report zeros.

    Scale shape: ONE window exchange on the key (the sessionization class)
    + one map-combinable aggregate.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(seq_col)
    # NTZ-tolerant: the events table reads as TIMESTAMP_NTZ on Spark 4 and
    # unix_micros requires TIMESTAMP; the session tz is pinned UTC
    # (kafka_flow_spark.session), so the cast reinterprets the same
    # wall-clock instant DuckDB's epoch_us reads — bit-identical µs.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    step = us - F.lag(us).over(w)
    flagged = events.select(
        F.col(key_col),
        F.when(step < 0, 1).otherwise(0).alias("_back"),
        F.when(step < 0, -step).otherwise(0).cast("long").alias("_mag"),
    )
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("_back").cast("long").alias("n_backwards"),
        F.max("_mag").alias("max_backstep_us"),
        F.expr(
            "CAST(sum(_back) AS decimal(38,0)) * 1000000"
            " div CAST(count(1) AS decimal(38,0))"
        ).alias("backwards_rate_e6"),
    )
