"""Incremental aggregate maintenance: algebraic agg state + merge.

The 100 TB refresh pattern: a materialized per-group aggregate is kept as a
STATE table (one row per group holding the algebraic partials: count, exact
unscaled sums, min, max); when a delta shard arrives, the new state is
``merge(old_state, state(delta))`` — an aggregate over (groups + delta), not
a recompute over the fact history.  Cost scales with |delta| + |groups|,
never with the accumulated fact volume.

Exactness: money sums ride the repo's unscaled-LONG cents representation
(functions.cents), so partial sums are associative/commutative integer adds
— merge order and partitioning cannot change a single bit, which is what
makes the incremental result provably equal to a full recompute (pinned by
q_incremental_agg's full-recompute oracle and a differential test).

This generalizes the engine's own execution design (Spark's partial
aggregation IS state+merge within one job) to state that persists BETWEEN
jobs.  Reference relation: the closest reference concept is the persisted
per-key fold state (core/.../snapshot/SnapshotFold.scala) — same algebra,
relational groups instead of Kafka keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flow_spark.functions import cents, unscaled

# the state columns agg_state appends; key inference is membership in this
# exact set (NOT a name-prefix rule, which would silently eat a user
# grouping key that happens to start with an underscore)
STATE_COLS = ("_n", "_sum_c", "_min", "_max")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Algebraic aggregate state of ``value_col`` per key group:
    (keys..., _n, _sum_c, _min, _max) — ``_sum_c`` is the exact unscaled-cents
    long sum, so states merge bit-stably in any order."""
    clash = set(keys) & set(STATE_COLS)
    if clash:
        raise ValueError(f"grouping keys collide with state columns: {clash}")
    return df.groupBy(*keys).agg(
        F.count("*").alias("_n"),
        F.sum(cents(value_col)).alias("_sum_c"),
        F.min(value_col).alias("_min"),
        F.max(value_col).alias("_max"),
    )


def agg_merge(*states: DataFrame) -> DataFrame:
    """Merge any number of state tables into one (same schema in/out).

    One union + one map-combinable aggregate over group-cardinality rows —
    the refresh step.  Associative and commutative by construction (integer
    sum / min / max), so daily shards can merge in any order or tree shape.
    """
    if not states:
        raise ValueError("agg_merge needs at least one state table")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in STATE_COLS]
    return out.groupBy(*keys).agg(
        F.sum("_n").alias("_n"),
        F.sum("_sum_c").alias("_sum_c"),
        F.min("_min").alias("_min"),
        F.max("_max").alias("_max"),
    )


def agg_result(state: DataFrame, frac_digits: int = 2) -> DataFrame:
    """Finalize a state table into the user-facing aggregate:
    (keys..., n_rows, sum_v, avg_v, min_v, max_v) — sum/avg rescaled from the
    exact unscaled partials exactly as a direct DECIMAL aggregate would."""
    keys = [c for c in state.columns if c not in STATE_COLS]
    sum_v = unscaled(F.col("_sum_c"), frac_digits)
    return state.select(
        *keys,
        F.col("_n").alias("n_rows"),
        sum_v.alias("sum_v"),
        (sum_v / F.col("_n").cast("double")).alias("avg_v"),
        F.col("_min").alias("min_v"),
        F.col("_max").alias("max_v"),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed snapshot diff — the CDC primitive between two versions of a
    table: one row per key present in either side, classified
    ``added`` / ``deleted`` / ``changed`` / ``unchanged``, with the sorted
    list of columns whose values differ (NULL-aware: NULL vs value is a
    change, NULL vs NULL is not — the <=> semantics).

    Scale shape: ONE full-outer equi-join on the key (both sides hash on it;
    AQE handles skewed keys), all comparisons are map-side projections.
    Feed ``status != 'unchanged'`` to a writer for incremental downstream
    refresh, or aggregate by status for a drift report.

    Output: key_cols + (status, changed_cols).
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_cols]
    missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from a side: {missing}")
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in key_cols
        ],
        status.alias("status"),
        F.when(
            F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull(), changed
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )


def changeset(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Value-bearing CDC delta — ``table_diff`` names WHAT changed; this
    carries the payload a downstream MERGE needs: one row per
    added/changed/deleted key with the NEW values (NULL for deletes).

    Same plan shape as ``table_diff`` (ONE full-outer key join, map-side
    NULL-aware compares); the two share change semantics by construction
    (<=> on every compare column).

    Output: key_cols + compare_cols (new values) + status.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_cols]
    if not compare_cols:
        raise ValueError(
            "changeset needs at least one compare column — a key-only delta "
            "has no values to carry (use table_diff for presence-only diffs)"
        )
    missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from a side: {missing}")
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    any_change = None
    for c in compare_cols:
        ne = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        any_change = ne if any_change is None else (any_change | ne)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in key_cols
            ],
            *[F.col(f"_n_{c}").alias(c) for c in compare_cols],
            status.alias("status"),
        )
        .where(F.col("status") != "unchanged")
    )


def agg_maintain(
    state: DataFrame,
    old: DataFrame,
    changes: DataFrame,
    keys: list[str],
    row_pk: list[str],
    value_col: str,
) -> DataFrame:
    """Roll an ``agg_state`` table forward under a ROW-LEVEL CDC changeset
    with updates and deletes — the retraction half of incremental aggregate
    maintenance (``agg_merge`` handles append-only shards; real CDC feeds
    also retract).

    Retractability splits the state columns:
    - ``_n`` / ``_sum_c`` are group homomorphisms — exact bigint adds, so
      retraction is literal subtraction of the affected rows' OLD
      contributions plus addition of their NEW ones.  No rescan.
    - ``_min`` / ``_max`` are NOT retractable (deleting the current min
      reveals an unknown runner-up), so they are RECOMPUTED — but only for
      the groups the changeset touches, from the new snapshot of exactly
      those groups (one semi-join-restricted scan of ``old`` + the upserts;
      cost scales with the affected groups' row volume, never the table).

    The maintained table provably equals ``agg_state(apply_changeset(old,
    changes), keys, value_col)`` (randomized differential in
    tests/test_incremental.py; q_incremental_agg_maintain's oracle is that
    recompute).  Groups whose rows all disappear drop out; new groups
    appear.  A changed row may MOVE groups — its old contribution retracts
    from the old group and adds to the new one.
    """
    if "status" not in changes.columns:
        raise ValueError("agg_maintain expects a changeset (needs 'status')")
    pks = changes.select(*row_pk).distinct()
    old_rows = old.join(pks, row_pk, "left_semi")
    new_rows = changes.where(F.col("status") != "deleted").drop("status")
    add = agg_state(new_rows, keys, value_col).select(
        *keys,
        F.col("_n").alias("_n_a"),
        F.col("_sum_c").alias("_s_a"),
    )
    ret = agg_state(old_rows, keys, value_col).select(
        *keys,
        F.col("_n").alias("_n_r"),
        F.col("_sum_c").alias("_s_r"),
    )
    delta = add.join(ret, keys, "full_outer").select(
        *keys,
        (F.coalesce("_n_a", F.lit(0)) - F.coalesce("_n_r", F.lit(0))).alias("_dn"),
        (F.coalesce("_s_a", F.lit(0)) - F.coalesce("_s_r", F.lit(0))).alias("_ds"),
    )
    ns = (
        state.join(delta, keys, "full_outer")
        .select(
            *keys,
            (F.coalesce("_n", F.lit(0)) + F.coalesce("_dn", F.lit(0))).alias("_n"),
            (F.coalesce("_sum_c", F.lit(0)) + F.coalesce("_ds", F.lit(0))).alias(
                "_sum_c"
            ),
            F.col("_min").alias("_min_old"),
            F.col("_max").alias("_max_old"),
            F.col("_dn").isNotNull().alias("_touched"),
        )
        .where(F.col("_n") > 0)
    )
    affected = delta.select(*keys)
    # new snapshot of ONLY the affected groups: their surviving old rows
    # (group membership decided by the OLD row) + the changeset's upserts
    survivors = (
        old.join(affected, keys, "left_semi").join(pks, row_pk, "left_anti")
    )
    new_affected = survivors.select(*keys, value_col).unionByName(
        new_rows.join(affected, keys, "left_semi").select(*keys, value_col)
    )
    mm = new_affected.groupBy(*keys).agg(
        F.min(value_col).alias("_min_new"), F.max(value_col).alias("_max_new")
    )
    return ns.join(mm, keys, "left").select(
        *keys,
        "_n",
        "_sum_c",
        F.when(F.col("_touched"), F.col("_min_new"))
        .otherwise(F.col("_min_old"))
        .alias("_min"),
        F.when(F.col("_touched"), F.col("_max_new"))
        .otherwise(F.col("_max_old"))
        .alias("_max"),
    )


def maintain_join_view(
    view_old: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    a_pk: list[str],
    fk: str,
    b_pk: str,
) -> DataFrame:
    """Incrementally maintain a materialized INNER fact⋈dim join view
    ``V = A ⋈_{A.fk = B.pk} B`` from CDC changesets — the delta-join half of
    materialized-view maintenance, completing the incremental family
    (agg_state/agg_merge maintain aggregates; this maintains joins).

    Inputs: the OLD view, both OLD snapshots, and the two ``changeset()``
    deltas (which carry full new rows for adds/changes, NULLs for deletes).
    Exact for any mix of adds/changes/deletes on either side — the
    maintained result provably equals the full recompute
    ``A_new ⋈ B_new`` (randomized differential in
    tests/test_incremental.py; q_incremental_join's oracle IS the
    recompute).

    Construction (inner-join algebra on keyed snapshots):
    - ``untouched``: V_old rows whose A-key is NOT in Δ A and whose fk is
      NOT in Δ B — pass through unjoined.
    - ``part1``: Δ A's upsert rows joined to B_new (= apply(B_old, Δ B)) —
      every view row whose A side changed, including rows that now match a
      B row that changed in the same batch.
    - ``part2``: A_old rows untouched by Δ A whose fk IS in Δ B, joined to
      Δ B's upserts — view rows whose B side changed under an unchanged A
      row.  Deleted B keys contribute nothing (inner semantics: their A
      rows vanish, as they already did from ``untouched``).

    Scale shape (100 TB read): NO full A⋈B shuffle join ever re-runs.  The
    view and fact pass through one scan each with anti/semi joins against
    DELTA-SIZED key sets (broadcastable in the daily case); the only true
    joins are delta-sized on one side.  Cost ~ |V| + |A| + |B| scans +
    O(|Δ|) join work, vs the recompute's full two-sided shuffle.  The B_new
    construction reuses ``apply_changeset`` (|B| + |Δ B|).

    Column contract: view/emitted columns = all of A's + B's non-key
    columns; both changesets must carry every column of their snapshot
    (``changeset`` defaults to exactly that).
    """
    if fk not in a_old.columns:
        raise ValueError(f"fact side has no fk column {fk!r}")
    if b_pk not in b_old.columns:
        raise ValueError(f"dim side has no pk column {b_pk!r}")
    # NO broadcast hints on the delta key sets: a daily delta is usually
    # broadcast material and AQE will pick that join itself from the
    # post-distinct stats, but a backfill delta can be arbitrarily large and
    # a forced broadcast would OOM the driver (the r6-review force-broadcast
    # lesson) — degrading to a shuffled anti/semi join is the correct
    # behavior there.
    a_keys = delta_a.select(*a_pk).distinct()
    b_keys = delta_b.select(b_pk).distinct()
    untouched = view_old.join(a_keys, a_pk, "left_anti").join(
        b_keys.withColumnRenamed(b_pk, fk), [fk], "left_anti"
    )
    b_new = apply_changeset(b_old, delta_b, [b_pk])
    a_upserts = delta_a.where(F.col("status") != "deleted").drop("status")
    part1 = a_upserts.join(b_new, a_upserts[fk] == b_new[b_pk]).drop(b_pk)
    a_unchanged_hit = a_old.join(a_keys, a_pk, "left_anti").join(
        b_keys.withColumnRenamed(b_pk, fk), [fk], "left_semi"
    )
    b_upserts = delta_b.where(F.col("status") != "deleted").drop("status")
    part2 = a_unchanged_hit.join(
        b_upserts, a_unchanged_hit[fk] == b_upserts[b_pk]
    ).drop(b_pk)
    return untouched.unionByName(part1).unionByName(part2)


def apply_changeset(
    old: DataFrame, changes: DataFrame, key_cols: list[str]
) -> DataFrame:
    """MERGE a changeset into a snapshot: delete/overwrite every key present
    in the changeset, insert its added/changed rows — the engine-agnostic
    core of MERGE INTO (WHEN MATCHED UPDATE/DELETE, WHEN NOT MATCHED
    INSERT).  Round-trip law, property-tested:
    ``apply_changeset(old, changeset(old, new), keys) == new`` exactly.

    Scale shape: ONE left-anti key join (untouched rows pass through;
    broadcastable when the daily changeset is small — the common case) plus
    a union with the changeset's upsert rows.  Cost scales with
    |old| + |changes|, never with history.
    """
    if "status" not in changes.columns:
        raise ValueError(
            "apply_changeset expects a changeset (needs a 'status' column) — "
            "got a relation without one; build it with changeset()"
        )
    missing_keys = [k for k in key_cols if k not in changes.columns]
    if missing_keys:
        raise ValueError(f"changeset is missing key columns: {missing_keys}")
    value_cols = [c for c in changes.columns if c != "status"]
    uncovered = [c for c in old.columns if c not in value_cols]
    if uncovered:
        raise ValueError(
            "changeset does not carry every old-snapshot column "
            f"({uncovered} missing) — applying it would silently drop them. "
            "Build the changeset with compare_cols covering all non-key "
            "columns of the snapshot being patched."
        )
    keep = old.select(*value_cols).join(
        changes.select(*key_cols), key_cols, "left_anti"
    )
    upserts = changes.where(F.col("status") != "deleted").select(*value_cols)
    return keep.unionByName(upserts)
