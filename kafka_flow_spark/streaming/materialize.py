"""Streaming materialized-view maintenance — foreachBatch sinks that roll a
stored aggregate / join view forward one micro-batch at a time.

This wires the batch incremental-maintenance family
(operators/incremental.py: agg_state/agg_merge/agg_maintain/
maintain_join_view/apply_changeset) into the streaming surface: each
micro-batch IS the changeset, and the view on disk advances with it.  That is
the reference's core reason to exist — maintaining state FROM A STREAM
(core/.../FoldToState.scala:44-90 folds records into persisted per-key state;
docs/overview.md:31-42 describes the same keep-state-near-the-stream loop) —
applied to relational views instead of opaque per-key blobs.

Exactly-once without a transactional table format
-------------------------------------------------
``foreachBatch`` is at-least-once: after a crash the engine REPLAYS the last
unacknowledged micro-batch with the SAME ``batch_id`` and (for replayable
sources) the same rows.  The sinks here make the replay a no-op with the
standard versioned-commit protocol:

- every batch writes its outputs to fresh ``v=<batch_id>`` directories —
  never in place — so a crash mid-write can only tear an UNCOMMITTED version;
- a version counts as committed solely on its view-level ``_VIEW_COMMIT``
  marker, written after every table's parquet job has returned — commit-
  last, the same ordering discipline as save_minhash_index's params row
  (the per-table ``_SUCCESS`` files Spark writes are thereby subsumed);
- on entry the sink consults the max committed version: ``batch_id`` EQUAL
  to it ⇒ the crash-replay of the last batch, skip (idempotent);
  ``batch_id`` BELOW it ⇒ a different stream incarnation (new/cleared
  checkpoint) — refuse loudly rather than eat its backlog as phantom
  replays or double-apply history; otherwise roll forward FROM the
  committed version (a torn half-written version is simply ignored and
  overwritten).

Offsets live in the streaming checkpoint, view state lives in the versioned
parquet log, and the batch_id ties them together — the same
offsets-never-ahead-of-state contract the reference builds from Kafka commits
(SURVEY.md §3.2), here built from Spark's replay + idempotent sink.

Scale shape: each micro-batch costs |Δ| + |touched groups| (agg) or
|Δ|-sized joins + per-table scans with delta-keyed semi/anti joins (join
view) — never a recompute over history.  Old versions are retained for
time travel / debugging; ``vacuum(keep=n)`` prunes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flow_spark.operators.incremental import (
    agg_maintain,
    agg_merge,
    agg_result,
    agg_state,
    apply_changeset,
    maintain_join_view,
)

_VIEW_COMMIT = "_VIEW_COMMIT"


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for ``path`` — works for local, HDFS and object
    stores alike (the sink must not assume a POSIX view of cluster storage)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jvm


def _list_versions(spark: SparkSession, root: str) -> list[tuple[int, bool]]:
    """All ``v=<n>`` directories under the view root as (version, committed);
    committed iff the view-level ``_VIEW_COMMIT`` marker exists — the marker
    alone is the commit point (it is written only after every table's
    parquet job, whose own ``_SUCCESS`` files it therefore subsumes)."""
    fs, jvm = _fs(spark, root)
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not name.startswith("v="):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        committed = fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{root}/{name}/{_VIEW_COMMIT}")
        )
        out.append((v, committed))
    return sorted(out)


def _committed_versions(spark: SparkSession, root: str) -> list[int]:
    return [v for v, committed in _list_versions(spark, root) if committed]


def _commit_version(spark: SparkSession, root: str, version: int) -> None:
    fs, jvm = _fs(spark, root)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{root}/v={version}/{_VIEW_COMMIT}"), True
    ).close()


class _VersionedView:
    """Shared versioned-commit machinery: a view root holding
    ``v=<batch_id>/<table>/`` parquet directories plus a commit marker per
    version.  Subclasses implement ``_initial`` (first batch) and ``_advance``
    (committed state + batch → new tables dict)."""

    tables: list[str] = []

    def __init__(self, path: str):
        self.path = path

    # -- versioned-table plumbing ------------------------------------------
    def last_committed(self, spark: SparkSession) -> int | None:
        vs = _committed_versions(spark, self.path)
        return vs[-1] if vs else None

    def _read(self, spark: SparkSession, version: int, table: str) -> DataFrame:
        return spark.read.parquet(f"{self.path}/v={version}/{table}")

    def _write_all(
        self, spark: SparkSession, version: int, frames: dict[str, DataFrame]
    ) -> None:
        assert set(frames) == set(self.tables)
        for t in self.tables:
            # overwrite: a torn, uncommitted attempt at this version from a
            # previous incarnation must not poison the retry
            frames[t].write.mode("overwrite").parquet(f"{self.path}/v={version}/{t}")
        _commit_version(spark, self.path, version)  # commit point, written last

    # -- the foreachBatch hook ---------------------------------------------
    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        last = self.last_committed(spark)
        if last is not None and batch_id == last:
            return  # crash-replay of the last batch: already applied, skip
        if last is not None and batch_id < last:
            # Structured Streaming batch ids are monotonic within ONE
            # checkpoint and only the LAST batch is ever redelivered; an id
            # below the committed head means a DIFFERENT stream incarnation
            # (new/cleared checkpoint restarting at 0) is pointed at this
            # view root.  Silently skipping would eat its backlog (the
            # batches would look like replays); silently applying would
            # double-count everything the view already holds.  Refuse —
            # the operator must keep the checkpoint, or rebuild the view
            # under a fresh root (review r8).
            raise ValueError(
                f"materialized view at {self.path} is at committed batch "
                f"{last} but received batch {batch_id} — this stream's "
                "checkpoint does not match the view (was it cleared or "
                "relocated?); keep checkpoint and view together, or point "
                "the new stream at a fresh view path"
            )
        if last is None:
            frames = self._initial(batch)
        else:
            committed = {t: self._read(spark, last, t) for t in self.tables}
            frames = self._advance(committed, batch)
        self._write_all(spark, batch_id, frames)

    def versions(self, spark: SparkSession) -> list[int]:
        """Committed versions available for time travel, oldest first."""
        return _committed_versions(spark, self.path)

    def _resolve(self, spark: SparkSession, version: int | None) -> int:
        """Validate a time-travel version (None = latest committed).  Reading
        an uncommitted/absent version is refused — torn data must stay
        invisible through EVERY read path, not just the roll-forward."""
        vs = _committed_versions(spark, self.path)
        if not vs:
            raise ValueError(f"no committed version under {self.path}")
        if version is None:
            return vs[-1]
        if version not in vs:
            raise ValueError(
                f"version {version} is not committed under {self.path} "
                f"(committed: {vs}; vacuumed versions are gone for good)"
            )
        return version

    def vacuum(self, spark: SparkSession, keep: int = 2) -> list[int]:
        """Drop all but the newest ``keep`` committed versions, plus any
        UNCOMMITTED debris older than the newest committed version (a torn
        directory from a crashed batch whose id was never redelivered —
        newer uncommitted dirs are left alone, they may be an in-flight
        write).  Returns dropped versions."""
        if keep < 1:
            # keep=0 would delete the committed head; the next micro-batch
            # would then see last_committed()=None and silently re-initialize
            # the view from that single batch — silent state loss, and the
            # foreign-checkpoint refusal would be bypassed too (review r8).
            raise ValueError(
                f"vacuum keep must be >= 1 (got {keep}) — the roll-forward "
                "always needs the committed head"
            )
        all_vs = _list_versions(spark, self.path)
        committed = [v for v, ok in all_vs if ok]
        keep_set = set(committed[-keep:]) if keep > 0 else set()
        head = committed[-1] if committed else None
        drop = [
            v
            for v, ok in all_vs
            if (ok and v not in keep_set)
            or (not ok and head is not None and v < head)
        ]
        fs, jvm = _fs(spark, self.path)
        for v in drop:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{self.path}/v={v}"), True)
        return drop

    # -- subclass contract ---------------------------------------------------
    def _initial(self, batch: DataFrame) -> dict[str, DataFrame]:
        raise NotImplementedError

    def _advance(
        self, committed: dict[str, DataFrame], batch: DataFrame
    ) -> dict[str, DataFrame]:
        raise NotImplementedError


class MaterializedAggView(_VersionedView):
    """Streaming-maintained per-group aggregate (count/sum/avg/min/max of
    ``value_col`` by ``keys``), stored as an ``agg_state`` table.

    Two stream shapes:
    - ``row_pk=None`` (append-only stream, e.g. events): each micro-batch is
      a new shard; state advances by ``agg_merge(state, agg_state(batch))`` —
      pure algebraic merge, cost |Δ| + |groups|.
    - ``row_pk=[...]`` (CDC stream): micro-batch rows are a ``changeset()``
      (carry ``status`` ∈ added/changed/deleted + full new values); the sink
      also maintains the BASE snapshot (needed to retract old contributions
      and recompute touched groups' min/max) and advances by
      ``agg_maintain`` + ``apply_changeset``.  Changeset contract: at most
      ONE row per pk per micro-batch (a CDC burst with several versions of
      a key in one batch must be collapsed last-wins upstream — the same
      requirement ``changeset()`` output satisfies by construction).

    ``result(spark)`` finalizes the committed state into the user-facing
    aggregate exactly as a full recompute would (same unscaled-cents
    arithmetic — the golden restart test pins maintained == recomputed
    across a stop/start boundary).
    """

    def __init__(
        self,
        path: str,
        keys: list[str],
        value_col: str,
        row_pk: list[str] | None = None,
    ):
        super().__init__(path)
        self.keys, self.value_col, self.row_pk = list(keys), value_col, row_pk
        self.tables = ["state"] + (["base"] if row_pk is not None else [])

    def _initial(self, batch: DataFrame) -> dict[str, DataFrame]:
        if self.row_pk is None:
            return {"state": agg_state(batch, self.keys, self.value_col)}
        rows = batch.where(F.col("status") != "deleted").drop("status")
        return {"state": agg_state(rows, self.keys, self.value_col), "base": rows}

    def _advance(self, committed, batch) -> dict[str, DataFrame]:
        if self.row_pk is None:
            return {
                "state": agg_merge(
                    committed["state"], agg_state(batch, self.keys, self.value_col)
                )
            }
        base = committed["base"]
        return {
            "state": agg_maintain(
                committed["state"], base, batch, self.keys, self.row_pk, self.value_col
            ),
            "base": apply_changeset(base, batch, self.row_pk),
        }

    def state(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The agg_state table at a committed ``version`` (None = latest) —
        time travel over the retained version log (see ``versions``)."""
        return self._read(spark, self._resolve(spark, version), "state")

    def result(
        self,
        spark: SparkSession,
        frac_digits: int = 2,
        version: int | None = None,
    ) -> DataFrame:
        return agg_result(self.state(spark, version), frac_digits)


class MaterializedJoinView(_VersionedView):
    """Streaming-maintained INNER fact⋈dim join view: the fact side arrives
    as a CDC stream (``changeset()`` rows), the dim side is read from
    ``dim_path``.  Contract: the dim content must be STABLE across batches —
    an in-place dim edit without a corresponding delta would join new dim
    values onto changed fact rows while untouched view rows keep the old
    ones (a mixed view).  Evolve the dim by feeding its ``changeset()`` as
    a ``delta_b`` (extend ``_advance`` — the batch operator
    ``maintain_join_view`` already takes two-sided deltas).

    Maintains two tables per version: the view itself and the fact snapshot
    (needed to find unchanged fact rows whose dim side changes later and to
    apply the next delta).  Advance = ``maintain_join_view`` with an empty
    dim delta — NO full A⋈B re-join, ever; per-batch cost is |Δ|-sized joins
    plus delta-keyed anti joins over the view/fact scans.
    """

    def __init__(self, path: str, dim_path: str, a_pk: list[str], fk: str, b_pk: str):
        super().__init__(path)
        self.dim_path, self.a_pk, self.fk, self.b_pk = dim_path, list(a_pk), fk, b_pk
        self.tables = ["view", "fact"]

    def _dim(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.dim_path)

    def _empty_dim_delta(self, dim: DataFrame) -> DataFrame:
        return dim.withColumn("status", F.lit("added")).limit(0)

    def _initial(self, batch: DataFrame) -> dict[str, DataFrame]:
        spark = batch.sparkSession
        dim = self._dim(spark)
        fact = batch.where(F.col("status") != "deleted").drop("status")
        empty_fact = fact.limit(0)
        empty_view = empty_fact.join(dim, empty_fact[self.fk] == dim[self.b_pk]).drop(
            self.b_pk
        )
        view = maintain_join_view(
            empty_view, empty_fact, batch, dim, self._empty_dim_delta(dim),
            self.a_pk, self.fk, self.b_pk,
        )
        return {"view": view, "fact": fact}

    def _advance(self, committed, batch) -> dict[str, DataFrame]:
        dim = self._dim(batch.sparkSession)
        fact = committed["fact"]
        return {
            "view": maintain_join_view(
                committed["view"], fact, batch, dim, self._empty_dim_delta(dim),
                self.a_pk, self.fk, self.b_pk,
            ),
            "fact": apply_changeset(fact, batch, self.a_pk),
        }

    def view(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The join view at a committed ``version`` (None = latest) — time
        travel over the retained version log (see ``versions``)."""
        return self._read(spark, self._resolve(spark, version), "view")


def run_view_sink(
    stream: DataFrame,
    sink: _VersionedView,
    checkpoint: str,
    available_now: bool = True,
) -> None:
    """Drive a CDC/append stream into a materialized-view sink to backlog
    exhaustion and stop — restartable: the checkpoint replays the last
    in-flight batch, the versioned commit makes the replay idempotent."""
    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(**({"availableNow": True} if available_now else {"processingTime": "200 milliseconds"}))
        .start()
    )
    q.awaitTermination()


class MaterializedSketchView(_VersionedView):
    """Streaming-maintained approximate-distinct sketch: the linear-counting
    occupancy set (operators/sketches.linear_counting_sketch) rolled forward
    per micro-batch by its own merge law — sketch(A ∪ B) = distinct-union of
    sketches — so a live "distinct users per group, so far" stays one
    |groups|·m-cardinality table no matter how much history streamed past.
    The third view shape next to the aggregate and join views, and the one
    whose state can NEVER grow with the data (the agg view's state is
    group-cardinality; this one is capped at groups·m rows by construction).

    ``result(spark)`` finalizes to (group…, occupied, est_e6) via
    ``linear_counting_estimate`` — value-exact for any replayed prefix of
    the stream (same FLOOR-e6 contract as q_approx_distinct_linear).
    """

    def __init__(self, path: str, group_cols: list[str], value_col: str, m: int = 4096):
        super().__init__(path)
        self.group_cols, self.value_col, self.m = list(group_cols), value_col, m
        self.tables = ["sketch"]

    def _sketch(self, batch: DataFrame) -> DataFrame:
        from kafka_flow_spark.operators.sketches import linear_counting_sketch

        return linear_counting_sketch(batch, self.group_cols, self.value_col, self.m)

    def _initial(self, batch: DataFrame) -> dict[str, DataFrame]:
        return {"sketch": self._sketch(batch)}

    def _advance(self, committed, batch) -> dict[str, DataFrame]:
        return {
            "sketch": committed["sketch"]
            .unionByName(self._sketch(batch))
            .distinct()
        }

    def sketch(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        return self._read(spark, self._resolve(spark, version), "sketch")

    def result(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        from kafka_flow_spark.operators.sketches import linear_counting_estimate

        return linear_counting_estimate(
            self.sketch(spark, version), self.group_cols, self.m
        )
