"""End-to-end streaming curation pipeline through the Flow facade:

    file source → quality filter → exact content dedup (first-wins, state in
    the checkpoint) → per-lang stateful counting fold → parquet sink,

run twice with a restart in between — the SURVEY Phase-4 ingest chain on the
reference's recovery semantics (offsets never ahead of durable state: the
dedup fingerprints and fold counters both live in checkpointed state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flow_spark.flow import Flow
from kafka_flow_spark.operators.fold import fold_option
from kafka_flow_spark.streaming.flow import FlowSpec

SCHEMA = "seq LONG, lang STRING, text STRING"


def write_batch(spark, d, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(d)


def lang_counter_spec():
    # state = docs surviving dedup+filter per lang; emit running count
    fold = fold_option(lambda s, rec: (s or 0) + 1)
    return FlowSpec(
        key_cols=["lang"],
        order_col="seq",
        fold=fold,
        output_schema="lang STRING, running_count INT",
        emit=lambda key, rec, before, after: {
            "lang": key["lang"],
            "running_count": after,
        },
    )


def _run(spark, input_dir, chk, out_dir):
    (
        Flow.from_files(spark, input_dir, SCHEMA)
        .filter(F.length(F.trim("text")) >= 5)  # quality gate: tiny docs out
        .dedup("text")
        .fold(lang_counter_spec())
        .to_parquet(out_dir, chk)
    )
    return sorted(
        (r["lang"], r["running_count"]) for r in spark.read.parquet(out_dir).collect()
    )


def test_curation_pipeline_with_restart(spark, tmp_path):
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    write_batch(
        spark,
        input_dir,
        [
            (1, "en", "the quick brown fox"),
            (2, "en", "the quick brown fox"),  # exact dup: dropped
            (3, "en", "lorem ipsum dolor"),
            (4, "de", "der schnelle fuchs"),
            (5, "de", "ab"),  # fails the quality gate
        ],
    )
    out1 = _run(spark, input_dir, chk, out_dir)
    assert out1 == [("de", 1), ("en", 1), ("en", 2)]

    # restart: dedup state AND fold counters recover from the checkpoint —
    # an old duplicate still drops, counts continue (not restart at 1)
    write_batch(
        spark,
        input_dir,
        [
            (6, "en", "the quick brown fox"),  # dup from before the restart
            (7, "en", "completely new text"),
            (8, "fr", "le renard rapide"),
        ],
    )
    out2 = _run(spark, input_dir, chk, out_dir)
    assert out2 == [("de", 1), ("en", 1), ("en", 2), ("en", 3), ("fr", 1)]


def test_cluster_aware_split_no_leakage(spark):
    """Every near-dup pair must land in the same split — the property the
    query exists to guarantee."""
    from kafka_flow_spark.plans.pipeline import q_cluster_aware_split
    from tests.conftest import SF_SMALL

    out = q_cluster_aware_split(spark, SF_SMALL)
    # co-cluster docs share a split by construction of the cluster key
    n_bad = (
        out.alias("a")
        .join(out.alias("b"), "cluster_id")
        .where("a.split != b.split")
        .count()
    )
    assert n_bad == 0
    # all three splits are populated and cover every doc
    rows = {r["split"]: r["n"] for r in out.groupBy("split").count()
            .withColumnRenamed("count", "n").collect()}
    assert set(rows) == {"train", "val", "test"}
