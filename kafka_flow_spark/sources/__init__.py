"""Record sources and pre-grouping record transforms.

Reference counterparts:
- Kafka consumer poll loop (#1, core/.../ConsumerFlow.scala:15-23,83-105) →
  ``kafka_records`` (the micro-batch engine is the poll loop; offsets live in
  the checkpoint, not a consumer group commit — ConsumerFlow's
  autoCommit=false discipline, core/.../kafka/KafkaModule.scala:63-76, is
  structural here).
- Topic router (#3, core/.../TopicFlowOf.scala:22-26) → ``route_topics``.
- RemapKey (#6, core/.../RemapKey.scala:8-22) → ``remap_key``; unlike the
  reference (which can only remap within a partition), the remapped key feeds
  a real shuffle, so cross-partition regroup is correct by construction.
- FilterRecord (#7, core/.../PartitionFlow.scala:39-52) → ``filter_records``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession

KAFKA_RECORD_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT, offset BIGINT, "
    "timestamp TIMESTAMP, timestampType INT, "
    "headers ARRAY<STRUCT<key: STRING, value: BINARY>>"
)


def kafka_records(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    include_headers: bool = True,
    streaming: bool = True,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source returning the standard record schema (KAFKA_RECORD_SCHEMA).

    One Kafka partition maps to one input partition — the reference's
    partition fan-out (#4) is the source's native partitioning.  Backpressure:
    ``maxOffsetsPerTrigger`` bounds a micro-batch the way the reference's poll
    batches bound a poll.
    """
    reader = spark.readStream if streaming else spark.read
    r = (
        reader.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", str(include_headers).lower())
    )
    if streaming and max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return r.load()


def file_records(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    streaming: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-backed record stream — the broker-free test/backfill source."""
    if not streaming:
        return spark.read.format(fmt).schema(schema).load(path)
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def rate_records(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic load source (``rate`` format): (timestamp, value) rows."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def route_topics(
    records: DataFrame, flows: dict[str, Callable[[DataFrame], DataFrame]]
) -> dict[str, DataFrame]:
    """Split one record stream per topic and apply each topic's flow (#3).

    Each branch is an independent filtered plan; the filter on ``topic`` is
    pushed into the Kafka scan (topic-partition pruning), so a branch reads
    only its own topic.
    """
    from pyspark.sql import functions as F

    return {t: fn(records.filter(F.col("topic") == t)) for t, fn in flows.items()}


def remap_key(records: DataFrame, key_col: str, new_key: Column) -> DataFrame:
    """Rewrite the grouping key before the keyed fold (#6).

    A projection feeding the groupBy shuffle — records with the same derived
    key land in the same state partition even across source partitions
    (strictly stronger than the reference, which remaps only within one
    Kafka partition — RemapKey.scala:8-12 caveat).
    """
    return records.withColumn(key_col, new_key)


def filter_records(records: DataFrame, predicate: Column) -> DataFrame:
    """Drop records before state recovery/fold (#7); a plain pushed filter.

    Offsets still commit past dropped records — in Spark that's structural
    (the checkpoint tracks source offsets, not post-filter rows).
    """
    return records.filter(predicate)


def with_partition_mapping(
    records: DataFrame, num_partitions: int, cols: Sequence[str] = ("key",)
) -> DataFrame:
    """Modulo partition mapper (#37, KafkaPersistencePartitionMapper.scala:14-57):
    co-locate records by key hash into ``num_partitions`` — the explicit form
    of the snapshot-partition mapping for sinks that need stable placement."""
    return records.repartition(num_partitions, *cols)
