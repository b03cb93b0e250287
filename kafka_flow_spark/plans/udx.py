"""User-defined function surface: native Python UDTF + Pandas grouped-agg UDAF.

The reference exposes arbitrary per-record Scala (`fold`, cats-effect effects —
core/src/main/scala/com/evolutiongaming/kafka/flow/FoldOption.scala); the Spark
engine's equivalents are the three UDF extension points, each demonstrated here
as an oracle-gated query rather than a toy:

- UDTF (`@udtf`, Spark 4 native): one input row → many output rows with a
  declared schema, usable in LATERAL position.  ``token_offsets`` emits each
  token with its character offset in the normalized text — the alignment table
  a span-level pipeline (see operators.dedup.duplicate_spans) needs to map
  token spans back to character ranges.
- UDAF (`@pandas_udf` grouped-agg, Arrow-batched): arbitrary Python over a
  whole group.  ``second_largest`` is an order statistic — chosen because it
  is NOT a builtin aggregate, and exact (no float arithmetic), so the oracle
  hash-matches bit-for-bit.
- (Row-at-a-time UDFs are deliberately absent from every hot path — see
  ARCHITECTURE.md; the UDTF here is the API-surface proof, with the builtin
  higher-order-function form preferred at scale.)

Both queries are deterministic by construction: integer scanning in the UDTF,
an order statistic in the UDAF — no accumulation-order-sensitive arithmetic
crosses the engine boundary.  The decorated objects are built lazily (inside
the query functions) because ``@udtf``/``@pandas_udf`` parse their DDL return
types against an active SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flow_spark.operators.text import normalize_text
from kafka_flow_spark.plans.registry import register
from kafka_flow_spark.tables import load

_CACHE: dict[str, object] = {}


def _token_offsets_udtf():
    if "udtf" not in _CACHE:
        from pyspark.sql.functions import udtf

        @udtf(returnType="tok_idx INT, token STRING, char_start INT", useArrow=True)
        class TokenOffsets:
            """Tokens of a normalized text with character offsets (one space
            between tokens after normalization, so offsets are prefix sums of
            token lengths + 1)."""

            def eval(self, text: str):  # noqa: D102
                pos = 0
                for i, tok in enumerate((text or "").split(" ")):
                    yield i, tok, pos
                    pos += len(tok) + 1

        _CACHE["udtf"] = TokenOffsets
    return _CACHE["udtf"]


def _second_largest_udaf():
    if "udaf" not in _CACHE:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def second_largest(v):
            """Second-largest value of the group (NaN for 1-row groups) — an
            exact order statistic, no accumulation arithmetic."""
            if len(v) < 2:
                return float("nan")
            return float(v.nlargest(2).iloc[-1])

        def group_count(v):
            return len(v)

        # real type objects (module uses postponed annotations, which the
        # pandas-UDF eval-type inference cannot resolve from strings)
        second_largest.__annotations__ = {"v": pd.Series, "return": float}
        group_count.__annotations__ = {"v": pd.Series, "return": int}
        # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg,
        # so the row count is a second pandas aggregate
        _CACHE["udaf"] = (
            pandas_udf(second_largest, "double"),
            pandas_udf(group_count, "long"),
        )
    return _CACHE["udaf"]


@register(
    "q_udtf_token_offsets",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(trim(lower(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE doc_id < 50),
    i AS (SELECT doc_id, unnest(range(len(toks))) AS i, toks FROM t)
    SELECT doc_id, CAST(i AS INT) AS tok_idx, toks[i + 1] AS token,
           CAST(CASE WHEN i = 0 THEN 0
                ELSE list_sum(list_transform(list_slice(toks, 1, i), x -> length(x) + 1))
                END AS INT) AS char_start
    FROM i
    """,
)
def q_udtf_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in LATERAL position: token/char-offset alignment rows."""
    spark.udtf.register("token_offsets", _token_offsets_udtf())
    load(spark, sf_dir, "documents").select(
        "doc_id", normalize_text("text").alias("ntext")
    ).filter(F.col("doc_id") < 50).createOrReplaceTempView("_docs_norm")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok_idx, t.token, t.char_start
        FROM _docs_norm d, LATERAL token_offsets(d.ntext) t
        """
    )


@register(
    "q_udaf_second_largest",
    oracle="""
    SELECT event_type, value AS second_value, n FROM (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    WHERE rk = 2
    """,
)
def q_udaf_second_largest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-agg UDAF (Arrow-batched): second-largest event value per
    type.  The whole group crosses to Python as one Arrow batch — the shape
    for bespoke aggregates the builtin library lacks."""
    second, count = _second_largest_udaf()
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            second(F.col("value")).alias("second_value"),
            count(F.col("value")).alias("n"),
        )
    )
