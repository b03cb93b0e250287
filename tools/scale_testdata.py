"""Deterministic scale-up of the driver's testdata for large-SF benchmarking.

Replicates each fact table K times with key-space offsets (dims region/nation
stay fixed, TPC-H style).  Two tables need content perturbation so near-dup
structure stays LINEAR in K instead of exploding quadratically:

- documents: replica i>0 prefixes EVERY word with a replica tag (``q<i>z``).
  That is a bijection of the word vocabulary per replica, so every replica's
  word-n-gram shingle space is an isomorphic image of the source's:
  intra-replica jaccards (and therefore MinHash/LSH candidate and verified
  pair counts) match the source corpus exactly, while shingle sets are
  pairwise disjoint ACROSS replicas — totals scale exactly ×K, the
  constant-dup-rate regime of a real growing corpus.  (Two earlier designs
  failed: mixing in a partner doc's text let short partners leave same-doc
  replicas ≥0.7-jaccard — ~quadratic verified pairs, 102× candidates at
  K=100; interleaving a separator token between words created ``(sep, w,
  sep)`` shingles shared by ANY two docs with a word in common — verified
  pairs went linear but LSH candidates stayed ~600× at K=100.)
- embeddings: replica i>0 rotates the vector by a nonzero offset — norm and
  all intra-replica inner products are preserved (near-dup structure ×K),
  while cross-replica cosines decorrelate.

Everything is pure SQL over the source parquet (DuckDB), fully deterministic:
same inputs → byte-identical sample/bench semantics for both engines.

Usage: python tools/scale_testdata.py [K] [src_dir] [dst_dir] [tables_csv]
Defaults: K=10, src=/root/testdata/sf0.1, dst=_scaled/sf1 (≈K× src bytes),
all tables.  ``tables_csv`` (e.g. ``documents,embeddings``) generates only
the named tables — the sf100 probe shape, where only the text/vector
families are audited and replicating lineitem would be 14 GB of dead
weight.  Scaling an ALREADY-SCALED dir composes: the per-replica word-tag
bijection and vector rotation both stack (tags nest, rotations add), so
near-dup structure stays linear through repeated application.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES_PLAIN = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_scaled", "sf1"
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")

    def t(name: str) -> str:
        return f"'{src}/{name}.parquet'"

    def off(name: str, key: str) -> int:
        return con.execute(f"SELECT max({key}) + 1 FROM {t(name)}").fetchone()[0]

    ck, sk, pk = off("customer", "c_custkey"), off("supplier", "s_suppkey"), off("part", "p_partkey")
    ok, ek, uk = off("orders", "o_orderkey"), off("events", "event_id"), off("events", "user_id")
    dk, vk = off("documents", "doc_id"), off("embeddings", "vec_id")
    rep = f"CROSS JOIN range({k}) AS r(i)"

    jobs = {
        "region": f"SELECT * FROM {t('region')}",
        "nation": f"SELECT * FROM {t('nation')}",
        "customer": f"""SELECT c_custkey + i*{ck} AS c_custkey, c_name, c_nationkey,
                        c_acctbal, c_mktsegment FROM {t('customer')} {rep}""",
        "supplier": f"""SELECT s_suppkey + i*{sk} AS s_suppkey, s_name, s_nationkey,
                        s_acctbal FROM {t('supplier')} {rep}""",
        "part": f"""SELECT p_partkey + i*{pk} AS p_partkey, p_name, p_brand, p_type,
                    p_size, p_retailprice FROM {t('part')} {rep}""",
        "orders": f"""SELECT o_orderkey + i*{ok} AS o_orderkey,
                      o_custkey + i*{ck} AS o_custkey, o_orderstatus, o_totalprice,
                      o_orderdate, o_orderpriority FROM {t('orders')} {rep}""",
        "lineitem": f"""SELECT l_orderkey + i*{ok} AS l_orderkey,
                        l_partkey + i*{pk} AS l_partkey,
                        l_suppkey + i*{sk} AS l_suppkey,
                        l_linenumber, l_quantity, l_extendedprice, l_discount,
                        l_tax, l_returnflag, l_linestatus, l_shipdate
                        FROM {t('lineitem')} {rep}""",
        "events": f"""SELECT event_id + i*{ek} AS event_id, ts,
                      user_id + i*{uk} AS user_id, event_type, value, props
                      FROM {t('events')} {rep}""",
        "documents": f"""
            SELECT doc_id + i*{dk} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE regexp_replace(trim(COALESCE(text, '')), '(\\S+)',
                                            'q' || i || 'z\\1', 'g') END AS text,
                   lang, source,
                   CASE WHEN i = 0 THEN n_chars
                        ELSE length(regexp_replace(trim(COALESCE(text, '')), '(\\S+)',
                                                   'q' || i || 'z\\1', 'g')) END AS n_chars
            FROM {t('documents')} {rep}""",
        "embeddings": f"""
            SELECT vec_id + i*{vk} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_concat(embedding[1 + ((i*7) % 63 + 1):],
                                         embedding[1:((i*7) % 63 + 1)]) END
                     ::FLOAT[] AS embedding,
                   label
            FROM {t('embeddings')} {rep}""",
    }
    only = (
        {s.strip() for s in sys.argv[4].split(",")} if len(sys.argv) > 4 else None
    )
    if only is not None:
        unknown = only - set(jobs)
        if unknown:
            raise SystemExit(f"unknown tables {sorted(unknown)} (have {sorted(jobs)})")
        jobs = {k: v for k, v in jobs.items() if k in only}
    for name, sql in jobs.items():
        out = os.path.join(dst, f"{name}.parquet")
        # Small row groups: parquet splits at row-group granularity, and the
        # driver's single-file-per-table layout would otherwise cap Spark's
        # scan parallelism at 1-2 tasks (a 100 TB table is many files; this
        # makes the scaled fixture behave like one).
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 10000)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows -> {out} ({os.path.getsize(out) >> 20} MB)")


if __name__ == "__main__":
    main()
