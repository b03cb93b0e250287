"""Admin CLI for the materialized-view store (streaming/materialize.py) —
the operations any long-lived 100 TB view needs between (or without)
micro-batches, each wired to the library call so scripts and runbooks have
one entry point:

  versions   <root>                                    list committed versions
  vacuum     <root> --keep N                           prune old versions
  refresh    <root> --dim <path> --a-pk c1,c2 --fk f --b-pk p [--n-buckets N]
                                                       dim-only advance (join view)
  rebucket   <root> --kind agg|join ... --n-new N      offline bucket migration
  changes    <root> --from V --to V [--table T] [--out DIR] [--n-buckets N]
             [--pk c1,c2]                              CDF read → parquet/show

`versions`, `vacuum` and `changes` operate on the generic version log, so
they work for any sink kind; `refresh` needs the join view's constructor
arguments and `rebucket` the sink kind's (the bucket function must be
reconstructible).  Run from the single-writer context: between micro-batches
of the owning stream, never racing one.

Usage examples:
  python tools/view_admin.py versions /data/views/orders_by_brand
  python tools/view_admin.py vacuum   /data/views/orders_by_brand --keep 3
  python tools/view_admin.py changes  /data/views/orders_by_brand \\
      --from 4 --to 7 --table base --pk pk --n-buckets 64 --out /tmp/delta
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _generic_view(root: str, n_buckets: int, table: str | None, pk: list[str] | None):
    """A minimal _VersionedView over an existing root for kind-agnostic ops
    (versions / vacuum / changes) — bucketing metadata comes from the
    caller because the store keeps it per-manifest, not per-root."""
    from kafka_flow_spark.streaming.materialize import _VersionedView

    v = _VersionedView(root, n_buckets)
    if table and pk:
        v.tables = [table]
        v.bucketed = {table: pk}
    return v


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("versions")
    p.add_argument("root")

    p = sub.add_parser("vacuum")
    p.add_argument("root")
    p.add_argument("--keep", type=int, default=2)

    p = sub.add_parser("refresh")
    p.add_argument("root")
    p.add_argument("--dim", required=True)
    p.add_argument("--a-pk", required=True, help="comma-separated fact pk cols")
    p.add_argument("--fk", required=True)
    p.add_argument("--b-pk", required=True)
    p.add_argument("--n-buckets", type=int, default=64)

    p = sub.add_parser("rebucket")
    p.add_argument("root")
    p.add_argument("--n-new", type=int, required=True)
    p.add_argument("--table", required=True, help="bucketed table name")
    p.add_argument("--pk", required=True, help="comma-separated pk cols")
    p.add_argument("--n-buckets", type=int, default=64, help="CURRENT count")

    p = sub.add_parser("changes")
    p.add_argument("root")
    p.add_argument("--from", dest="v_from", type=int, required=True)
    p.add_argument("--to", dest="v_to", type=int, required=True)
    p.add_argument("--table", default=None)
    p.add_argument("--pk", default=None, help="comma-separated pk cols")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--out", default=None, help="write parquet here (else show)")

    args = ap.parse_args()
    from kafka_flow_spark.session import get_spark

    spark = get_spark("view-admin")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "versions":
        from kafka_flow_spark.streaming.materialize import (
            _list_versions,
            _read_batch_meta,
        )

        for v, committed in _list_versions(spark, args.root):
            bid = _read_batch_meta(spark, args.root, v) if committed else "-"
            state = "committed" if committed else "UNCOMMITTED"
            print(f"v={v}\t{state}\tbatch_id={bid}")
    elif args.cmd == "vacuum":
        dropped = _generic_view(args.root, 1, None, None).vacuum(
            spark, keep=args.keep
        )
        print(f"dropped: {dropped}")
    elif args.cmd == "refresh":
        from kafka_flow_spark.streaming.materialize import MaterializedJoinView

        sink = MaterializedJoinView(
            args.root,
            args.dim,
            a_pk=args.a_pk.split(","),
            fk=args.fk,
            b_pk=args.b_pk,
            n_buckets=args.n_buckets,
        )
        v = sink.refresh(spark)
        print("no dim change - nothing written" if v is None else f"committed v={v}")
    elif args.cmd == "rebucket":
        view = _generic_view(
            args.root, args.n_buckets, args.table, args.pk.split(",")
        )
        v = view.rebucket(spark, args.n_new)
        print(f"committed v={v} under n_buckets={args.n_new}")
    elif args.cmd == "changes":
        pk = args.pk.split(",") if args.pk else None
        view = _generic_view(args.root, args.n_buckets, args.table, pk)
        ch = view.changes_between(spark, args.v_from, args.v_to, table=args.table)
        if args.out:
            ch.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            ch.show(100, truncate=False)


if __name__ == "__main__":
    main()
