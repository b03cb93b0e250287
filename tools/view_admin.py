"""Admin CLI for the materialized-view store (streaming/materialize.py) —
the operations any long-lived 100 TB view needs between (or without)
micro-batches, each wired to the library call so scripts and runbooks have
one entry point:

  versions   <root>                                    list committed versions
  vacuum     <root> --keep N [--downstream R1,R2,...]  prune old versions (refusing to
                                                       strand listed followers)
  refresh    <root>                                    dim-only advance (join view)
  rebucket   <root> --n-new N                          offline bucket migration
  evolve     <root> --add name=sql_expr [...]          additive schema evolution
  rename     <root> --map old=new [...]                payload-column rename (one rewrite)
  changes    <root> --from V --to V [--table T] [--out DIR]
                                                       CDF read → parquet/show
  follow     <downstream_root> --upstream <root> [--table T]
                                                       subscription advance (CDF cascade)
  follow-all <downstream_root> [...]                   advance every given follower in
                                                       topological order (cron shape of
                                                       run_view_sink's in-loop cascade)
  status     <root> [--downstream R1,R2,...]           head/versions + follower lag
                                                       (versions-behind, droppable-before)

Every op reconstructs the REAL sink from the root's ``_VIEW_META.json``
(written by the owning sink at every commit), so nothing here trusts
caller-supplied bucketing flags — a wrong ``--pk`` used to produce a wrong
changeset silently, and a partial rebucket handle could commit a head
missing tables (permanent data loss after vacuum; review r10).  LEGACY
roots (no meta yet): ``versions``/``vacuum`` still work (vacuum's closure
is discovered from on-disk manifests); ``changes`` falls back to
``--pk``/``--n-buckets`` flags with a loud warning; ``rebucket``/``evolve``/
``refresh``/``follow`` refuse — run one commit with the owning sink (which
writes the meta) or call the library method on the real sink.

Run from the single-writer context: between micro-batches of the owning
stream, never racing one.

Usage examples:
  python tools/view_admin.py versions /data/views/orders_by_brand
  python tools/view_admin.py vacuum   /data/views/orders_by_brand --keep 3
  python tools/view_admin.py rebucket /data/views/orders_by_brand --n-new 256
  python tools/view_admin.py evolve   /data/views/orders_by_brand --add "region=CAST(NULL AS STRING)"
  python tools/view_admin.py changes  /data/views/orders_by_brand --from 4 --to 7 --out /tmp/delta
  python tools/view_admin.py follow   /data/views/brand_rollup --upstream /data/views/orders_by_brand
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _open(spark, root: str):
    from kafka_flow_spark.streaming.materialize import open_view

    return open_view(spark, root)


def _legacy_changes_view(root: str, n_buckets: int, table: str | None, pk: list[str] | None):
    """Pre-meta fallback for ``changes`` only: a minimal handle built from
    caller flags, with a loud warning — the caller owns the pk's truth."""
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
    p.add_argument(
        "--downstream",
        default=None,
        help="comma-separated follower roots whose cursors must stay "
        "serviceable (refuses instead of stranding a lagging subscriber)",
    )

    p = sub.add_parser("refresh")
    p.add_argument("root")

    p = sub.add_parser("rebucket")
    p.add_argument("root")
    p.add_argument("--n-new", type=int, required=True)

    p = sub.add_parser("evolve")
    p.add_argument("root")
    p.add_argument(
        "--add",
        action="append",
        required=True,
        metavar="NAME=SQL_EXPR",
        help="column to add with its backfill expression (repeatable)",
    )
    p.add_argument(
        "--tables",
        default=None,
        help="comma-separated table names (default: the sink's evolve_tables)",
    )

    p = sub.add_parser("rename")
    p.add_argument("root")
    p.add_argument(
        "--map",
        action="append",
        required=True,
        metavar="OLD=NEW",
        help="payload column to rename (repeatable)",
    )
    p.add_argument(
        "--tables",
        default=None,
        help="comma-separated table names (default: the sink's evolve_tables)",
    )

    p = sub.add_parser("changes")
    p.add_argument("root")
    p.add_argument("--from", dest="v_from", type=int, required=True)
    p.add_argument("--to", dest="v_to", type=int, required=True)
    p.add_argument("--table", default=None)
    p.add_argument("--pk", default=None, help="LEGACY roots only: comma-separated pk cols")
    p.add_argument("--n-buckets", type=int, default=None, help="LEGACY roots only")
    p.add_argument("--out", default=None, help="write parquet here (else show)")

    p = sub.add_parser("follow")
    p.add_argument("downstream_root")
    p.add_argument("--upstream", required=True)
    p.add_argument("--table", default=None, help="upstream CDF table (default: auto)")

    p = sub.add_parser("follow-all")
    p.add_argument("roots", nargs="+", help="subscription-managed downstream roots")
    p.add_argument("--table", default=None, help="upstream CDF table (default: auto)")

    p = sub.add_parser("status")
    p.add_argument("root")
    p.add_argument(
        "--downstream",
        default=None,
        help="comma-separated follower roots to report lag for",
    )

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
        # kind-agnostic and safe without meta: the referenced closure is
        # discovered from ON-DISK manifests, never from the handle's tables
        from kafka_flow_spark.streaming.materialize import (
            _VersionedView,
            read_view_meta,
        )

        meta = read_view_meta(spark, args.root)
        view = (
            _open(spark, args.root) if meta is not None else _VersionedView(args.root, 1)
        )
        protect = args.downstream.split(",") if args.downstream else None
        dropped = view.vacuum(spark, keep=args.keep, protect=protect)
        print(f"dropped: {dropped}")
    elif args.cmd == "refresh":
        sink = _open(spark, args.root)
        if not hasattr(sink, "refresh"):
            raise SystemExit(f"refresh needs a join view; {args.root} is not one")
        v = sink.refresh(spark)
        print("no dim change - nothing written" if v is None else f"committed v={v}")
    elif args.cmd == "rebucket":
        # the real sink from meta — ALL its tables ride the migration (a
        # partial handle used to commit a head missing tables; review r10)
        view = _open(spark, args.root)
        v = view.rebucket(spark, args.n_new)
        print(f"committed v={v} under n_buckets={args.n_new}")
    elif args.cmd == "evolve":
        adds = {}
        for spec in args.add:
            if "=" not in spec:
                raise SystemExit(f"--add needs NAME=SQL_EXPR, got {spec!r}")
            name, expr = spec.split("=", 1)
            adds[name.strip()] = expr
        tables = args.tables.split(",") if args.tables else None
        view = _open(spark, args.root)
        v = view.evolve(spark, adds, tables=tables)
        print(f"committed v={v} with columns {sorted(adds)}")
    elif args.cmd == "rename":
        renames = {}
        for spec in args.map:
            if "=" not in spec:
                raise SystemExit(f"--map needs OLD=NEW, got {spec!r}")
            old, new = spec.split("=", 1)
            renames[old.strip()] = new.strip()
        tables = args.tables.split(",") if args.tables else None
        view = _open(spark, args.root)
        v = view.evolve_rename(spark, renames, tables=tables)
        print(f"committed v={v} with renames {renames}")
    elif args.cmd == "changes":
        from kafka_flow_spark.streaming.materialize import read_view_meta

        meta = read_view_meta(spark, args.root)
        if meta is not None:
            if args.pk or args.n_buckets:
                # flags on a self-describing root: verify instead of trust
                pk_flag = args.pk.split(",") if args.pk else None
                view = _open(spark, args.root)
                t = args.table or (
                    next(iter(view.bucketed))
                    if len(view.bucketed) == 1
                    else "view"
                )
                stored_pk = view.bucketed.get(t)
                if pk_flag is not None and pk_flag != stored_pk:
                    raise SystemExit(
                        f"--pk {pk_flag} contradicts the root's metadata "
                        f"{stored_pk} — drop the flag (the meta is "
                        "authoritative) or fix it"
                    )
                if args.n_buckets is not None and args.n_buckets != view.n_buckets:
                    raise SystemExit(
                        f"--n-buckets {args.n_buckets} contradicts the "
                        f"root's metadata {view.n_buckets} — drop the flag"
                    )
            else:
                view = _open(spark, args.root)
        else:
            print(
                "WARNING: legacy root (no _VIEW_META.json) — trusting "
                "--pk/--n-buckets flags; a wrong --pk produces a wrong "
                "changeset. Any commit by the owning sink writes the meta.",
                file=sys.stderr,
            )
            pk = args.pk.split(",") if args.pk else None
            view = _legacy_changes_view(
                args.root, args.n_buckets or 64, args.table, pk
            )
        ch = view.changes_between(spark, args.v_from, args.v_to, table=args.table)
        if args.out:
            ch.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            ch.show(100, truncate=False)
    elif args.cmd == "follow":
        from kafka_flow_spark.streaming.materialize import follow

        down = _open(spark, args.downstream_root)
        v = follow(spark, args.upstream, down, table=args.table)
        print("caught up - nothing written" if v is None else f"committed v={v}")
    elif args.cmd == "follow-all":
        from kafka_flow_spark.streaming.materialize import follow_all

        for root, v in follow_all(spark, args.roots, table=args.table).items():
            print(f"{root}\t{'caught up' if v is None else f'committed v={v}'}")
    elif args.cmd == "status":
        from kafka_flow_spark.streaming.materialize import view_status

        downs = args.downstream.split(",") if args.downstream else None
        st = view_status(spark, args.root, downs)
        print(
            f"root={st['root']}\nkind={st['kind']}\tn_buckets={st['n_buckets']}\n"
            f"head=v{st['head']}\tbatch_id={st['head_batch_id']}\n"
            f"committed={st['committed']}"
        )
        for f in st["followers"]:
            if not f["follows_this_root"]:
                print(f"follower {f['root']}: DOES NOT FOLLOW this root")
            else:
                print(
                    f"follower {f['root']}: cursor=v{f['cursor']}\t"
                    f"versions_behind={f['versions_behind']}"
                )
        if st["min_follower_cursor"] is not None:
            print(
                f"min_follower_cursor=v{st['min_follower_cursor']}\t"
                f"(vacuum must keep back to it; older versions droppable)"
            )


if __name__ == "__main__":
    main()
