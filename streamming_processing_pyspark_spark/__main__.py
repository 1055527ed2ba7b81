"""CLI entry point: run any registered query from the shell.

    python -m streamming_processing_pyspark_spark list
    python -m streamming_processing_pyspark_spark run hourly_counts
    python -m streamming_processing_pyspark_spark run q1_pricing_summary \
        --sf-dir /root/testdata/sf0.1 --limit 50
    python -m streamming_processing_pyspark_spark explain ngram_jaccard_pairs
    python -m streamming_processing_pyspark_spark oracle q3_top_orders
    python -m streamming_processing_pyspark_spark sql "SELECT count(*) FROM events"

The reference project is driven by four ad-hoc scripts; this gives the
whole registry (batch, streaming-drain and pipeline operators alike) one
uniform shell surface. `run` prints the result table; `explain` prints the
formatted physical plan (the scale-behavior evidence); `oracle` prints the
DuckDB parity SQL, or a note for rows-only operators.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="streamming_processing_pyspark_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered query names")

    run_p = sub.add_parser("run", help="run a registered query and print it")
    run_p.add_argument("name")
    run_p.add_argument("--sf-dir", default=None, help="test-table directory")
    run_p.add_argument("--limit", type=int, default=20, help="rows to show")

    ex_p = sub.add_parser("explain", help="print a query's physical plan")
    ex_p.add_argument("name")
    ex_p.add_argument("--sf-dir", default=None)

    or_p = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    or_p.add_argument("name")

    sql_p = sub.add_parser("sql", help="run SQL over the registered test views")
    sql_p.add_argument("statement")
    sql_p.add_argument("--sf-dir", default=None)
    sql_p.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from .engine import Engine

    if args.cmd == "oracle":  # no SparkSession needed
        from .registry import build_oracles

        sql = build_oracles().get(args.name)
        print(sql if sql else f"-- {args.name}: rows-only operator (no SQL oracle)")
        return 0
    if args.cmd == "list":  # no SparkSession needed
        from .registry import build_queries

        for name in sorted(build_queries()):
            print(name)
        return 0

    eng = Engine(sf_dir=getattr(args, "sf_dir", None))
    if args.cmd == "run":
        eng.query(args.name).show(args.limit, truncate=False)
    elif args.cmd == "explain":
        eng.query(args.name).explain("formatted")
    elif args.cmd == "sql":
        eng.tables()
        eng.sql(args.statement).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
