"""CLI entry point: run declared queries from a shell, the way the
reference repo's scripts are invoked (``uv run delinquent_data_
submitters.py`` → ``python -m pmp_analytics_spark run delinquency_
notices``).

Commands:
    list                          all declared query names (one per line)
    run <query> [<query>...]      execute and print each result
    oracle <query>                print the query's DuckDB oracle SQL

Options:
    --sf-dir PATH   data directory (default $SPARK_GRAFT_SF_DIR or
                    /root/testdata/sf0.01)
    --limit N       rows to show per result (default 20)
    --csv PATH      write the (single) query's full result as one CSV
                    via the bounded single-file writer
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pmp_analytics_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    run = sub.add_parser("run")
    run.add_argument("queries", nargs="+")
    run.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    run.add_argument("--limit", type=int, default=20)
    run.add_argument("--csv")
    orc = sub.add_parser("oracle")
    orc.add_argument("query")
    args = parser.parse_args(argv)

    from pmp_analytics_spark.queries import all_oracles, all_queries

    registry = all_queries()
    if args.cmd == "list":
        for name in registry:
            print(name)
        return 0
    if args.cmd == "oracle":
        sql = all_oracles({args.query}).get(args.query)
        if sql is None:
            print(f"unknown or oracle-less query: {args.query}", file=sys.stderr)
            return 2
        print(sql.strip())
        return 0

    unknown = [q for q in args.queries if q not in registry]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        return 2
    if args.csv and len(args.queries) != 1:
        print("--csv takes exactly one query", file=sys.stderr)
        return 2

    from pmp_analytics_spark.session import get_spark

    spark = get_spark("cli")
    for name in args.queries:
        df = registry[name](spark, args.sf_dir)
        print(f"== {name}")
        df.show(args.limit, truncate=False)
        if args.csv:
            from pmp_analytics_spark.sources.writers import write_csv_single

            write_csv_single(df, args.csv)
            print(f"written: {args.csv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
