#!/usr/bin/env python
"""Run any registered query from the command line and print its
result — the engine's ad-hoc entry point for users and debugging.

    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py minhash_lsh_pairs --sf-dir /root/testdata/sf0.1
    python tools/run_query.py --list
    python tools/run_query.py dedup_exact --oracle   # also run DuckDB oracle

With --oracle the query's DuckDB oracle runs on the same tables and
the row-count/schema/value comparison result is printed — the same
check as the driver's correctness gate.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20,
                    help="max rows to print (default 20)")
    ap.add_argument("--list", action="store_true",
                    help="list registered queries and exit")
    ap.add_argument("--oracle", action="store_true",
                    help="also run the DuckDB oracle and compare")
    args = ap.parse_args()

    from radio_data_pipeline_spark.plans.registry import all_specs

    specs = all_specs()
    if args.list or not args.name:
        for name in sorted(specs):
            kind = "oracle" if specs[name].oracle else "rows-only"
            print(f"{name:40s} {kind:9s} {', '.join(specs[name].tags)}")
        return
    if args.name not in specs:
        sys.exit(f"unknown query {args.name!r}; --list shows all "
                 f"{len(specs)} names")

    from radio_data_pipeline_spark.session import get_spark

    spark = get_spark("rdps-run-query")
    df = specs[args.name].fn(spark, args.sf_dir)
    df.show(args.limit, truncate=False)
    print(f"({df.count()} rows total)")

    if args.oracle and specs[args.name].oracle:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from oracle_harness import compare, duck_connection
        con = duck_connection(args.sf_dir)
        result = compare(df, con, specs[args.name].oracle)
        ok = result["values_match"]
        print("oracle:", "MATCH" if ok else f"MISMATCH {result}")
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
