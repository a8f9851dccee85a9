"""Multi-executor correctness sweep: every registered query vs its
DuckDB oracle under ``local-cluster`` — REAL separate executor JVMs.

    python tools/run_cluster_parity.py                    # all queries
    python tools/run_cluster_parity.py --limit 20
    python tools/run_cluster_parity.py --names cosine_topk ivf_topk

Why this exists: ``local[32]`` runs executors as threads inside the
driver JVM, which silently forgives a whole class of cluster-only
bugs — closures that capture non-serializable state, Python kernels
that assume the driver's working directory or module path, broadcast
values mutated after broadcast, shuffle records whose equality depends
on JVM identity. ``local-cluster[W,C,M]`` launches W real worker JVMs
(C cores, M MB each): closures are actually serialized, shuffle and
broadcast actually cross process boundaries, and every pandas-UDF
kernel runs in an executor-spawned Python worker. Passing the full
oracle sweep here is the strongest in-container evidence that the
plans would behave on a multi-node cluster.

Outcome recorded in BENCH_SCALING.md (multi-executor shape proof).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local-cluster[2,8,4096]")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args()

    from radio_data_pipeline_spark.plans.registry import all_specs
    from radio_data_pipeline_spark.session import get_spark
    from oracle_harness import compare, duck_connection

    spark = get_spark("cluster-parity", master=args.master)
    ncores = spark.sparkContext.defaultParallelism
    print(f"master={args.master} defaultParallelism={ncores}",
          flush=True)

    specs = all_specs()
    names = args.names or list(specs)
    if args.limit:
        names = names[: args.limit]
    con = duck_connection(args.sf)

    failed, rows_only, t0 = [], 0, time.time()
    for i, name in enumerate(names):
        spec = specs[name]
        t = time.time()
        try:
            df = spec.fn(spark, args.sf)
            if spec.oracle is None:
                n = df.count()
                ok, detail = n >= 0, f"rows-only n={n}"
                rows_only += 1
            else:
                result = compare(df, con, spec.oracle)
                ok = (result["rows_match"] and result["cols_match"]
                      and result["values_match"])
                detail = "" if ok else str(
                    {k: v for k, v in result.items() if k != "first_diff"}
                ) + f" first_diff={result.get('first_diff')}"
        except Exception as e:  # noqa: BLE001 — sweep must finish
            ok, detail = False, f"EXC {type(e).__name__}: {e}"
        mark = "ok" if ok else "FAIL"
        print(f"[{i + 1}/{len(names)}] {name}: {mark} "
              f"({time.time() - t:.1f}s) {detail[:300]}", flush=True)
        if not ok:
            failed.append(name)

    summary = {
        "master": args.master, "sf": args.sf, "queries": len(names),
        "rows_only": rows_only, "failed": failed,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
