#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Measurement contract (both engines do the same work, transparently):

- **Full materialization.** Each Spark query is executed with a
  ``noop`` format write: every output column of the plan is computed
  and serialized by the executors, mirroring DuckDB's ``fetchall()``.
  (A bare ``.count()`` would let Catalyst prune unreferenced
  projections/sorts out of the measured plan — fixed per round-1
  advice.)
- **Steady-state = execution of the full physical plan.** The
  DataFrame for each query is constructed once (the prepared-statement
  analogue); each measured run then executes the complete physical
  plan — scan, shuffles, compute, materialization. One-time costs that
  a long-lived cluster amortizes — Python plan construction / Catalyst
  analysis (~0.1–1 s per query shape) and JVM whole-stage-codegen
  compilation — are NOT hidden: they are reported per query in
  ``plan_build`` and in ``cold_total`` (first-execution total
  including codegen).
- **Per-query baseline.** Each headline query's DuckDB oracle runs on
  the same parquet files, best-of-N like Spark (default N=5: with the
  first Spark run paying one-time JVM codegen, N=3 left the min over
  only two warm runs — too noisy under a 32-thread local scheduler;
  both engines get identical N), timed per query;
  the artifact carries ``duckdb_queries`` and ``vs_duckdb_per_query``,
  not just totals. Oracle failures are printed to stderr and recorded
  in ``oracle_errors`` instead of silently dropping the baseline.

Local-latency Spark settings (documented, env-overridable): at toy
scale the dominant cost is per-stage scheduling, so the bench session
sizes ``spark.sql.shuffle.partitions`` from the input bytes (one
partition per ~12 MB, clamped to [8, cpus]; sf0.1 resolves to 8, the
10× corpus to 16) and keeps AQE off — at sf0.1 every shuffle fits one
task-wave and AQE's per-stage replan rounds only add driver latency.
When AQE is enabled (``SPARK_GRAFT_BENCH_AQE=true``) the session pins
``coalescePartitions.minPartitionNum = cpus``, the measured mitigation
for AQE's byte-based coalescing collapsing CPU-dense/byte-light hash
kernels onto 1-2 cores (BENCH_SCALING.md finding 5). On a real cluster
(the engine's default `session.py`) AQE stays ON with the same guard;
these knobs are the standard input-size latency tuning, not a semantic
change — the plans are identical modulo partition count.
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median as _median

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AQE = os.environ.get("SPARK_GRAFT_BENCH_AQE", "false")


def _auto_shuffle_partitions(sf_dir: str, cpus: int) -> int:
    """Scale-aware shuffle-partition default (round-3, per scaling study).

    A fixed ``shuffle.partitions=8`` is the right latency knob at the
    driver's sf0.1 (~60 MB total: every shuffle fits one task-wave),
    but at the 10× corpus it schedules 1 M-row window sorts onto 8 of
    32 cores — exactly why ``events_asof_prior_view`` grew 2.8× for
    10× data in BENCH_SCALING.md. Sizing by input bytes is what AQE
    does on a real cluster; doing it here at plan time avoids AQE's
    byte-based-coalescing pitfall for CPU-dense/byte-light stages
    (BENCH_SCALING.md finding 5) while keeping the small-input
    latency behavior identical (sf0.1 still resolves to 8).
    """
    try:
        total = 0
        for entry in os.scandir(sf_dir):
            if entry.name.endswith(".parquet"):
                if entry.is_file():
                    total += entry.stat().st_size
                elif entry.is_dir():
                    for sub in os.scandir(entry.path):
                        if sub.is_file():
                            total += sub.stat().st_size
        # one partition per ~12 MB of input, clamped to [8, cpus]:
        # sf0.1 (~17 MB) resolves to 8, the 10x corpus (~190 MB) to 16
        # (measured best: 8 starves the 1 M-row window sorts, 24+
        # taxes the many tiny-shuffle queries with task overhead)
        return max(8, min(cpus, total // (12 << 20)))
    except OSError:
        return 8


_shuffle_env = os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "auto")
SHUFFLE = (str(_auto_shuffle_partitions(SF_DIR, CPUS))
           if _shuffle_env == "auto" else _shuffle_env)

# Headline set: the aggregation spine, the join pyramid, windows/
# sessionization (the O13 compilation idiom), array integrations,
# dedup, and similarity search — one per operator family.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "orders_rank_in_customer",
    "events_sessionize",
    "events_asof_prior_view",
    "vector_sum",
    "vector_elementwise_sum",
    "cosine_topk",
    "ivf_topk",
    "minhash_lsh_pairs",
    "dedup_exact",
    "simhash_docs",
    "pricing_cube",
    "events_tumbling_counts",
]
# Ad-hoc override for side studies (BENCH_SCALING addenda): a
# comma-separated query list. The recorded BENCH_r{N} artifacts always
# use the default set above for round-to-round comparability.
if os.environ.get("SPARK_GRAFT_BENCH_QUERIES"):
    HEADLINE = os.environ["SPARK_GRAFT_BENCH_QUERIES"].split(",")


def _materialize(df) -> None:
    """Execute the full plan: every output column computed + serialized.

    ``noop`` is Spark's built-in blackhole sink — rows are fully
    produced by the executors and discarded, with no driver collect
    overhead skewing the measurement toward Python.
    """
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from radio_data_pipeline_spark.plans.registry import all_queries
    from radio_data_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_BENCH", "1")
    spark = get_spark("rdps-bench")
    # Local-latency knobs (see module docstring). Runtime-settable.
    spark.conf.set("spark.sql.adaptive.enabled", AQE)
    spark.conf.set("spark.sql.shuffle.partitions", SHUFFLE)
    # Measured AQE mitigation (BENCH_SCALING.md finding 5): when AQE is
    # on, stop byte-based coalescing from collapsing CPU-dense but
    # byte-light stages (minhash/simhash) onto 1-2 cores.
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionNum", str(CPUS))
    queries = all_queries()

    # Warm-up: JVM + parquet footer reads, not measured.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # Optional page-cache pre-warm (SPARK_GRAFT_BENCH_PREWARM=1):
    # stream every table's bytes once before timing. At the gate
    # scale (~17 MB) this is a no-op; at the 19 GB 1000x corpus the
    # FIRST query otherwise eats the whole corpus' disk read inside
    # its best-of-N (measured: q1 34 s cold vs 5.7 s warm,
    # BENCH_SCALING.md §10) while later queries — and the DuckDB
    # pass, which always runs second — get warm reads for free. The
    # pre-warm makes the comparison IO-symmetric for both engines;
    # off by default so recorded BENCH_r{N} artifacts keep charging
    # cold costs honestly at the driver's scale.
    if os.environ.get("SPARK_GRAFT_BENCH_PREWARM") == "1":
        def _stream_file(path: str) -> None:
            with open(path, "rb", buffering=1 << 22) as f:
                while f.read(1 << 24):
                    pass

        for entry in sorted(os.scandir(SF_DIR), key=lambda e: e.name):
            if not entry.name.endswith(".parquet"):
                continue
            if entry.is_dir():
                # Spark-written dataset directory — os.walk, not one
                # scandir level, so nested layouts (partition subdirs
                # like shard=N/ or event_type=X/) are streamed too
                for root, dirs, names in sorted(os.walk(entry.path)):
                    dirs.sort()
                    for nm in sorted(names):
                        _stream_file(os.path.join(root, nm))
            else:
                _stream_file(entry.path)

    def _measure_spark() -> dict:
        """One full Spark measurement pass over HEADLINE (best-of-RUNS
        per query), loadavg-stamped — extracted so the cool-down retry
        below can run it twice."""
        load_start = tuple(round(v, 2) for v in os.getloadavg())
        if load_start[0] > 0.5:
            print(f"bench: NOTE ambient 1-min loadavg {load_start[0]} "
                  "> 0.5 at start — timings may be inflated by "
                  "background load", file=sys.stderr)
        timings: dict[str, float] = {}
        timings_median: dict[str, float] = {}
        timings_max: dict[str, float] = {}
        cold: dict[str, float] = {}
        build: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            build[name] = round(time.perf_counter() - t0, 3)
            runs = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                _materialize(df)
                runs.append(time.perf_counter() - t0)
            # first run pays JVM codegen compilation; in `cold`
            cold[name] = round(build[name] + runs[0], 3)
            timings[name] = round(min(runs), 3)
            timings_median[name] = round(_median(runs), 3)
            timings_max[name] = round(max(runs), 3)
            # free deferred build-time caches (global-rank builders)
            # so a custom SPARK_GRAFT_BENCH_QUERIES list can't
            # accumulate them
            from radio_data_pipeline_spark.plans.registry import (
                release_deferred)
            release_deferred()
        return {"timings": timings, "timings_median": timings_median,
                "timings_max": timings_max, "cold": cold,
                "build": build, "load_start": load_start,
                "total": round(sum(timings.values()), 3),
                "median_total": round(sum(timings_median.values()), 3)}

    # Cool-down retry (r10 VERDICT #8): a loaded start previously
    # still became the artifact of record (r10: 1.34x recorded at
    # loadavg 4.54 while the same tree measured 1.13x quiet). If the
    # first attempt both STARTED loaded (1-min load > 0.5) and SHOWS
    # the load signature (median_total / best-of-N total > 1.5), wait
    # a bounded cool-down and re-measure ONCE; the attempt with the
    # lower median_total (the robust statistic) is the reading of
    # record and the artifact stamps both attempts' summaries.
    # Disable with SPARK_GRAFT_BENCH_RETRY=0.
    attempts = [_measure_spark()]
    retry_on = os.environ.get("SPARK_GRAFT_BENCH_RETRY", "1") != "0"
    a0 = attempts[0]
    if (retry_on and a0["load_start"][0] > 0.5 and a0["total"] > 0
            and a0["median_total"] / a0["total"] > 1.5):
        cooldown = int(os.environ.get("SPARK_GRAFT_BENCH_COOLDOWN_S",
                                      "45"))
        print(f"bench: loaded start (loadavg {a0['load_start'][0]}) "
              f"with median/min spread "
              f"{a0['median_total'] / a0['total']:.2f}x — cooling "
              f"down {cooldown}s and re-measuring once",
              file=sys.stderr)
        time.sleep(cooldown)
        attempts.append(_measure_spark())
    rec = min(range(len(attempts)),
              key=lambda i: attempts[i]["median_total"])
    chosen = attempts[rec]
    timings = chosen["timings"]
    timings_median = chosen["timings_median"]
    timings_max = chosen["timings_max"]
    cold = chosen["cold"]
    build = chosen["build"]
    load_start = chosen["load_start"]

    # Same-machine baseline: run each headline query's DuckDB oracle
    # on the same parquet files, per query, best-of-RUNS like Spark.
    duckdb_timings: dict[str, float] = {}
    duckdb_timings_median: dict[str, float] = {}
    oracle_errors: dict[str, str] = {}
    try:
        import duckdb

        from radio_data_pipeline_spark.plans.registry import all_oracle_sql
        oracles = all_oracle_sql()

        def _fresh_con():
            c = duckdb.connect()
            for t in ("region", "nation", "customer", "supplier",
                      "part", "orders", "lineitem", "events",
                      "documents", "embeddings"):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                          f"read_parquet('{SF_DIR}/{t}.parquet')")
            return c

        con = _fresh_con()
        # optional per-query DuckDB time budget (seconds): a query
        # that exceeds it is interrupted and recorded as an
        # oracle_error (the honest DNF form — at the 19 GB corpus
        # some baselines spill unboundedly; see BENCH_SCALING §10).
        # 0 = no budget (the gate default).
        duck_budget = float(os.environ.get(
            "SPARK_GRAFT_BENCH_DUCKDB_TIMEOUT", "0"))
        if duck_budget > 0:
            import threading
        for name in HEADLINE:
            try:
                sql = oracles[name]
                runs = []
                for _ in range(RUNS):
                    timer = None
                    fired = None
                    if duck_budget > 0:
                        fired = threading.Event()

                        def _interrupt(c=con, ev=fired):
                            ev.set()
                            c.interrupt()

                        timer = threading.Timer(duck_budget, _interrupt)
                        timer.start()
                    try:
                        t0 = time.perf_counter()
                        con.execute(sql).fetchall()
                        runs.append(time.perf_counter() - t0)
                    finally:
                        if timer is not None:
                            timer.cancel()
                            if fired.is_set():
                                # the timer fired — possibly in the
                                # gap between query completion and
                                # cancel(); a pending interrupt would
                                # abort the NEXT execute and record a
                                # spurious oracle_error, so absorb it
                                # by rebuilding the connection
                                con = _fresh_con()
                duckdb_timings[name] = round(min(runs), 3)
                duckdb_timings_median[name] = round(_median(runs), 3)
            except Exception as exc:  # visible, but never fail the bench
                oracle_errors[name] = f"{type(exc).__name__}: {exc}"
                print(f"bench: duckdb oracle failed for {name}: {exc}",
                      file=sys.stderr)
    except Exception as exc:
        oracle_errors["__baseline__"] = f"{type(exc).__name__}: {exc}"
        print(f"bench: duckdb baseline unavailable: {exc}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "plan_build": build,
        "plan_build_total": round(sum(build.values()), 3),
        "cold_total": round(sum(cold.values()), 3),
        "runs_per_query": RUNS,
        "materialization": "noop-write (all output columns computed)",
        # per-query spread: `queries` stays best-of-N (the recorded
        # metric since r1); median/max expose run-to-run variance so
        # an ambient-load swing is visible inside ONE artifact
        "queries_median": timings_median,
        "queries_max": timings_max,
        "median_total": round(sum(timings_median.values()), 3),
        "loadavg_start": list(load_start),
        "loadavg_end": [round(v, 2) for v in os.getloadavg()],
    }
    if len(attempts) > 1:
        # both attempts' summaries + which one the artifact records
        out["retry"] = {
            "recorded_attempt": rec,
            "attempt_totals": [a["total"] for a in attempts],
            "attempt_median_totals": [a["median_total"]
                                      for a in attempts],
            "attempt_loadavg_start": [list(a["load_start"])
                                      for a in attempts],
        }
    if duckdb_timings:
        out["duckdb_baseline_total"] = round(sum(duckdb_timings.values()), 3)
        out["duckdb_queries"] = duckdb_timings
        out["duckdb_queries_median"] = duckdb_timings_median
        out["vs_duckdb_ratio"] = round(
            out["value"] / out["duckdb_baseline_total"], 2)
        # median-vs-median secondary ratio: under ambient load the
        # best-of-N min can be lucky on one engine and not the other;
        # a large min/median divergence IS the load signal. Both
        # sides sum the SAME query set — an oracle failure drops the
        # query from numerator and denominator alike, not just one
        duck_med_total = sum(duckdb_timings_median.values())
        spark_med_matched = sum(
            v for n, v in timings_median.items()
            if n in duckdb_timings_median)
        if duck_med_total:
            out["vs_duckdb_ratio_median"] = round(
                spark_med_matched / duck_med_total, 2)
        # matched-set best-of-N ratio: vs_duckdb_ratio's numerator is
        # the FULL suite total (the headline contract), so when any
        # oracle fails it and the median ratio compare different query
        # sets and their divergence stops being a load signal (r10
        # ADVICE). This ratio restricts the min numerator to the same
        # matched set the median ratio uses; matched_query_count makes
        # a set mismatch visible at a glance (== len(queries) when all
        # oracles ran).
        spark_min_matched = sum(
            v for n, v in timings.items() if n in duckdb_timings)
        out["vs_duckdb_ratio_matched_min"] = round(
            spark_min_matched / out["duckdb_baseline_total"], 2)
        out["matched_query_count"] = len(duckdb_timings)
        out["vs_duckdb_per_query"] = {
            n: round(timings[n] / duckdb_timings[n], 2)
            for n in timings if duckdb_timings.get(n)
        }
    if oracle_errors:
        out["oracle_errors"] = oracle_errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
