"""Property battery for the wave-5 operators: every distributed plan
is replayed against an independent brute-force / NumPy / pure-Python
reference on randomized inputs — the same double-check strategy the
segmentation operators use (tests/test_segmentation.py), guarding
semantics beyond the single synthetic corpus the DuckDB oracles see.
"""

from __future__ import annotations

import datetime as dt
import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from radio_data_pipeline_spark.functions.graph_ops import triangle_stats
from radio_data_pipeline_spark.plans.timeseries_extra import (
    type_islands,
    windowed_ewma,
)

# ------------------------------------------------------------- triangles

_edges_strategy = st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
        lambda p: (min(p), max(p))).filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=30)


@settings(max_examples=12, deadline=None)
@given(edges=_edges_strategy)
def test_triangle_stats_matches_bruteforce(spark, edges):
    und = spark.createDataFrame(
        [(int(u), int(v)) for u, v in sorted(edges)], "u long, v long")
    row = triangle_stats(und).collect()[0]

    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(1 for a, b, c in itertools.combinations(nodes, 3)
              if b in adj[a] and c in adj[a] and c in adj[b])
    wedges = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)

    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges
    if wedges:
        assert row["global_clustering"] == pytest.approx(
            3.0 * tri / wedges, abs=1e-6)


# ------------------------------------------------------------------ EWMA

_series_strategy = st.lists(
    st.tuples(st.integers(0, 120),
              st.floats(0.5, 1e6, allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=40, unique_by=lambda t: t[0])


@settings(max_examples=12, deadline=None)
@given(series=_series_strategy)
def test_windowed_ewma_matches_numpy(spark, series):
    base = dt.date(2024, 1, 1)
    rows = [(base + dt.timedelta(days=off), float(v)) for off, v in series]
    days = spark.createDataFrame(rows, "day date, rev double")
    got = {r["day"]: r["ewma"] for r in windowed_ewma(days).collect()}

    offs = np.array(sorted(o for o, _ in series))
    vals = np.array([v for _, v in sorted(series)])
    for i, o in enumerate(offs):
        mask = (offs >= o - 29) & (offs <= o)
        w = 0.9 ** (o - offs[mask])
        expect = float(np.sum(vals[mask] * w) / np.sum(w))
        day = base + dt.timedelta(days=int(o))
        assert got[day] == pytest.approx(round(expect, 4), abs=2e-4), \
            f"day offset {o}"


# --------------------------------------------------------------- islands

_events_strategy = st.lists(
    st.tuples(st.integers(0, 2),        # user
              st.sampled_from("abc")),  # type
    min_size=1, max_size=60)


@settings(max_examples=12, deadline=None)
@given(seq=_events_strategy)
def test_type_islands_matches_python(spark, seq):
    rows = [(int(user), t, i, i * 1000) for i, (user, t) in enumerate(seq)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, ts_us long")
    got = {r["event_type"]: r for r in type_islands(ev).collect()}

    runs: dict[str, list[int]] = {}
    by_user: dict[int, list[str]] = {}
    for user, t in seq:
        by_user.setdefault(user, []).append(t)
    for types in by_user.values():
        for t, grp in itertools.groupby(types):
            runs.setdefault(t, []).append(len(list(grp)))

    assert set(got) == set(runs)
    for t, lens in runs.items():
        assert got[t]["n_runs"] == len(lens)
        assert got[t]["max_run"] == max(lens)
        assert got[t]["runs_ge3"] == sum(1 for x in lens if x >= 3)
        assert got[t]["avg_run"] == pytest.approx(
            round(sum(lens) / len(lens), 6), abs=1e-6)


# ------------------------------------------------------------------ BM25

def test_bm25_matches_pure_python_reference(spark, sf_smoke):
    """Independent double-check of the registered BM25 query: a
    from-scratch pure-Python Okapi BM25 over the same sf0.001 corpus
    and the same tokenizer must produce the identical top-15."""
    from radio_data_pipeline_spark.plans.search_text import (
        _BM25_TERMS,
        _BM25_TOPK,
        bm25_keyword_topk,
    )
    got = [(r["doc_id"], r["bm25"])
           for r in bm25_keyword_topk(spark, sf_smoke).collect()]

    import duckdb
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lower(trim(coalesce(text,''))) FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')").fetchall()
    import re
    toks = {d: re.split(r"\s+", t) for d, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    df = {t: sum(1 for ws in toks.values() if t in ws) for t in _BM25_TERMS}
    scored = []
    for d, ws in toks.items():
        s = 0.0
        for t in _BM25_TERMS:
            tf = ws.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s > 0:
            scored.append((d, round(s, 6)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    assert got == scored[:_BM25_TOPK]


# -------------------------------------------------------------------- PQ

def test_pq_adc_recall_vs_exact_l2(spark, sf_dir):
    """The PQ codes are a lossy compression — measure the loss instead
    of asserting vibes: ADC top-10 must recover most of the EXACT
    L2 top-10 for the same query (recall@10), and the ADC estimate
    must correlate with the true distance ordering."""
    from pyspark.sql import functions as F
    from radio_data_pipeline_spark.plans.arrays import pq_adc_topk
    from radio_data_pipeline_spark.sources.parquet import load_table

    adc_ids = [r["vec_id"]
               for r in pq_adc_topk(spark, sf_dir).collect()]

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv"))
    exact = (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", F.aggregate(
            F.zip_with(F.col("embedding").cast("array<double>"),
                       F.col("qv"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x).alias("d2"))
        .orderBy("d2", "vec_id").limit(10).collect())
    exact_ids = [r["vec_id"] for r in exact]

    recall = len(set(adc_ids) & set(exact_ids)) / 10.0
    # deterministic corpus -> deterministic recall. The synthetic
    # embeddings are near-iid random — ANN's worst case (pairwise
    # distances concentrate, there is no cluster structure to exploit)
    # — so the measured recall is 0.4 with the 8x32 codebooks; the
    # floor asserts the encoding carries real signal (random codes
    # would give ~10/N = 0.02) without overclaiming on data that
    # fundamentally cannot support high ANN recall.
    assert recall >= 0.3, f"PQ recall@10 collapsed: {recall} " \
        f"(adc={adc_ids}, exact={exact_ids})"
    # the query's own vector must be the ADC argmin's neighborhood:
    # vec 0 reconstructs to its codebook cells, so it stays in the
    # returned top-10 unless quantization is broken
    assert 0 in adc_ids


# ----------------------------------------------------- integrity audit

def test_referential_audit_counts_move_under_fault_injection(
        spark, sf_smoke, tmp_path):
    """The audit's zero-violation report must be earned: corrupt a
    copy of the corpus (orphan lineitem + orphan order) and the
    corresponding counts must move by exactly the injected amounts."""
    import shutil

    import pyarrow.parquet as pq
    import pyarrow as pa

    from radio_data_pipeline_spark.plans.tpch_extra import (
        referential_integrity_audit,
    )

    for t in ("lineitem", "orders", "customer", "part", "nation"):
        shutil.copy(f"{sf_smoke}/{t}.parquet", tmp_path / f"{t}.parquet")

    li = pq.read_table(tmp_path / "lineitem.parquet")
    orphan = {c: [li[c][0].as_py()] for c in li.column_names}
    orphan["l_orderkey"] = [-999]           # no such order
    pq.write_table(
        pa.concat_tables([li, pa.table(orphan, schema=li.schema)]),
        tmp_path / "lineitem.parquet")

    od = pq.read_table(tmp_path / "orders.parquet")
    bad = {c: [od[c][0].as_py()] for c in od.column_names}
    bad["o_orderkey"] = [-1]
    bad["o_custkey"] = [-999]               # no such customer
    pq.write_table(
        pa.concat_tables([od, pa.table(bad, schema=od.schema)]),
        tmp_path / "orders.parquet")

    got = {r["check_name"]: r["n_violations"]
           for r in referential_integrity_audit(
               spark, str(tmp_path)).collect()}
    assert got["lineitem_without_order"] == 1
    assert got["order_without_customer"] == 1
    assert got["customer_without_nation"] == 0
    assert got["lineitem_without_part"] == 0


# ------------------------------------------- ANN recall, clustered corpus

def test_ann_recall_floor_on_clustered_corpus(spark):
    """BENCH_SCALING §8 measured the recall frontier on the driver's
    near-iid embeddings — ANN's worst case, where single-stage methods
    legitimately floor out. Real embedding corpora are clustered; this
    pins the frontier on a mixture-of-Gaussians corpus
    (sources/synthetic.make_clustered_embeddings) at two regimes:

    - well-separated (separation 4.0, noise 0.5 — the realistic
      shape): EVERY method must recover the exact top-10 nearly
      perfectly, because neighbors share a cluster and clusters share
      buckets/lists;
    - overlapping (separation 1.0, noise 1.0 — degrading toward iid):
      single-stage methods may floor, but the two-stage int8
      prefilter -> exact-rerank path MUST stay at recall 1.0 — the
      asserted production contract (the prefilter's top-100 always
      contains the true top-10 because int8 reconstruction error is
      tiny relative to any corpus geometry)."""
    import numpy as np

    from radio_data_pipeline_spark.functions.similarity import (
        cosine_similarity,
        cosine_topk,
        ivf_topk,
        lsh_bucket_topk,
    )
    from radio_data_pipeline_spark.plans.arrays import (
        _int8_affine,
        _int8_reconstruct,
    )
    from radio_data_pipeline_spark.sources.synthetic import (
        make_clustered_embeddings,
    )

    def frontier(separation, noise):
        vecs, _ = make_clustered_embeddings(
            separation=separation, noise=noise)
        n = len(vecs)
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>").cache()
        df.count()
        qv = vecs[0].tolist()
        exact = {r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()}

        def rec(rows):
            return len({r["vec_id"] for r in rows} & exact) / 10.0

        lsh = rec(lsh_bucket_topk(df, qv, k=10).collect())
        ivf = rec(ivf_topk(df, qv, k=10).collect())
        q = F.array(*[F.lit(v) for v in qv])
        cand = (_int8_affine(df)
                .select("vec_id", "v",
                        cosine_similarity(_int8_reconstruct(), q)
                        .alias("ca"))
                .orderBy(F.desc("ca"), F.asc("vec_id")).limit(100))
        rerank = rec(
            cand.select("vec_id",
                        cosine_similarity(F.col("v"), q).alias("c"))
            .orderBy(F.desc("c"), F.asc("vec_id")).limit(10).collect())
        df.unpersist()
        return lsh, ivf, rerank

    lsh, ivf, rerank = frontier(4.0, 0.5)
    assert lsh >= 0.9 and ivf >= 0.9, (
        f"single-stage ANN must work on separated clusters: "
        f"lsh={lsh} ivf={ivf}")
    assert rerank == 1.0

    lsh2, ivf2, rerank2 = frontier(1.0, 1.0)
    # single-stage may floor here (measured 0.1/0.1) — the contract
    # is the two-stage path
    assert rerank2 == 1.0, f"two-stage rerank floor broken: {rerank2}"


def test_multiprobe_schedule_properties():
    from radio_data_pipeline_spark.functions.similarity import (
        hyperplanes,
        multiprobe_buckets,
    )
    planes = hyperplanes(16, 6, seed=7)
    rng = np.random.default_rng(23)
    for _ in range(20):
        qv = [float(x) for x in rng.standard_normal(16)]
        sched = multiprobe_buckets(qv, planes, n_probes=4)
        assert len(sched) == 4 and len(set(sched)) == 4
        base = sched[0]
        # n_probes-1 <= n_planes: all probes are single-bit flips of
        # the base bucket (the SQL-oracle-expressible regime)
        for b in sched[1:]:
            diff = base ^ b
            assert diff != 0 and (diff & (diff - 1)) == 0
    # degenerate: 1 probe == just the base bucket
    assert len(multiprobe_buckets(qv, planes, n_probes=1)) == 1


def test_multiprobe_recall_dominates_single_probe(spark):
    """The point of multi-probe: at the same index (same planes), more
    probes can only widen the candidate set, so recall@10 vs exact is
    monotone in n_probes — and on a clustered corpus the 4-probe
    schedule must materially beat 1-probe where 1-probe is lossy."""
    from radio_data_pipeline_spark.functions.similarity import (
        cosine_topk,
        lsh_bucket_topk,
        lsh_multiprobe_topk,
    )
    from radio_data_pipeline_spark.sources.synthetic import (
        make_clustered_embeddings,
    )

    def frontier(separation, noise):
        vecs, _ = make_clustered_embeddings(separation=separation,
                                            noise=noise)
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(len(vecs))],
            "vec_id long, embedding array<double>").cache()
        df.count()
        qv = vecs[0].tolist()
        exact = {r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()}

        def rec(rows):
            return len({r["vec_id"] for r in rows} & exact) / 10.0

        r1 = rec(lsh_bucket_topk(df, qv, k=10, n_planes=6,
                                 seed=7).collect())
        pr = {t: rec(lsh_multiprobe_topk(df, qv, k=10, n_planes=6,
                                         n_probes=t, seed=7).collect())
              for t in (1, 2, 4, 8)}
        df.unpersist()
        return r1, pr

    # overlapping corpus (hard regime): monotonicity is the contract
    r1, pr = frontier(separation=1.0, noise=1.0)
    assert pr[1] == r1                       # 1-probe IS single-probe
    assert pr[1] <= pr[2] <= pr[4] <= pr[8]  # widening never loses
    # well-separated corpus (realistic shape): 8 of 64 buckets must
    # recover what single-probe already mostly finds — near-perfect
    r1s, prs = frontier(separation=4.0, noise=0.5)
    assert prs[1] == r1s
    assert prs[8] >= max(r1s, 0.9)
