#!/usr/bin/env python
"""Build a scaled-up bench dataset by replicating the driver-generated
sf0.1 tables N times with per-copy ID offsets, for the bench-scaling
study (BENCH_SCALING.md): demonstrating that Spark's per-query
scheduling constant amortizes as data grows.

Design (documented so the study is reproducible and honest):
- Each copy i offsets every PRIMARY KEY and the FOREIGN KEYS that
  reference it by ``i * stride`` — copies are disjoint sub-databases,
  so joins stay semantically live (no empty-join shortcuts) and
  grouped results scale linearly.
- Dimension tables (region/nation/supplier/part) are NOT replicated —
  dimensions grow slower than facts in real deployments, and the
  un-offset FKs (l_partkey, l_suppkey, c_nationkey) keep pointing at
  them.
- documents/embeddings replicate with offset doc_id/vec_id and
  UNCHANGED payloads: the result is a mass-duplicate corpus (every doc
  has N exact copies) — the realistic web-crawl shape the dedup
  operators' bucket caps exist for.
- Output files are written with many row groups (~64k rows each) so a
  multi-core scan actually parallelizes — the single-row-group layout
  of the driver's small files is precisely the toy-scale artifact the
  study controls for.

Usage: python tools/make_scale_data.py [N] [out_dir] [--entropy]
Defaults: N=10, out_dir=/root/repo/.bench_scale/sf1
--entropy: high-entropy variant — per-copy noised embeddings and
per-copy-tagged document text (see _noise_embeddings/_tag_documents):
controls for the replicated corpus' ~9:1 parquet compression, which
is itself a measurement artifact for split-packing-sensitive studies.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

# table -> columns to offset, each by the named key-space stride
OFFSET_COLS: dict[str, list[tuple[str, str]]] = {
    "region": [],
    "nation": [],
    "supplier": [],
    "part": [],
    "customer": [("c_custkey", "custkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [("l_orderkey", "orderkey")],
    "events": [("event_id", "eventid"), ("user_id", "custkey")],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
}

REPLICATED = [t for t, cols in OFFSET_COLS.items() if cols]
DIMENSIONS = [t for t, cols in OFFSET_COLS.items() if not cols]


def strides() -> dict[str, int]:
    """One stride per key space: a round power of ten above the max
    observed key so offset copies can never collide."""
    out: dict[str, int] = {}
    maxes: dict[str, int] = {}
    for table, cols in OFFSET_COLS.items():
        if not cols:
            continue
        tbl = pq.read_table(f"{SRC}/{table}.parquet",
                            columns=[c for c, _ in cols])
        for col, space in cols:
            m = pc.max(tbl.column(col)).as_py() or 0
            maxes[space] = max(maxes.get(space, 0), int(m))
    for space, m in maxes.items():
        stride = 10
        while stride <= m:
            stride *= 10
        out[space] = stride
    return out


def _noise_embeddings(t: pa.Table, copy_i: int) -> pa.Table:
    """Per-copy deterministic Gaussian noise on every embedding value
    (sigma = 5% of the source values' std; copy 0 untouched). The
    high-entropy corpus variant: replicated-unchanged vectors
    compress ~9:1 in parquet, which packs whole bucket directories
    into a handful of splits and once produced a measured
    serial-probe artifact (BENCH_SCALING §19) — noised mantissas are
    incompressible, so scan/split behavior matches real embedding
    data. Cluster structure survives (noise << lobe separation), but
    cross-copy EXACT duplicates do not — this corpus measures the
    near-dup/semantic path, not the mass-exact-duplicate shape the
    default corpus models."""
    import numpy as np

    if copy_i == 0:
        return t
    idx = t.schema.get_field_index("embedding")
    arr = t.column(idx).combine_chunks()
    vals = arr.values.to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(1000 + copy_i)
    sigma = 0.05 * float(vals.std() or 1.0)
    noisy = pa.array(vals + rng.normal(0.0, sigma, len(vals)),
                     type=arr.values.type)
    col = pa.ListArray.from_arrays(arr.offsets, noisy)
    return t.set_column(idx, t.schema.field(idx), col)


def _tag_documents(t: pa.Table, copy_i: int) -> pa.Table:
    """Per-copy text prefix tag (copy 0 untouched): breaks cross-copy
    EXACT text duplication (and its parquet dictionary compression)
    while leaving every interior span duplicated — the high-entropy
    worst case for the span-level dedup study (§18)."""
    if copy_i == 0:
        return t
    idx = t.schema.get_field_index("text")
    tag = pa.array([f"[c{copy_i:03d}] "] * t.num_rows,
                   type=t.schema.field(idx).type)
    col = pc.binary_join_element_wise(tag, t.column(idx), "")
    return t.set_column(idx, t.schema.field(idx), col)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 10
    out_dir = args[1] if len(args) > 1 else "/root/repo/.bench_scale/sf1"
    entropy = "--entropy" in sys.argv
    os.makedirs(out_dir, exist_ok=True)
    st = strides()
    print(f"strides: {st}")

    for table in DIMENSIONS:
        tbl = pq.read_table(f"{SRC}/{table}.parquet")
        pq.write_table(tbl, f"{out_dir}/{table}.parquet")
        print(f"{table}: {tbl.num_rows} rows (dimension, 1 copy)")

    for table in REPLICATED:
        tbl = pq.read_table(f"{SRC}/{table}.parquet")
        total_rows = tbl.num_rows * n
        # row groups sized so BOTH engines parallelize the scan
        # (row group = the parallelism unit for Spark splits and
        # DuckDB alike): ~16+ groups per table, floor 1024 rows —
        # wide-array tables (embeddings) carry far more compute per
        # row than bytes, the same reason real vector stores pick
        # small row groups
        rg = max(1024, min(65536, total_rows // 16))
        # stream copy-by-copy through one ParquetWriter — at 100x the
        # concat-all-copies form holds ~6 GB of Arrow buffers for
        # lineitem alone; streaming holds one copy at a time
        # context manager: a failed copy write must still close the
        # handle (no fd leak, no silently-kept corrupt partial file
        # masquerading as a finished table)
        with pq.ParquetWriter(f"{out_dir}/{table}.parquet",
                              tbl.schema) as writer:
            for i in range(n):
                t = tbl
                for col, space in OFFSET_COLS[table]:
                    idx = t.schema.get_field_index(col)
                    shifted = pc.add(
                        t.column(col),
                        pa.scalar(i * st[space],
                                  type=t.schema.field(col).type))
                    t = t.set_column(idx, t.schema.field(col), shifted)
                if entropy and table == "embeddings":
                    t = _noise_embeddings(t, i)
                if entropy and table == "documents":
                    t = _tag_documents(t, i)
                writer.write_table(t, row_group_size=rg)
        f = pq.ParquetFile(f"{out_dir}/{table}.parquet")
        print(f"{table}: {total_rows} rows, "
              f"{f.metadata.num_row_groups} row groups")


def apply_skew(out_dir: str, hot_user_frac: float = 0.01,
               hot_vec_frac: float = 0.10,
               hot_doc_frac: float = 0.05) -> None:
    """Rewrite events/embeddings/documents in `out_dir` with one hot
    key each — the skewed-key stress corpus (BENCH_SCALING.md §12):

    - events: ~hot_user_frac of rows reassigned to ONE user_id — the
      sessionize/groupBy-hot-key shape AQE's skew handling exists for.
    - embeddings: ~hot_vec_frac of rows replaced with copies of ONE
      vector (distinct vec_id) — identical vectors share their LSH
      bucket under EVERY plane set, so one bucket holds the mass and
      the bucketed self-joins (near-dup, hard-negative mining) face a
      quadratic hot bucket unless capped/auto-scaled.
    - documents: ~hot_doc_frac of rows get ONE document's text — one
      hot MinHash band bucket (the cap/overflow path).

    In-memory pandas rewrite: the skew corpus exists at the 10x study
    scale (~1M events / 20k embeddings), far under memory; reuse the
    streaming writer path instead if ever applied at 100x+.
    """
    rg = 65536

    ev = pq.read_table(f"{out_dir}/events.parquet")
    df = ev.to_pandas()
    hot_user = int(df["user_id"].min())
    mask = (df["event_id"] % int(round(1 / hot_user_frac))) == 0
    df.loc[mask, "user_id"] = hot_user
    pq.write_table(pa.Table.from_pandas(df, schema=ev.schema,
                                        preserve_index=False),
                   f"{out_dir}/events.parquet", row_group_size=rg)
    print(f"events: hot user {hot_user} now owns "
          f"{int(mask.sum())}/{len(df)} rows")

    emb = pq.read_table(f"{out_dir}/embeddings.parquet")
    df = emb.to_pandas()
    hot_vec = df["embedding"].iloc[0]
    mask = (df["vec_id"] % int(round(1 / hot_vec_frac))) == 0
    df.loc[mask, "embedding"] = df.loc[mask, "embedding"].apply(
        lambda _: hot_vec)
    pq.write_table(pa.Table.from_pandas(df, schema=emb.schema,
                                        preserve_index=False),
                   f"{out_dir}/embeddings.parquet", row_group_size=rg)
    print(f"embeddings: hot bucket holds >= {int(mask.sum())}"
          f"/{len(df)} identical vectors")

    docs = pq.read_table(f"{out_dir}/documents.parquet")
    df = docs.to_pandas()
    hot_text = df["text"].iloc[0]
    mask = (df["doc_id"] % int(round(1 / hot_doc_frac))) == 0
    df.loc[mask, "text"] = hot_text
    pq.write_table(pa.Table.from_pandas(df, schema=docs.schema,
                                        preserve_index=False),
                   f"{out_dir}/documents.parquet", row_group_size=rg)
    print(f"documents: hot text on {int(mask.sum())}/{len(df)} docs")


if __name__ == "__main__":
    if "--skew-only" in sys.argv:
        # post-process an EXISTING scale dir in place:
        #   python tools/make_scale_data.py <dir> --skew-only
        apply_skew(sys.argv[1])
    else:
        main()
        if "--skew" in sys.argv:
            out = sys.argv[2] if len(sys.argv) > 2 and \
                not sys.argv[2].startswith("--") else \
                "/root/repo/.bench_scale/sf1"
            apply_skew(out)
