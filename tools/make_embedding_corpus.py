#!/usr/bin/env python
"""Build an embeddings-only high-entropy scale corpus: N per-copy
noised replicas of the driver-generated sf0.1 embeddings table
(2000 rows x 64-dim float), written as one parquet file with ~64k-row
row groups. Same noise recipe as make_scale_data._noise_embeddings
(copy 0 untouched; per-copy rng seed 1000+i; sigma = 5% of the base
values' std) so `.bench_scale/emb1m` (500 copies) is the N=500 point
of this family and a 10M-row corpus is N=5000.

The serving-scale studies (BENCH_SCALING §25c, §26) only need the
embeddings table — replicating documents/lineitem at 5000x through
make_scale_data would burn tens of GB for nothing.

Usage: python tools/make_embedding_corpus.py N out_dir
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")


def main() -> None:
    n = int(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)

    base = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = base.column("vec_id").to_numpy()
    labels = base.column("label").to_numpy()
    arr = base.column("embedding").combine_chunks()
    vals = arr.values.to_numpy(zero_copy_only=False)
    dim = len(vals) // base.num_rows
    sigma = 0.05 * float(vals.std() or 1.0)
    vtype = arr.values.type

    out = f"{out_dir}/embeddings.parquet"
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(vtype)),
                        ("label", pa.int32())])
    # 32 copies per row group: 64k rows, the multi-core-scan-friendly
    # layout make_scale_data documents
    group = 32
    writer = pq.ParquetWriter(out, schema)
    offsets = np.arange(0, (base.num_rows * group + 1) * dim, dim,
                        dtype=np.int64)
    for lo in range(0, n, group):
        copies = range(lo, min(lo + group, n))
        chunks_v, chunks_i = [], []
        for i in copies:
            if i == 0:
                chunks_v.append(vals)
            else:
                rng = np.random.default_rng(1000 + i)
                chunks_v.append(vals + rng.normal(0.0, sigma,
                                                  len(vals)))
            # dense sequential ids (copy i -> ids + i*2000), byte-
            # identical to the existing emb1m layout
            chunks_i.append(ids + i * base.num_rows)
        flat = np.concatenate(chunks_v).astype(
            vtype.to_pandas_dtype())
        nrows = len(chunks_i) * base.num_rows
        col = pa.ListArray.from_arrays(
            pa.array(offsets[:nrows + 1]), pa.array(flat, type=vtype))
        t = pa.table({"vec_id": pa.array(np.concatenate(chunks_i)),
                      "embedding": col,
                      "label": pa.array(np.tile(labels,
                                                len(chunks_i)))},
                     schema=schema)
        writer.write_table(t)
    writer.close()
    meta = pq.ParquetFile(out).metadata
    print(f"{out}: {meta.num_rows} rows, "
          f"{meta.num_row_groups} row groups, "
          f"{os.path.getsize(out) / 1e6:.0f} MB")


if __name__ == "__main__":
    main()
