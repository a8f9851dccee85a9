"""Output dataset layout: partitioned parquet sinks and hash-sharded
training shards.

The reference's only sink is one SDFITS file per observation
(utils.py:216-237 -> sources/fits.py write_sdfits). An engine that
feeds 100 TB pipelines also needs to WRITE datasets whose layout the
next job can exploit:

- ``write_partitioned_dataset``: hive-style ``partitionBy`` layout so
  downstream readers get PARTITION PRUNING — a filter on the partition
  column skips whole directories at planning time (PartitionFilters in
  the scan, pinned by tests/test_layout.py), the coarsest and cheapest
  pruning level above row-group statistics.
- ``write_training_shards``: fixed number of hash-assigned shards with
  one file per shard — the layout training jobs consume (shard count
  == reader parallelism, assignment deterministic in the key so reruns
  and different engines produce byte-identical shard membership).

Scale notes: partitionBy shuffles nothing by itself — each task writes
one file per distinct partition value it holds, so low-cardinality
partition columns (event_type, lang, date) are the right choice and a
``repartition(partition_cols)`` beforehand collapses the
files-per-partition count to one per value. The shard writer's
repartition IS the shuffle, keyed on the deterministic shard id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


def _check_rank_keys(keyed, n_cols: int, who: str) -> int:
    """One count pass over the struct key that also validates it.

    NULL keys would NULL the bucket expression and the row would
    silently vanish through the inner offset join (N_out < N_in with
    no error). NaN float keys are just as fatal but subtler: the
    range boundaries are sampled to the DRIVER and sorted with
    Python's ``sorted()``, where every NaN comparison is False — the
    sort order and the ``v > boundaries[-1]`` dedup become
    ill-defined — while Spark's bucket expression orders NaN GREATER
    than everything, so a NaN-bearing key yields non-monotonic
    boundaries and silently wrong global ranks/tiles (r7 ADVICE).
    Both are rejected here, on the same single aggregation pass."""
    fields = keyed.schema["_gk"].dataType.fields
    float_js = [j for j in range(n_cols)
                if isinstance(fields[j].dataType,
                              (FloatType, DoubleType))]
    row = keyed.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count(F.col(f"_gk._gk{j}")).alias(f"n{j}")
          for j in range(n_cols)],
        *[F.count(F.when(F.isnan(F.col(f"_gk._gk{j}")), 1))
          .alias(f"nan{j}") for j in float_js]).collect()[0]
    n = row["n"]
    for j in range(n_cols):
        if row[f"n{j}"] != n:
            raise ValueError(
                f"{who} order column {j} has NULLs; a deterministic "
                "global rank requires non-null keys")
    for j in float_js:
        if row[f"nan{j}"]:
            raise ValueError(
                f"{who} order column {j} has NaNs; NaN has no "
                "consistent position in the driver-side boundary "
                "sort — filter or impute NaN keys first")
    return n


def dense_index(df: DataFrame, order_col: str, pos_col: str = "pos",
                n_buckets: int | None = None,
                boundary_sample_rows: int = 200,
                boundary_sample_cap: int = 100_000) -> DataFrame:
    """Append a dense 0..N-1 position column ordered by ``order_col``
    WITHOUT a single-task global sort.

    ``row_number().over(Window.orderBy(col))`` — the obvious spelling —
    plans an ``Exchange SinglePartition``: every row of the table moves
    to ONE task, which at a 100 TB corpus is a one-executor sort of the
    whole dataset (the same bottleneck class as a driver collect). This
    builder produces the identical result in bounded parallel stages:

    1. count N (column-pruned; parquet answers from footers),
    2. sample ~``n_buckets * boundary_sample_rows`` values of
       ``order_col`` to the driver and pick ``n_buckets - 1`` evenly
       spaced range boundaries (the ``repartitionByRange`` sampling
       trick, but with DETERMINISTIC bucket assignment: the bucket is a
       pure expression over the row, so re-evaluating the plan can
       never re-shuffle rows across buckets),
    3. count rows per bucket (tiny aggregate: ``n_buckets`` rows to the
       driver) and prefix-sum the offsets,
    4. per-bucket window ``row_number() - 1 + offset`` — partitioned by
       bucket, so the sort parallelism is ``n_buckets``, not 1.

    ``order_col`` must be UNIQUE (same contract as the global-window
    form: ties make row_number nondeterministic) and NON-NULL: a NULL
    makes the bucket expression NULL and the row would silently fall
    out of the inner offset join (N_out < N_in with no error), so it
    is rejected up front — the check rides the same count() pass.
    Works for any orderable type — boundaries are sampled values, not
    quantiles, so strings (file paths) work as well as longs (vec_id).

    ``boundary_sample_cap`` bounds the DRIVER-side boundary sample
    independently of ``n_buckets``: with shuffle.partitions tuned to
    cluster scale (10k+), n_buckets * boundary_sample_rows would be a
    multi-million-value collect. Boundaries from a fixed-size sample
    are coarser but remain valid — the builder's result is invariant
    to boundary placement (dedup/offset logic tolerates empty and
    merged buckets; only parallelism degrades, gracefully).

    The three build jobs each scan ONLY ``order_col``; the index is
    metadata, built once and reused across epochs. Replaces the
    unpartitioned window the round-4 review flagged at
    plans/arrays.py (negative sampling) and sources/fits.py (obs-id
    assignment).

    Implementation: the single-column 0-based case of
    ``global_row_number`` (ONE copy of the subtle two-pass machinery
    — boundary sampling, balanced-tree bucket expression, offset
    join; a fix to any of it lands in both names by construction).
    """
    try:
        out = global_row_number(
            df, [F.col(order_col)], rank_col=pos_col,
            n_buckets=n_buckets,
            boundary_sample_rows=boundary_sample_rows,
            boundary_sample_cap=boundary_sample_cap)
    except ValueError as e:
        raise ValueError(
            f"dense_index order column {order_col!r}: {e}") from e
    return out.withColumn(pos_col,
                          (F.col(pos_col) - 1).cast("long"))


def global_row_number(df: DataFrame, order_cols: list,
                      rank_col: str = "i",
                      n_buckets: int | None = None,
                      boundary_sample_rows: int = 200,
                      boundary_sample_cap: int = 100_000,
                      _n_rows: int | None = None) -> DataFrame:
    """Append a 1-based global row_number ordered by the COMPOSITE
    ascending key ``order_cols`` (list of Column expressions; wrap a
    descending numeric column as its negation) WITHOUT an Exchange
    SinglePartition — the multi-column generalization of
    ``dense_index``, sharing its deterministic-boundary design: the
    bucket is a pure expression over the row (boundaries are driver
    constants sampled once), so re-evaluating the plan can never
    re-shuffle rows across buckets the way ``repartitionByRange``'s
    per-RDD-id sampling can between the offset-count job and the
    final join.

    The composite key rides as ONE struct column (Spark orders
    structs lexicographically, exactly the multi-column ORDER BY),
    so boundary comparison, bucketing, and the per-bucket window all
    see the identical total order. The key must be NON-NULL and, for
    float/double columns, NaN-FREE (both checked on the same count
    pass — a NULL would NULL the bucket expression and the row would
    silently vanish through the inner offset join; a NaN breaks the
    driver-side boundary sort, see ``_check_rank_keys``)
    and SHOULD be unique: ties rank in an arbitrary order, exactly
    the caveat of the ``row_number().over(orderBy(...))`` window this
    replaces (uniqueness itself is NOT verified — an exact distinct
    count would double the key pass).

    This is the scale-correct spelling of every "rank the keyed
    aggregate globally" analytic (Gini, Pareto deciles, RFM scores):
    the obvious ``row_number().over(Window.orderBy(...))`` funnels
    the whole input through one task."""
    spark = df.sparkSession
    fields = [c.alias(f"_gk{j}") for j, c in enumerate(order_cols)]
    keyed0 = df.withColumn("_gk", F.struct(*fields))
    if _n_rows is None:
        n = _check_rank_keys(keyed0, len(order_cols),
                             "global_row_number")
    else:
        n = _n_rows
    if n == 0:
        return (df.withColumn(rank_col, F.lit(None).cast("long"))
                .limit(0))
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions",
                                       "200"))
    n_buckets = max(1, min(n_buckets, n))
    target_sample = min(n_buckets * boundary_sample_rows,
                        boundary_sample_cap)
    fraction = min(1.0, target_sample / n)
    sampled = sorted(
        tuple(r[0]) for r in
        keyed0.select("_gk").sample(False, fraction, seed=7).collect())
    boundaries = []
    for i in range(1, n_buckets):
        if not sampled:
            break
        v = sampled[(i * len(sampled)) // n_buckets]
        if not boundaries or v > boundaries[-1]:
            boundaries.append(v)

    def _lit_struct(vals):
        return F.struct(*[F.lit(v).alias(f"_gk{j}")
                          for j, v in enumerate(vals)])

    terms = [(F.col("_gk") > _lit_struct(b)).cast("int")
             for b in boundaries]
    # balanced-tree sum, NOT a left-deep chain: with cluster-scale
    # n_buckets (10k+) a chained `+` builds an expression tree 10k
    # deep and the JVM's recursive expression conversion overflows
    # its stack (found by the boundary-cap test at 2048 buckets);
    # pairwise reduction keeps depth at log2(B) for the same result
    while len(terms) > 1:
        terms = [terms[i] + terms[i + 1]
                 if i + 1 < len(terms) else terms[i]
                 for i in range(0, len(terms), 2)]
    bucket = terms[0] if terms else F.lit(0)
    keyed = keyed0.withColumn("_db", bucket.cast("int"))
    counts = dict(keyed.groupBy("_db").count().collect())
    offsets, acc = [], 0
    for b in range(len(boundaries) + 1):
        offsets.append((b, acc))
        acc += counts.get(b, 0)
    off_df = spark.createDataFrame(offsets, "_db int, _off long")
    from pyspark.sql import Window
    w = Window.partitionBy("_db").orderBy("_gk")
    return (
        keyed.join(F.broadcast(off_df), "_db")
        .withColumn(rank_col,
                    (F.col("_off") + F.row_number().over(w))
                    .cast("long"))
        .drop("_db", "_off", "_gk")
    )


def global_ntile(df: DataFrame, order_cols: list, n_tiles: int,
                 tile_col: str = "tile",
                 n_buckets: int | None = None) -> DataFrame:
    """SQL-exact ``ntile(n_tiles) OVER (ORDER BY order_cols)`` without
    the single-partition window: the global row number comes from the
    two-pass ``global_row_number`` builder, and the tile is the
    closed-form ntile definition over (i, n) — with n = q*n_tiles + r,
    the first r tiles hold q+1 rows and the rest q, so
    ``tile = ceil(i/(q+1))`` while i <= r*(q+1), else
    ``r + ceil((i - r*(q+1))/q)``. n is known driver-side from the
    builder's count pass, so the tile is a pure scalar expression —
    bit-identical to the window form on any unique total order."""
    fields = [c.alias(f"_gk{j}") for j, c in enumerate(order_cols)]
    n = _check_rank_keys(df.withColumn("_gk", F.struct(*fields)),
                         len(order_cols), "global_ntile")
    r = global_row_number(df, order_cols, rank_col="_gi",
                          n_buckets=n_buckets, _n_rows=n)
    if n == 0:
        return r.withColumn(tile_col, F.lit(None).cast("int")) \
                .drop("_gi")
    q, rem = divmod(n, n_tiles)
    i = F.col("_gi")
    if q == 0:
        tile = i  # n < n_tiles: first n tiles get one row each
    else:
        head = rem * (q + 1)
        tile = F.when(i <= head, F.ceil(i / F.lit(q + 1))) \
                .otherwise(rem + F.ceil((i - head) / F.lit(q)))
    return r.withColumn(tile_col, tile.cast("int")).drop("_gi")


def write_partitioned_dataset(df: DataFrame, path: str,
                              partition_cols: list[str],
                              coalesce_per_partition: bool = True,
                              max_records_per_file: int | None = None,
                              ) -> None:
    """Write `df` as a hive-partitioned parquet dataset.

    With ``coalesce_per_partition`` (default) the data is first
    hash-repartitioned on the partition columns so each partition
    value is written by one task -> one file (plus splits if
    ``max_records_per_file`` caps file size); without it, every task
    writes a file per value it happens to hold (small-file explosion
    at high task counts).
    """
    out = df.repartition(*partition_cols) if coalesce_per_partition else df
    writer = out.write.mode("overwrite").partitionBy(*partition_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def md5_prefix_long(key_col):
    """First 8 md5 hex digits of the stringified key as a LONG in
    [0, 2^32) — the ONE engine-portable uniform hash the repo keys
    determinism contracts on (shard membership, A-ES sampling u).
    DuckDB mirror: ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT.
    Changing the prefix width changes BOTH sides of every oracle that
    uses it — do it here or not at all."""
    return F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8),
                  16, 10).cast("long")


def shard_id(key_col: str, n_shards: int) -> F.Column:
    """Deterministic shard assignment: first 8 md5 hex digits of the
    key, mod n_shards. Engine-portable (any system with md5 reproduces
    the same membership) and uniform for any key distribution —
    unlike key % n, which inherits the key's own structure."""
    return (md5_prefix_long(F.col(key_col)) % n_shards).alias("shard")


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int = 8) -> None:
    """Write `df` as ``shard=K/`` hive directories, one file each,
    membership determined by ``shard_id(key_col, n_shards)``.

    ``repartition(n_shards, shard)`` is the single shuffle; each
    shard's rows land in exactly one task, so the output is one file
    per shard regardless of input parallelism. Readers point a whole
    training worker at one shard directory; `shard` being a partition
    column means per-worker reads prune to their directory at planning
    time.
    """
    sharded = df.withColumn("shard", shard_id(key_col, n_shards))
    (sharded.repartition(n_shards, F.col("shard"))
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def zorder_key(x: F.Column, y: F.Column, bits: int = 16) -> F.Column:
    """Morton (Z-order) key: interleave the low `bits` bits of two
    non-negative integer dimensions (x -> even bit positions, y ->
    odd), so sorting by the key clusters rows that are close in BOTH
    dimensions.

    Caller contract: dimensions MUST be non-negative — a negative
    value's two's-complement low bits mask to the TOP of the range,
    destroying locality (both engines agree bit-for-bit, so this is a
    layout-quality bug, not a correctness one). Offset signed
    dimensions first (subtract the per-dataset min, as
    zorder_locality_events does).

    This is the multi-dimensional data-skipping layout (Delta/Iceberg
    OPTIMIZE ZORDER): parquet row-group min/max stats only prune when
    a file's value range is narrow, and a sort on one column destroys
    locality in every other — the Z-curve trades a little range-width
    in each dimension for narrow ranges in all of them, so filters on
    EITHER (or both) dimensions skip files. Pure bit arithmetic —
    stays in whole-stage codegen, no UDF.
    """
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + (F.shiftright(xm, i).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * i)))
        out = out + (F.shiftright(ym, i).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * i + 1)))
    return out


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton key as portable SQL (DuckDB oracle side)."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({x} & {mask}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y} & {mask}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def write_zordered(df: DataFrame, path: str, x_col: F.Column,
                   y_col: F.Column, n_files: int = 16) -> None:
    """Write `df` Z-ordered on (x_col, y_col): range-partition by the
    Morton key into `n_files` contiguous curve segments, sort within
    each, write one file per segment.

    ``repartitionByRange`` samples the key distribution so segments
    are balanced by ROW COUNT (not key range) — skew in the dimensions
    does not skew file sizes. The in-file sort makes row-group stats
    monotone, so both file-level AND row-group-level pruning engage.
    """
    keyed = df.withColumn("zkey", zorder_key(x_col, y_col))
    (keyed.repartitionByRange(n_files, F.col("zkey"))
     .sortWithinPartitions("zkey")
     .write.mode("overwrite").parquet(path))


def overwrite_partitions(df: DataFrame, path: str,
                         partition_cols: list[str]) -> None:
    """Dynamic partition overwrite: replace ONLY the hive partitions
    present in `df`, leaving every other partition of the dataset
    untouched — the incremental-refresh primitive (recompute one day /
    one source / one event_type and swap it in atomically per
    partition) that turns the partitioned layout into an updatable
    table without a table format.

    Static overwrite (Spark's default) would truncate the WHOLE
    dataset first; ``partitionOverwriteMode=dynamic`` scopes the
    delete to partitions the job actually writes. At 100 TB this is
    the difference between rewriting a day and rewriting the lake.
    """
    (df.repartition(*partition_cols)
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(*partition_cols)
     .parquet(path))


def dataset_size_bytes(spark, path: str) -> int:
    """Total bytes of a dataset's data files via the Hadoop FileSystem
    API — scheme-agnostic (works on HDFS/S3/local alike), no driver
    download of any data."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_dataset(spark, path: str, out_path: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Rewrite a dataset into ~target-sized files; returns the file
    count written.

    Small files are the silent killer of scan parallelism economics:
    every file costs a task, a footer read, and an open per scan, so a
    day of streaming micro-batches (thousands of KB-sized files)
    makes downstream jobs scheduler-bound. Compaction = read, ONE
    round-robin repartition to ceil(total_bytes / target), write.
    Parquet re-encodes on write, so the task count is computed from
    input bytes as the available proxy; sorted layouts (e.g.
    write_zordered output) should re-sort instead via
    repartitionByRange on their key to preserve clustering.
    """
    total = dataset_size_bytes(spark, path)
    n_files = max(1, -(-total // target_file_bytes))
    (spark.read.parquet(path)
     .repartition(n_files)
     .write.mode("overwrite").parquet(out_path))
    return n_files
