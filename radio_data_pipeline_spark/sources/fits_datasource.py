"""`spark.read.format("sdfits")` — the FITS codec as a Spark 4 Python
DataSource (pyspark.sql.datasource), one input partition per file.

This is the idiomatic Spark-4 packaging of the reference's FITS scan
(S1): after `spark.dataSource.register(SdfitsDataSource)`, SDFITS
behaves like any built-in format —

    spark.read.format("sdfits").load("/data/obs/*.fits")

— with the decode running executor-side per partition (file), Arrow
batches feeding the JVM, and the canonical observation schema declared
up front so downstream pruning works. Complements read_sdfits
(sources/fits.py), which offers the same decode via binaryFile +
mapInPandas without requiring registration.
"""

from __future__ import annotations

import glob as _glob
from typing import Iterator, Sequence

import numpy as np

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

from radio_data_pipeline_spark.sources.fits import observation_struct_fields

SDFITS_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("obs_id", T.LongType()),
    T.StructField("row_idx", T.LongType()),
    *observation_struct_fields(),
])

_INT_COLS = {"IFNUM", "PLNUM", "CALSTATE", "SWPVALID"}


class _FilePartition(InputPartition):
    def __init__(self, path: str, obs_id: int):
        self.path = path
        self.obs_id = obs_id


class SdfitsReader(DataSourceReader):
    """Batch reader. Paths are resolved with local glob on the driver
    and opened directly on executors — suitable for local and shared
    (NFS-style) filesystems; for object stores (s3://, hdfs://) use
    read_sdfits (sources/fits.py), whose binaryFile scan goes through
    the Hadoop filesystem layer."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("sdfits source requires a path")
        self._files = sorted(_glob.glob(path))
        if not self._files:
            raise FileNotFoundError(f"no SDFITS files match {path!r}")

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per file; obs_id = dense index in sorted order
        # (deterministic, matches read_sdfits(dense_ids=True))
        return [_FilePartition(p, i) for i, p in enumerate(self._files)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # executor-side: decode one file with the pure-numpy codec
        return _decode_file(partition.path, partition.obs_id)


def _decode_file(path: str, obs_id: int) -> Iterator[tuple]:
    """Shared row decode for the batch and streaming readers."""
    from radio_data_pipeline_spark.sources.fits import parse_sdfits

    with open(path, "rb") as fh:
        obs = parse_sdfits(fh.read())
    t = obs.table
    names = [f.name for f in SDFITS_SCHEMA.fields[3:]]
    cols = []
    for name in names:
        if name in t.columns:
            col = t[name]
            if name in _INT_COLS:
                col = col.astype(int)
            cols.append(col.tolist())
        else:
            cols.append([None] * len(t))
    for i, row_vals in enumerate(zip(*cols)):
        vals = [
            [float(x) for x in v] if isinstance(v, (list, np.ndarray))
            else v
            for v in row_vals
        ]
        yield (path, obs_id, i, *vals)


def _path_obs_id(path: str) -> int:
    """Deterministic 63-bit observation id from the file path.

    Stable across micro-batches, checkpoint replay, and restarts with
    NO shared history — the property that lets the offset stay
    bounded. Same strategy as read_sdfits's default xxhash64(path)
    (different hash function only because that one is a JVM
    expression); ids are opaque stream keys, not cross-API values."""
    import hashlib

    digest = hashlib.md5(path.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big") & 0x7FFFFFFFFFFFFFFF


class SdfitsStreamReader(SimpleDataSourceStreamReader):
    """Streaming SDFITS ingest: each micro-batch picks up observation
    files that appeared under the glob since the last offset.

    Offset = modification-time watermark + frontier set, NOT the full
    consumed-path history, so its size is bounded by the files inside
    one grace window regardless of corpus size (pinned by
    tests/test_fits.py):

    - ``wm_floor``: every file with mtime strictly below this is
      consumed;
    - ``recent``: the consumed files with mtime >= wm_floor (the
      frontier — new files can still land inside the grace window with
      interleaving mtimes, e.g. clock skew between writers).

    consumed(offset) = {mtime < wm_floor} ∪ recent, so
    ``readBetweenOffsets`` replays exactly consumed(end) −
    consumed(start) from the listing — deterministic because obs_id is
    a pure path hash and files are immutable once they appear (the
    append-only contract every file stream source assumes).

    Paths are driver/executor-visible filesystem globs; for object
    stores use read_sdfits (binaryFile) instead."""

    #: files whose mtime is within this many seconds of the newest
    #: mtime stay in the frontier set — tolerance for writers whose
    #: clocks lag the newest file
    GRACE_S = 5.0

    def __init__(self, options: dict):
        self._glob = options.get("path")
        if not self._glob:
            raise ValueError("sdfits stream requires a path")
        self._grace = float(options.get("watermark_grace_s", self.GRACE_S))

    def _list(self) -> list[tuple[str, float]]:
        import os

        out = []
        for p in sorted(_glob.glob(self._glob)):
            try:
                out.append((p, os.stat(p).st_mtime))
            except OSError:
                continue  # listed-then-vanished race
        return out

    @staticmethod
    def _consumed(offset: dict, path: str, mtime: float) -> bool:
        return mtime < offset["wm_floor"] or path in set(offset["recent"])

    def initialOffset(self) -> dict:
        return {"wm_floor": -1.0, "recent": []}

    def read(self, start: dict):
        files = self._list()
        new = [p for p, mt in files if not self._consumed(start, p, mt)]
        rows: list = []
        for p in new:
            rows.extend(_decode_file(p, _path_obs_id(p)))
        if not files:
            return iter(rows), dict(start)
        wm = max(mt for _, mt in files)
        floor = wm - self._grace
        end = {"wm_floor": floor,
               "recent": sorted(p for p, mt in files if mt >= floor)}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list = []
        for p, mt in self._list():
            if self._consumed(end, p, mt) and \
                    not self._consumed(start, p, mt):
                rows.extend(_decode_file(p, _path_obs_id(p)))
        return iter(rows)


class SdfitsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sdfits"

    def schema(self) -> T.StructType:
        return SDFITS_SCHEMA

    def reader(self, schema: T.StructType) -> SdfitsReader:
        return SdfitsReader(self.options)

    def simpleStreamReader(self, schema: T.StructType) -> SdfitsStreamReader:
        return SdfitsStreamReader(self.options)


def register_sdfits(spark) -> None:
    """Make spark.read.format("sdfits") AND spark.readStream
    .format("sdfits") available on this session."""
    spark.dataSource.register(SdfitsDataSource)
