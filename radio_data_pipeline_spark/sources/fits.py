"""SDFITS ingest/egress without astropy: a minimal pure-NumPy FITS
binary-table codec plus the Spark binaryFile -> mapInPandas source.

Reference parity (SURVEY.md §2.1): S1 FITS scan (validate.py:18-23 —
fits.open into header + Table), S2 structural verify
(validate.py:20 — hdul.verify('exception'), e.g. a missing END card),
S3 FITS sink (utils.py:216-237 — PrimaryHDU + BinTableHDU writeto),
and O22 corruption injection (file_corruption.py:5-34 — drop the END
card so S2 must catch it).

Implements the FITS 4.0 subset SDFITS actually uses: 2880-byte
header/data blocks, 80-char cards, one PrimaryHDU (header only,
NAXIS=0) and one BINTABLE extension with TFORM codes L/B/I/J/K/E/D/A
and fixed repeat counts (vector 'nD' DATA column, fixed-width 'nA'
strings). Big-endian row-major data as the standard requires.

Scale design: files are decoded executor-side inside mapInPandas over
`spark.read.format("binaryFile")` — one task per file, no driver
bottleneck; a 100 TB corpus of observations parallelizes by file. The
decoded header travels as one JSON string per file (a few KB), not as
per-row columns.
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

BLOCK = 2880
CARD = 80

# Canonical Spark column name <-> FITS TTYPE (only names that differ)
_FITS_NAME = {"DATE_OBS": "DATE-OBS"}
_CANON_NAME = {v: k for k, v in _FITS_NAME.items()}


class FitsFormatError(ValueError):
    """Structural FITS violation — the S2 verify('exception') analogue."""


# --------------------------------------------------------------------------
# Header cards
# --------------------------------------------------------------------------

def _format_card(key: str, value, comment: str = "") -> bytes:
    k = key.upper().ljust(8)[:8]
    if value is None:  # commentary-style bare keyword
        return (k + " " * 72).encode("ascii")
    if isinstance(value, bool):
        v = ("T" if value else "F").rjust(20)
    elif isinstance(value, int):
        v = str(value).rjust(20)
    elif isinstance(value, float):
        v = repr(value).rjust(20)
    else:
        s = str(value).replace("'", "''")
        v = "'" + s.ljust(8) + "'"
    card = f"{k}= {v}"
    if comment:
        card += f" / {comment}"
    if len(card) > CARD:
        raise FitsFormatError(f"card too long: {key}")
    return card.ljust(CARD).encode("ascii")


def _history_card(text: str) -> bytes:
    return ("HISTORY " + text[: CARD - 8]).ljust(CARD).encode("ascii")


_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([ED][+-]?\d+)?$", re.I)


def _parse_value(raw: str):
    raw = raw.strip()
    if raw.startswith("'"):
        # quoted string; '' escapes a quote
        end = 1
        while True:
            try:
                end = raw.index("'", end)
            except ValueError:
                raise FitsFormatError(
                    f"unterminated quoted header value: {raw!r}") from None
            if raw[end + 1: end + 2] == "'":
                end += 2
                continue
            break
        return raw[1:end].replace("''", "'").rstrip()
    # strip trailing comment
    if "/" in raw:
        raw = raw.split("/", 1)[0].strip()
    if raw == "T":
        return True
    if raw == "F":
        return False
    if _NUM_RE.match(raw):
        f = float(raw.upper().replace("D", "E"))
        return int(f) if f.is_integer() and "." not in raw \
            and "E" not in raw.upper() else f
    return raw


def parse_header(buf: bytes, offset: int = 0,
                 ) -> tuple[dict, list[str], int]:
    """Parse one header unit starting at `offset`. Returns
    (cards, history, offset_after_header). Raises FitsFormatError if
    the END card is missing before EOF — the corruption the reference's
    verify step must catch (file_corruption.py drops END)."""
    cards: dict = {}
    history: list[str] = []
    pos = offset
    while True:
        if pos + BLOCK > len(buf):
            raise FitsFormatError(
                f"header starting at byte {offset} has no END card "
                "(truncated or corrupted file)")
        block = buf[pos: pos + BLOCK]
        pos += BLOCK
        for i in range(0, BLOCK, CARD):
            card = block[i: i + CARD].decode("ascii", errors="replace")
            key = card[:8].rstrip()
            if key == "END":
                return cards, history, pos
            if key == "HISTORY":
                history.append(card[8:].rstrip())
            elif key in ("COMMENT", ""):
                continue
            elif card[8:10] == "= ":
                cards[key] = _parse_value(card[10:])


# --------------------------------------------------------------------------
# Binary table codec
# --------------------------------------------------------------------------

_TFORM_RE = re.compile(r"^(\d*)([LBIJKEDA])$")
_TYPE_NP = {"L": ">u1", "B": ">u1", "I": ">i2", "J": ">i4", "K": ">i8",
            "E": ">f4", "D": ">f8"}

def _tform_dtype(tform: str) -> tuple[str, int, object]:
    m = _TFORM_RE.match(tform.strip().upper())
    if not m:
        raise FitsFormatError(f"unsupported TFORM {tform!r}")
    rep = int(m.group(1) or 1)
    code = m.group(2)
    if code == "A":
        return code, rep, f"S{rep}"
    np_t = _TYPE_NP[code]
    return code, rep, (np_t if rep == 1 else (np_t, (rep,)))


def _req(cards: dict, key: str):
    """Required card lookup with STRUCTURED failure: a corrupted or
    missing keyword must surface as FitsFormatError (the type the
    permissive scan's quarantine routes on), never a raw KeyError —
    found by the byte-mutation fuzz (tests/test_fits.py)."""
    try:
        return cards[key]
    except KeyError:
        raise FitsFormatError(f"required card {key} missing or "
                              "corrupted") from None


def _req_int(cards: dict, key: str) -> int:
    """Required integer card; non-numeric corruption -> FitsFormatError
    (int('!  0') was escaping as ValueError before the fuzz). The
    value must BE an integer, not merely coerce to one: a corrupted
    NAXIS2 of '5.9' would int() to 5 and silently DROP a table row
    (round-4 review repro), so any float/bool/string here is
    structural corruption."""
    v = _req(cards, key)
    if isinstance(v, bool) or not isinstance(v, int):
        raise FitsFormatError(
            f"card {key} is not an integer: {v!r}")
    return v


def _table_dtype(cards: dict) -> tuple[np.dtype, list[tuple[str, str, int]]]:
    tfields = _req_int(cards, "TFIELDS")
    if not 0 < tfields <= 999:  # FITS limit; also bounds corrupt blowup
        raise FitsFormatError(f"implausible TFIELDS {tfields}")
    meta = []
    seen: set[str] = set()
    for i in range(1, tfields + 1):
        name = str(_req(cards, f"TTYPE{i}")).strip()
        if not name:
            # A corrupt card like `TTYPE2 = /TSYS'` decodes to an empty
            # value ('/' starts a FITS comment). np.dtype silently
            # auto-names the field ('f1'), so the later arr[""] lookup
            # raises a raw ValueError past the quarantine contract.
            raise FitsFormatError(f"empty column name in TTYPE{i}")
        if not all(32 <= ord(c) < 127 for c in name):
            raise FitsFormatError(
                f"non-printable-ASCII column name in TTYPE{i}: {name!r}")
        if name in seen:
            # np.dtype would raise a raw ValueError ('field occurs
            # more than once') — keep the structured-rejection contract
            raise FitsFormatError(f"duplicate column name {name!r}")
        seen.add(name)
        code, rep, _ = _tform_dtype(str(_req(cards, f"TFORM{i}")))
        meta.append((name, code, rep))
    spec = []
    for (name, code, rep) in meta:
        if code == "A":
            spec.append((name, f"S{rep}"))
        elif rep == 1:
            spec.append((name, _TYPE_NP[code]))
        else:
            spec.append((name, _TYPE_NP[code], (rep,)))
    dt = np.dtype(spec)
    return dt, meta


def parse_bintable(buf: bytes, cards: dict, offset: int) -> pd.DataFrame:
    """Decode the BINTABLE data unit at `offset` into a DataFrame
    (vector columns become per-row lists)."""
    if str(cards.get("XTENSION", "")).strip() != "BINTABLE":
        raise FitsFormatError("expected BINTABLE extension")
    naxis1, naxis2 = _req_int(cards, "NAXIS1"), _req_int(cards, "NAXIS2")
    if naxis1 < 0 or naxis2 < 0:
        raise FitsFormatError(
            f"negative table dimensions: NAXIS1={naxis1} NAXIS2={naxis2}")
    dt, meta = _table_dtype(cards)
    if dt.itemsize != naxis1:
        raise FitsFormatError(
            f"row width mismatch: TFORMs give {dt.itemsize} bytes, "
            f"NAXIS1={naxis1}")
    need = naxis1 * naxis2
    if offset + need > len(buf):
        raise FitsFormatError("binary table data truncated")
    arr = np.frombuffer(buf, dtype=dt, count=naxis2, offset=offset)
    out: dict = {}
    for name, code, rep in meta:
        col = arr[name]
        canon = _CANON_NAME.get(name, name)
        if code == "A":
            try:
                out[canon] = [v.decode("ascii").rstrip() for v in col]
            except UnicodeDecodeError:
                raise FitsFormatError(
                    f"non-ASCII bytes in string column {canon}"
                ) from None
        elif code == "L":
            # FITS logicals are ASCII 'T'/'F' bytes (0x54/0x46), not
            # 0/1 — `!= 0` would decode every 'F' as True
            out[canon] = (col == ord("T")) if rep == 1 else \
                [list(v == ord("T")) for v in col]
        elif rep == 1:
            out[canon] = col.astype(col.dtype.newbyteorder("="))
        else:
            native = col.astype(col.dtype.newbyteorder("="))
            out[canon] = [v.tolist() for v in native]
    return pd.DataFrame(out)


@dataclass
class FitsObservation:
    header: dict
    history: list[str]
    table: pd.DataFrame


def _parse_headers(buf: bytes) -> tuple[dict, list[str], dict, int]:
    """Parse primary + extension headers only; returns (primary,
    history, ext_cards, data_offset) without touching the data unit."""
    primary, history, pos = parse_header(buf, 0)
    if primary.get("SIMPLE") is not True:
        raise FitsFormatError("primary header missing SIMPLE = T")
    # primary data unit (NAXIS=0 for SDFITS -> zero bytes)
    naxis = _req_int(primary, "NAXIS") if "NAXIS" in primary else 0
    if not 0 <= naxis <= 999:
        raise FitsFormatError(f"implausible NAXIS {naxis}")
    if naxis:
        size = abs(_req_int(primary, "BITPIX")) // 8
        for i in range(1, naxis + 1):
            dim = _req_int(primary, f"NAXIS{i}")
            if dim < 0:
                # a negative dim makes the computed data-unit size
                # negative and walks `pos` BACKWARD into the already-
                # parsed header (same corrupt-input loop class as the
                # BINTABLE/Y4M guards)
                raise FitsFormatError(
                    f"negative primary NAXIS{i} {dim}")
            size *= dim
        pos += math.ceil(size / BLOCK) * BLOCK
    ext, ext_hist, pos = parse_header(buf, pos)
    return primary, history + ext_hist, ext, pos


def parse_sdfits(buf: bytes) -> FitsObservation:
    """S1+S2: parse and structurally verify one SDFITS byte string."""
    primary, history, ext, pos = _parse_headers(buf)
    table = parse_bintable(buf, ext, pos)
    return FitsObservation(header=primary, history=history, table=table)


def parse_sdfits_headers_only(buf: bytes) -> tuple[dict, list[str]]:
    """Header + HISTORY without decoding the binary table — the cheap
    path for metadata scans (a few KB of cards vs the full data unit).
    Still verifies END cards and the row-width/TFORM consistency."""
    primary, history, ext, _pos = _parse_headers(buf)
    dt, _meta = _table_dtype(ext)
    if dt.itemsize != _req_int(ext, "NAXIS1"):
        raise FitsFormatError("row width mismatch in extension header")
    return primary, history


# --------------------------------------------------------------------------
# Writer (S3) + corruption (O22)
# --------------------------------------------------------------------------

def _pad_block(b: bytes, fill: bytes = b"\x00") -> bytes:
    rem = len(b) % BLOCK
    return b if rem == 0 else b + fill * (BLOCK - rem)


def _header_bytes(cards: list[bytes]) -> bytes:
    return _pad_block(b"".join(cards) + b"END".ljust(CARD),
                      fill=b" ")


def write_sdfits(table: pd.DataFrame, header: dict | None = None,
                 history: list[str] | None = None) -> bytes:
    """S3 sink: canonical observation rows -> SDFITS bytes
    (PrimaryHDU header-only + one BINTABLE). Column FITS types are
    inferred: float64 -> D, int -> J, str -> nA (max width), list of
    float -> nD."""
    header = header or {}
    history = history or []
    prim = [_format_card("SIMPLE", True, "conforms to FITS standard"),
            _format_card("BITPIX", 8),
            _format_card("NAXIS", 0),
            _format_card("EXTEND", True)]
    for k, v in header.items():
        prim.append(_format_card(k, v))
    prim.extend(_history_card(h) for h in history)

    spec: list[tuple] = []      # numpy dtype spec
    tforms: list[tuple[str, str]] = []
    arrays: dict[str, np.ndarray] = {}
    for col in table.columns:
        fits_name = _FITS_NAME.get(col, col)
        s = table[col]
        first = s.iloc[0] if len(s) else None
        if isinstance(first, (list, np.ndarray)):
            rep = len(first)
            arrays[col] = np.asarray(
                [np.asarray(v, dtype=">f8") for v in s], dtype=">f8")
            spec.append((col, ">f8", (rep,)))
            tforms.append((fits_name, f"{rep}D"))
        elif pd.api.types.is_bool_dtype(s):
            # FITS logical 'L': one ASCII 'T'/'F' byte per value —
            # without this branch bools fall into the string branch
            # and round-trip as 'True'/'False' 5A strings
            arrays[col] = np.where(s.to_numpy(dtype=bool),
                                   ord("T"), ord("F")).astype(">u1")
            spec.append((col, ">u1"))
            tforms.append((fits_name, "L"))
        elif pd.api.types.is_float_dtype(s):
            arrays[col] = s.to_numpy(dtype=">f8")
            spec.append((col, ">f8"))
            tforms.append((fits_name, "D"))
        elif pd.api.types.is_integer_dtype(s):
            # 64-bit columns write as 'K' — an unconditional >i4 cast
            # would silently wrap values above 2**31-1
            if s.to_numpy().dtype.itemsize > 4:
                arrays[col] = s.to_numpy(dtype=">i8")
                spec.append((col, ">i8"))
                tforms.append((fits_name, "K"))
            else:
                arrays[col] = s.to_numpy(dtype=">i4")
                spec.append((col, ">i4"))
                tforms.append((fits_name, "J"))
        else:
            if pd.api.types.is_datetime64_any_dtype(s):
                # ISO-8601 with 'T' (SDFITS DATE-OBS convention);
                # keep fractional seconds when any timestamp has them,
                # NaT -> empty string (strftime would yield float NaN
                # and break the width computation)
                frac = (s.dt.microsecond.fillna(0) != 0).any()
                fmt = "%Y-%m-%dT%H:%M:%S.%f" if frac \
                    else "%Y-%m-%dT%H:%M:%S"
                vals = s.dt.strftime(fmt).fillna("").tolist()
            else:
                vals = ["" if v is None else str(v) for v in s]
            width = max((len(v) for v in vals), default=1) or 1
            arrays[col] = np.asarray(vals, dtype=f"S{width}")
            spec.append((col, f"S{width}"))
            tforms.append((fits_name, f"{width}A"))
    dt = np.dtype(spec)
    rec = np.zeros(len(table), dtype=dt)
    for col in table.columns:
        rec[col] = arrays[col]

    ext = [_format_card("XTENSION", "BINTABLE", "binary table extension"),
           _format_card("BITPIX", 8),
           _format_card("NAXIS", 2),
           _format_card("NAXIS1", dt.itemsize),
           _format_card("NAXIS2", len(table)),
           _format_card("PCOUNT", 0),
           _format_card("GCOUNT", 1),
           _format_card("TFIELDS", len(tforms))]
    for i, (name, tform) in enumerate(tforms, start=1):
        ext.append(_format_card(f"TTYPE{i}", name))
        ext.append(_format_card(f"TFORM{i}", tform))

    return (_header_bytes(prim) + _header_bytes(ext)
            + _pad_block(rec.tobytes()))


def write_sdfits_per_observation(df, out_dir: str,
                                 header: dict | None = None,
                                 history: list[str] | None = None,
                                 order_col: str = "row_idx"):
    """Distributed S3 sink: one SDFITS file per observation stream,
    encoded and written executor-side (groupBy stream ->
    applyInPandas), so a million-observation export never funnels
    through the driver. Returns a DataFrame (obs_id, IFNUM, PLNUM,
    path, n_rows) of what was written.

    Files land as <out_dir>/obs<id>_if<i>_pl<p>.fits; out_dir must be
    a filesystem visible to the executors (shared mount in cluster
    mode). Each file is written to a task-unique temp name and
    os.rename'd into place, so task retries/speculation never leave a
    torn file at the final path. NOTE the returned manifest is lazy —
    every action re-runs the writes (idempotent thanks to the atomic
    rename); call .collect() once and reuse."""
    import os

    import pandas as pd  # noqa: F811
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("obs_id", T.LongType()),
        T.StructField("IFNUM", T.IntegerType()),
        T.StructField("PLNUM", T.IntegerType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_rows", T.LongType()),
    ])
    data_cols = [c for c in df.columns
                 if c not in ("path", "corrupt_error", "obs_id")]

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        obs_id = int(pdf["obs_id"].iloc[0])
        ifnum = int(pdf["IFNUM"].iloc[0])
        plnum = int(pdf["PLNUM"].iloc[0])
        path = os.path.join(out_dir,
                            f"obs{obs_id}_if{ifnum}_pl{plnum}.fits")
        buf = write_sdfits(pdf[data_cols].reset_index(drop=True),
                           header, history)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(buf)
        os.rename(tmp, path)  # atomic on the same filesystem
        return pd.DataFrame([{
            "obs_id": obs_id, "IFNUM": ifnum, "PLNUM": plnum,
            "path": path, "n_rows": len(pdf),
        }])

    os.makedirs(out_dir, exist_ok=True)
    return (df.groupBy("obs_id", "IFNUM", "PLNUM")
            .applyInPandas(write_group, schema=schema))


def corrupt_drop_end(buf: bytes) -> bytes:
    """O22 (file_corruption.py:5-34): blank the primary header's END
    card so parse_sdfits must raise FitsFormatError."""
    out = bytearray(buf)
    pos = 0
    while pos + BLOCK <= len(out):
        for i in range(pos, pos + BLOCK, CARD):
            # match the true END card (keyword field is 'END' padded
            # with spaces), not any ENDxxx data keyword — otherwise
            # the injector blanks a harmless card and the corruption
            # test silently stops exercising the verify path
            if bytes(out[i: i + 8]).rstrip() == b"END":
                out[i: i + CARD] = b" " * CARD
                return bytes(out)
        pos += BLOCK
    raise FitsFormatError("no END card found to corrupt")


# --------------------------------------------------------------------------
# Spark source
# --------------------------------------------------------------------------

def observation_struct_fields():
    """The canonical observation columns (SURVEY.md §1.4) as Spark
    StructFields — the single source of truth shared by read_sdfits
    and the 'sdfits' DataSource so the two readers cannot drift."""
    from pyspark.sql import types as T
    return [
        T.StructField("DATE_OBS", T.StringType()),
        T.StructField("DATA", T.ArrayType(T.DoubleType())),
        T.StructField("IFNUM", T.IntegerType()),
        T.StructField("PLNUM", T.IntegerType()),
        T.StructField("CALSTATE", T.IntegerType()),
        T.StructField("SWPVALID", T.IntegerType()),
        T.StructField("OBSMODE", T.StringType()),
        T.StructField("ELEVATIO", T.DoubleType()),
        T.StructField("TAMBIENT", T.DoubleType()),
        T.StructField("PRESSURE", T.DoubleType()),
        T.StructField("HUMIDITY", T.DoubleType()),
        T.StructField("TSYS", T.DoubleType()),
        T.StructField("TCAL", T.DoubleType()),
        T.StructField("DURATION", T.DoubleType()),
        T.StructField("EXPOSURE", T.DoubleType()),
    ]


def _zero_length_files(spark, path_glob: str) -> list[str]:
    """Paths of 0-byte files the glob matches (one directory level,
    matching binaryFile's non-recursive default). Spark's file scan
    plans NO splits for zero-length files, so a file truncated to 0
    bytes — truncation's limit case, found by the round-11 scan-level
    Hypothesis fuzz — never reaches the decode task: without this
    listing it silently vanishes from the corpus scan in BOTH modes
    (no tombstone, no failfast error — silent data loss). Driver-side
    and metadata-only: one Hadoop globStatus over the same pattern the
    datasource resolves (FileStatus.getLen, no file reads), the same
    class of work InMemoryFileIndex already does to plan the scan."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path_glob)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    out = []
    for s in (fs.globStatus(jpath) or []):
        if s.isFile():
            if s.getLen() == 0:
                out.append(fs.makeQualified(s.getPath()).toString())
        elif s.isDirectory():
            for c in fs.listStatus(s.getPath()):
                if c.isFile() and c.getLen() == 0:
                    out.append(
                        fs.makeQualified(c.getPath()).toString())
    return sorted(out)


def _empty_file_verdict() -> str:
    """The codec's own FitsFormatError message for b'' — the
    tombstone for a zero-length file carries the exact verdict
    parse_sdfits would have produced had the scan delivered it."""
    try:
        parse_sdfits(b"")
    except FitsFormatError as exc:
        return str(exc)
    raise AssertionError(
        "parse_sdfits accepted a zero-length file")  # pragma: no cover


def read_sdfits(spark, path_glob: str, dense_ids: bool = False,
                mode: str = "failfast"):
    """S1 as a distributed scan: binaryFile -> executor-side decode.
    Returns a DataFrame in the canonical observation schema plus
    (path, obs_id). obs_id defaults to xxhash64(path) — computed
    map-side with no shuffle, so a corpus of millions of files never
    funnels through one task; dense_ids=True instead assigns 0..n-1
    by path via sources/layout.dense_index (two-pass partition-offset
    build: sort parallelism = #buckets, never a single-partition
    window, so dense ids stay safe even on a multi-million-file
    corpus).

    mode='failfast' (default): structural corruption (S2) fails the
    decoding task, matching the reference's verify('exception') hard
    stop. mode='permissive': corrupt files contribute zero data rows
    and ONE tombstone row (row_idx = -1, corrupt_error set) so a
    corpus scan survives bad files and the quarantine list is
    `df.filter("row_idx = -1")`."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    files = spark.read.format("binaryFile").load(path_glob)

    if mode.lower() not in ("failfast", "permissive"):
        raise ValueError(f"unknown mode {mode!r}")
    permissive = mode.lower() == "permissive"

    # zero-length files never reach the decode task (the scan plans no
    # splits for them — see _zero_length_files): failfast raises at
    # planning time exactly as a decode failure would at run time;
    # permissive unions one tombstone per empty file below
    empty_paths = _zero_length_files(spark, path_glob)
    if empty_paths and not permissive:
        raise FitsFormatError(
            f"zero-length file(s) in scan: {empty_paths[:3]}"
            f"{'...' if len(empty_paths) > 3 else ''} "
            f"({len(empty_paths)} total) — {_empty_file_verdict()}")

    out_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("corrupt_error", T.StringType()),
        T.StructField("row_idx", T.LongType()),
        *observation_struct_fields(),
    ])
    names = [f.name for f in out_schema.fields[3:]]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                try:
                    obs = parse_sdfits(bytes(row["content"]))
                # permissive quarantine must survive ANY decode
                # failure (damaged cards raise KeyError/ValueError/
                # UnicodeDecodeError from deep in the codec, not just
                # FitsFormatError)
                except Exception as exc:
                    if not permissive:
                        raise
                    tomb = pd.DataFrame({
                        "path": [row["path"]],
                        "corrupt_error": [str(exc)],
                        "row_idx": np.array([-1], dtype=np.int64),
                    })
                    for name in names:
                        tomb[name] = None
                    yield tomb
                    continue
                try:
                    t = obs.table
                    out = pd.DataFrame({
                        "path": row["path"],
                        "corrupt_error": None,
                        "row_idx": np.arange(len(t), dtype=np.int64),
                    })
                    for name in names:
                        if name in t.columns:
                            col = t[name]
                            if name in ("IFNUM", "PLNUM", "CALSTATE",
                                        "SWPVALID"):
                                col = col.astype("int32")
                            out[name] = col
                        else:
                            out[name] = None
                # the coercion loop is part of the decode for the
                # permissive contract: a structurally valid file whose
                # CALSTATE column holds NaN/strings must quarantine,
                # not kill the corpus scan
                except Exception as exc:
                    if not permissive:
                        raise
                    out = pd.DataFrame({
                        "path": [row["path"]],
                        "corrupt_error": [str(exc)],
                        "row_idx": np.array([-1], dtype=np.int64),
                    })
                    for name in names:
                        out[name] = None
                yield out

    decoded = files.select("path", "content").mapInPandas(
        decode, schema=out_schema)
    paths_for_ids = files.select("path")
    if empty_paths:
        verdict = _empty_file_verdict()
        tomb = spark.createDataFrame(
            [(p, verdict, -1) + (None,) * len(names)
             for p in empty_paths], out_schema)
        decoded = decoded.unionByName(tomb)
        paths_for_ids = paths_for_ids.unionByName(
            tomb.select("path"))
    if not dense_ids:
        return decoded.withColumn("obs_id", F.xxhash64("path"))
    from radio_data_pipeline_spark.sources.layout import dense_index
    ids = dense_index(paths_for_ids.distinct(), "path",
                      pos_col="obs_id")
    return decoded.join(F.broadcast(ids), "path")


def read_sdfits_headers(spark, path_glob: str):
    """Per-file header + HISTORY as JSON — the broadcast-dict feed for
    the P1/P2 driver-side parsers (utils.py:9-103)."""
    import pandas as pd  # noqa: F811
    from pyspark.sql import types as T

    # same zero-length hole as read_sdfits failfast: the scan would
    # silently omit an empty file instead of failing on it
    empty_paths = _zero_length_files(spark, path_glob)
    if empty_paths:
        raise FitsFormatError(
            f"zero-length file(s) in scan: {empty_paths[:3]}"
            f"{'...' if len(empty_paths) > 3 else ''} "
            f"({len(empty_paths)} total) — {_empty_file_verdict()}")

    files = spark.read.format("binaryFile").load(path_glob)
    schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("header_json", T.StringType()),
        T.StructField("history_json", T.StringType()),
    ])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                # header-only parse: never decodes the data unit
                header, history = parse_sdfits_headers_only(
                    bytes(row["content"]))
                rows.append({
                    "path": row["path"],
                    "header_json": json.dumps(header),
                    "history_json": json.dumps(history),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return files.select("path", "content").mapInPandas(decode, schema=schema)
