"""Streaming calibration segmentation — the reference's O13/O14 state
machine (utils.py:126-214) as an incremental operator.

The batch form (operators/segmentation.py) scans each observation
stream with one sequential pass. Here the identical transition rules
run row-at-a-time with all scan state carried in a GroupState, so the
operator works over an unbounded stream of integrations arriving in
micro-batches: `applyInPandasWithState` keyed by (obs_id, IFNUM,
PLNUM), emitting the current best (data_start, post_cal_start,
off_start) after every batch. Equivalence with the batch pass is
pinned by a Hypothesis property test (tests/test_streaming.py) over
random CALSTATE/SWPVALID sequences and arbitrary chunkings.

Scale: state is O(1) per observation stream (ten scalars — no row
buffering), so a cluster ingesting millions of concurrent observations
holds megabytes of state; the shuffle is keyed by observation id,
exactly like the batch operator.

Ordering contract: rows must arrive in row_idx order per stream
across micro-batches (within a batch they are sorted here). The
file-per-observation ingest path satisfies this; out-of-order
transport would need a reorder buffer upstream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator, Tuple, TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState


@dataclass
class CalScanState:
    """Incremental form of find_calibration_indices: feed rows with
    step(), read the batch-equivalent answer any time with result().

    Mirrors the reference semantics exactly (utils.py:126-214): the
    main pre-cal scan (with the false-start discard counter and the
    break at the next cal spike) plus the fallback post-cal-only scan
    that the batch code runs when no pre-cal is found — tracked here
    concurrently from row 0 so no replay is ever needed."""
    n: int = 0
    prev_swp: int = -1
    cal_started: bool = False
    pre_cal_complete: bool = False
    counter: int = 0
    data_start: int = -1          # -1 encodes None (GroupState-friendly)
    post_cal: int = -1
    stopped: bool = False         # main loop hit its break
    fb_post: int = -1             # fallback _scan_post_cal tracker
    fb_stopped: bool = False
    off_start: int = -1

    def step(self, calstate: int, swpvalid: int, obsmode: str | None,
             header_obsmode: str, channel_count: int) -> None:
        ind = self.n
        if not self.stopped:
            if calstate == 1:
                self.cal_started = True
            if (self.cal_started and calstate == 0 and swpvalid == 1
                    and not self.pre_cal_complete):
                self.data_start = ind
                self.pre_cal_complete = True
            if (ind > 0 and self.pre_cal_complete and swpvalid == 0
                    and self.prev_swp == 0):
                if self.post_cal < 0:
                    self.post_cal = ind - 1
            else:
                self.post_cal = -1
            if self.pre_cal_complete and calstate == 0 and swpvalid == 1:
                self.counter += 1
            if (self.counter <= 3 * channel_count and swpvalid == 0
                    and self.data_start >= 0):
                self.data_start = -1
                self.pre_cal_complete = False
            if self.pre_cal_complete and swpvalid == 0 and calstate == 1:
                self.stopped = True
        if not self.fb_stopped:
            if ind > 0 and swpvalid == 0 and self.prev_swp == 0:
                if self.fb_post < 0:
                    self.fb_post = ind - 1
            else:
                self.fb_post = -1
            if swpvalid == 0 and calstate == 1:
                self.fb_stopped = True
        if (header_obsmode == "onoff" and self.off_start < 0
                and obsmode is not None and "onoff:off" in obsmode):
            self.off_start = ind
        self.prev_swp = swpvalid
        self.n += 1

    def feed(self, calstate: Iterable[int], swpvalid: Iterable[int],
             obsmode: Iterable[str | None], header_obsmode: str,
             channel_count: int) -> None:
        for c, s, m in zip(calstate, swpvalid, obsmode):
            self.step(int(c), int(s), m, header_obsmode, channel_count)

    def result(self) -> Tuple[int | None, int, int | None]:
        """(data_start, post_cal_start, off_start) as of rows seen —
        identical to find_calibration_indices over the same prefix."""
        if self.pre_cal_complete:
            ds: int | None = self.data_start
            pc = self.post_cal
        else:
            ds = 0
            pc = self.fb_post
        if pc < 0:
            pc = max(self.n - 1, 0)
        off = self.off_start if self.off_start >= 0 else None
        return ds, pc, off

    _FIELDS = ("n", "prev_swp", "cal_started", "pre_cal_complete", "counter",
               "data_start", "post_cal", "stopped", "fb_post", "fb_stopped",
               "off_start")

    def to_tuple(self) -> tuple:
        return tuple(getattr(self, f) for f in self._FIELDS)

    @classmethod
    def from_tuple(cls, tup: tuple) -> "CalScanState":
        return cls(**dict(zip(cls._FIELDS, tup)))


STATE_SCHEMA = T.StructType([
    T.StructField("n", T.IntegerType()),
    T.StructField("prev_swp", T.IntegerType()),
    T.StructField("cal_started", T.BooleanType()),
    T.StructField("pre_cal_complete", T.BooleanType()),
    T.StructField("counter", T.IntegerType()),
    T.StructField("data_start", T.IntegerType()),
    T.StructField("post_cal", T.IntegerType()),
    T.StructField("stopped", T.BooleanType()),
    T.StructField("fb_post", T.IntegerType()),
    T.StructField("fb_stopped", T.BooleanType()),
    T.StructField("off_start", T.IntegerType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("obs_id", T.LongType()),
    T.StructField("IFNUM", T.IntegerType()),
    T.StructField("PLNUM", T.IntegerType()),
    T.StructField("rows_seen", T.IntegerType()),
    T.StructField("data_start_idx", T.IntegerType()),
    T.StructField("post_cal_start_idx", T.IntegerType()),
    T.StructField("off_start_idx", T.IntegerType()),
])


def find_calibrations_stream(df: DataFrame, channel_count: int,
                             header_obsmode: str = "track",
                             order_col: str = "row_idx") -> DataFrame:
    """O13/O14 over a streaming observation table. Emits one updated
    indices row per stream per micro-batch ('update' output mode);
    the latest row per key is the batch answer for the rows seen."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState",
           ) -> Iterator[pd.DataFrame]:
        machine = (CalScanState.from_tuple(state.get) if state.exists
                   else CalScanState())
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            machine.feed(
                pdf["CALSTATE"], pdf["SWPVALID"],
                pdf["OBSMODE"] if "OBSMODE" in pdf else [None] * len(pdf),
                header_obsmode, channel_count)
        state.update(machine.to_tuple())
        ds, pc, off = machine.result()
        yield pd.DataFrame([{
            "obs_id": key[0], "IFNUM": key[1], "PLNUM": key[2],
            "rows_seen": machine.n,
            "data_start_idx": ds, "post_cal_start_idx": pc,
            "off_start_idx": off,
        }])

    return (df.groupBy("obs_id", "IFNUM", "PLNUM")
            .applyInPandasWithState(fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", "NoTimeout"))
