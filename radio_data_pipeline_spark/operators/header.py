"""Header metadata operators — reference P1/P2/P4 (SURVEY.md §2.6).

An SDFITS header is tiny (hundreds of cards), file-scoped metadata; it
is parsed driver-side at ingest and carried as a plain dict that
operators close over / broadcast. There is deliberately no DataFrame
involvement here — pushing per-file scalars through the cluster would
be the anti-pattern.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

import numpy as np


def parse_history(cards: list[str]) -> dict[str, Any]:
    """Reference P1 (utils.py:9-56): parse HISTORY cards into typed
    values, reproducing the reference's exact grammar:
    - multi-word keys, whitespace-separated from the value (the greedy
      key regex means trailing numeric tokens of a card like
      'START,STOP channels 0 63' are absorbed into the KEY except the
      last — the reference's own channel parser P4 therefore
      re-tokenizes the raw card, and so does parse_channel_window);
    - ``a_b`` integer pair -> (float, float);
    - comma/space-separated numerics -> list[float] (singleton ->
      float);
    - otherwise the raw string; ``/`` comments stripped; unparsable
      lines -> ``_extra``.
    """
    out: dict[str, Any] = {}
    extra: list[str] = []
    for raw in cards:
        line = raw.split("/")[0].strip()
        m = re.match(r"^\s*([A-Za-z0-9_,]+(?: [A-Za-z0-9_,]+)*)\s+(.*)",
                     line)
        if not m:
            if line:
                extra.append(raw.strip())
            continue
        key, val = m.group(1).strip(), m.group(2).strip()
        out[key] = _coerce(val)
    if extra:
        out["_extra"] = extra
    return out


def _coerce(val: str) -> Any:
    if re.fullmatch(r"\d+_\d+", val):
        a, b = val.split("_")
        return (float(a), float(b))
    toks = val.replace(",", " ").split()
    if toks and all(re.fullmatch(r"-?\d+(\.\d+)?", t) for t in toks):
        nums = [float(t) for t in toks]
        return nums if len(nums) > 1 else nums[0]
    return val


def parse_channel_window(card: str) -> tuple[int, int]:
    """Reference P4 (validate.py:79-101): extract the START,STOP ints
    from a 'START,STOP channels' card — keep the int-parsable tokens."""
    ints = []
    for tok in re.split(r"[,\s]+", card):
        try:
            ints.append(int(tok))
        except ValueError:
            continue
    if len(ints) < 2:
        raise ValueError(f"cannot parse channel window from {card!r}")
    return ints[0], ints[1]


@dataclass
class ObservationHeader:
    """File-scoped metadata (SURVEY.md §1.1): the Spark-side stand-in
    for astropy's fits.Header."""
    date: str                       # epoch timestamp (header DATE)
    obsmode: str = "track"          # 'track' | 'onoff'
    obsfreq: float = 1400.0         # MHz
    obsbw: float = 80.0             # MHz
    datamode: str = "HIRES"         # 'HIRES' | 'LOWRES'
    hires_bands: list[float] = field(default_factory=lambda: [1400.0])
    rffilter: tuple[float, float] = (1350.0, 1450.0)
    channel_window: tuple[int, int] = (0, 63)

    def frequency_range(self, ifnum: int) -> tuple[float, float, int]:
        """Reference P2 (utils.py:58-103): resolve (low, high, n) from
        DATAMODE. HIRES: center = HIRES bands[ifnum], width = OBSBW;
        LOWRES: bounds = RFFILTER; n = STOP - START + 1; unknown mode
        raises ValueError (utils.py:101-103)."""
        n = self.channel_window[1] - self.channel_window[0] + 1
        if self.datamode == "HIRES":
            center = self.hires_bands[ifnum]
            return center - self.obsbw / 2, center + self.obsbw / 2, n
        if self.datamode == "LOWRES":
            lo, hi = self.rffilter
            return lo, hi, n
        raise ValueError(f"unknown DATAMODE {self.datamode!r}")

    def frequencies(self, ifnum: int) -> list[float]:
        """The virtual frequency axis: linspace(high, low, n) —
        DESCENDING, channel 0 = highest frequency (utils.py:282,
        continuum.py:152-153)."""
        low, high, n = self.frequency_range(ifnum)
        return list(np.linspace(high, low, n))

    @classmethod
    def from_fits(cls, header: dict, history: list[str],
                  ) -> "ObservationHeader":
        """Build from a parsed SDFITS primary header + HISTORY cards
        (the sources/fits.py decode output), applying P1/P2/P4 exactly
        as the reference wires them (validate.py:45, utils.py:58-103)."""
        hist = parse_history(history)
        datamode = str(hist.get("DATAMODE", "HIRES")).strip()
        bands = hist.get("HIRES bands", [float(header.get("OBSFREQ",
                                                          1400.0))])
        if not isinstance(bands, list):
            bands = [bands]
        rff = hist.get("RFFILTER", (1350.0, 1450.0))
        if isinstance(rff, list) and len(rff) >= 2:
            rff = (float(rff[0]), float(rff[1]))
        elif not isinstance(rff, tuple):
            rff = (1350.0, 1450.0)
        window = (0, 63)
        for card in history:
            if "START,STOP" in card:
                window = parse_channel_window(card)
                break
        return cls(
            date=str(header.get("DATE", header.get("DATE-OBS", ""))),
            obsmode=str(header.get("OBSMODE", "track")).strip(),
            obsfreq=float(header.get("OBSFREQ", 1400.0)),
            obsbw=float(header.get("OBSBW", 80.0)),
            datamode=datamode,
            hires_bands=[float(b) for b in bands],
            rffilter=rff,
            channel_window=window,
        )
