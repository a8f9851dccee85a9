"""Independent-reference battery for the wave-3 training-data
operators: from-scratch pure-Python implementations over the same
corpus (same role as tests/test_wave4_references.py — pin the
ALGORITHM, not just cross-engine parity).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb


def _doc_texts(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lower(trim(coalesce(text, ''))) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchall()
    con.close()
    return rows


def test_bpe_pair_counts_matches_python_counter(spark, sf_dir):
    from radio_data_pipeline_spark.plans.training_data import bpe_pair_counts
    got = [(r["pair"], r["n"]) for r in bpe_pair_counts(spark, sf_dir)
           .collect()]

    wf = Counter()
    for _, text in _doc_texts(sf_dir):
        for w in re.split(r"\s+", text):
            if w:
                wf[w] += 1
    pc = Counter()
    for w, f in wf.items():
        for a, b in zip(w, w[1:]):
            pc[a + b] += f
    expect = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == expect


def test_word_pair_pmi_matches_python(spark, sf_dir):
    from radio_data_pipeline_spark.plans.training_data import (
        _PMI_MAX_DF,
        _PMI_MIN_DF,
        _PMI_MIN_PAIR,
        word_pair_pmi,
    )
    got = [(r["word_a"], r["word_b"], r["c_ab"], r["pmi"])
           for r in word_pair_pmi(spark, sf_dir).collect()]

    docs = _doc_texts(sf_dir)
    n_docs = len(docs)
    doc_words = [set(w for w in re.split(r"\s+", t) if w)
                 for _, t in docs]
    df = Counter(w for ws in doc_words for w in ws)
    band = {w for w, c in df.items()
            if _PMI_MIN_DF <= c <= _PMI_MAX_DF}
    c_ab = Counter()
    for ws in doc_words:
        kept = sorted(ws & band)
        for i, a in enumerate(kept):
            for b in kept[i + 1:]:
                c_ab[(a, b)] += 1
    scored = [(a, b, c, round(math.log(c * n_docs / (df[a] * df[b])), 6))
              for (a, b), c in c_ab.items() if c >= _PMI_MIN_PAIR]
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    assert got == scored[:20]


def test_cdc_upsert_matches_python_sweep(spark, sf_dir):
    from radio_data_pipeline_spark.plans.training_data import (
        _CUTOFF_US,
        merge_upsert_events,
    )
    got = {(r["user_id"], r["event_type"]):
           (r["final_value"], r["final_ts_us"], r["op"])
           for r in merge_upsert_events(spark, sf_dir).collect()}

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type, value, epoch_us(ts), event_id FROM "
        f"read_parquet('{sf_dir}/events.parquet')").fetchall()
    con.close()

    base, changes = {}, {}
    for user, etype, value, ts_us, eid in rows:
        side = base if ts_us < _CUTOFF_US else changes
        k = (user, etype)
        if k not in side or (ts_us, eid) > side[k][0]:
            side[k] = ((ts_us, eid), value)
    expect = {}
    for k in set(base) | set(changes):
        if k not in base:
            (ts, _), v = changes[k][0], changes[k][1]
            expect[k] = (round(v, 6), ts, "insert")
        elif k not in changes:
            (ts, _), v = base[k][0], base[k][1]
            expect[k] = (round(v, 6), ts, "keep")
        else:
            (ts, _), v = changes[k][0], changes[k][1]
            expect[k] = (round(v, 6), ts, "update")
    assert got == expect
