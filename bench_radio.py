#!/usr/bin/env python
"""Radio-path throughput bench (supplementary to bench.py): generates a
multi-observation synthetic corpus, runs the fully-distributed
continuum + spectrum reductions across every stream in one lineage,
and prints ONE JSON line with wall-clock and rows/sec.

    python bench_radio.py            # 40 obs x 4 streams (~15k rows)
    SPARK_GRAFT_RADIO_OBS=200 python bench_radio.py

The reference processes one file per Python process; this measures the
engine's whole-corpus path (segmentation state machine, per-segment
robust fits, distributed gain calibration, ON-OFF spectrum) — the
numbers scale with cores because every stage is keyed on the
observation stream.

The wall-clock at the 40-obs default is ~90% fixed cost (planning +
codegen of the compiled-segmentation window chain and the hybrid's
one adaptive probe action, not data): measured 2026-08-13, 40 obs ->
27.7 s total (531 rows/s) vs 200 obs -> 22.8 s (3,221 rows/s) — 5x
the data, 6x the throughput, LESS absolute time. Per-corpus cost is
paid once regardless of corpus size, which is the property that
matters at 1M observations.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_OBS = int(os.environ.get("SPARK_GRAFT_RADIO_OBS", "40"))


def main() -> None:
    from radio_data_pipeline_spark.pipeline import (
        continuum_pipeline_distributed,
        spectrum_pipeline_distributed,
    )
    from radio_data_pipeline_spark.session import get_spark
    from radio_data_pipeline_spark.sources.synthetic import (
        ObsSpec,
        make_observation_set,
    )

    spark = get_spark("rdps-radio-bench")
    specs = [ObsSpec(obs_id=i, n_science=60, onoff=(i % 2 == 1))
             for i in range(N_OBS)]
    pdf = make_observation_set(specs)
    df = spark.createDataFrame(pdf).cache()
    n_rows = df.count()  # materialize the cache; generation not measured

    t0 = time.perf_counter()
    n_cont = continuum_pipeline_distributed(df).count()
    t_cont = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_spec = spectrum_pipeline_distributed(df).count()
    t_spec = time.perf_counter() - t0

    print(json.dumps({
        "metric": "radio_corpus_reduction_wall_clock",
        "value": round(t_cont + t_spec, 3),
        "unit": "sec",
        "queries": {"continuum_distributed": round(t_cont, 3),
                    "spectrum_distributed": round(t_spec, 3)},
        "n_obs": N_OBS,
        "n_streams": N_OBS * 4,
        "input_rows": n_rows,
        "continuum_rows": n_cont,
        "spectrum_rows": n_spec,
        "input_rows_per_sec": round(n_rows / (t_cont + t_spec), 1),
    }))


if __name__ == "__main__":
    main()
