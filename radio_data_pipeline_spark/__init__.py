"""radio_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference pipeline
(ReeceClark2/radio-data-pipeline: SDFITS validation, atmosphere
correction, continuum/spectrum reduction — see SURVEY.md) expressed as
lazy DataFrame transformations so Catalyst/Tungsten handle physical
planning, plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7):
- Every operator is a pure ``DataFrame -> DataFrame`` function.
- Science kernels that cannot be expressed with built-in expressions
  run as Arrow-batched pandas UDFs / ``applyInPandas`` — never
  row-at-a-time Python UDFs.
- Ordering is explicit (``row_idx`` / ``DATE_OBS``); nothing relies on
  file order the way the reference does (reference utils.py:145).
"""

__version__ = "0.1.0"

from radio_data_pipeline_spark.session import get_spark  # noqa: F401
