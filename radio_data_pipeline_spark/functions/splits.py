"""The corpus train/val/test split rule — ONE definition.

Deterministic md5-prefix thresholds (~80/10/10): engine-portable and
stable under repartitioning, unlike rand()-seeded splits. Both the
assignment query (plans/pipeline_ops.corpus_split_assignment) and the
leakage audit (plans/training_data.cross_split_near_dup) import from
here, so retuning the ratio cannot silently desynchronize the split
being assigned from the split being audited. SPLIT_SQL is the
oracle-side mirror of split_col — keep them in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRAIN_BELOW = "cc"  # md5-prefix < 'cc'  -> train (~80%)
VAL_BELOW = "e6"    # md5-prefix < 'e6'  -> val   (~10%);  else test

SPLIT_SQL = (f"CASE WHEN substr(md5(CAST({{id}} AS VARCHAR)), 1, 2) "
             f"< '{TRAIN_BELOW}' THEN 'train' "
             f"WHEN substr(md5(CAST({{id}} AS VARCHAR)), 1, 2) "
             f"< '{VAL_BELOW}' THEN 'val' ELSE 'test' END")


def split_col(id_col: Column) -> Column:
    prefix = F.substring(F.md5(id_col.cast("string")), 1, 2)
    return (F.when(prefix < TRAIN_BELOW, F.lit("train"))
            .when(prefix < VAL_BELOW, F.lit("val"))
            .otherwise(F.lit("test")))
