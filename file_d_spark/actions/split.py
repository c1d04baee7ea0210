"""split action: explode an array-of-objects field into child events.

Reference: /root/reference/plugin/action/split/split.go:44,72 — the
parent event is discarded, each array element becomes an event whose
root is the element merged over the remaining parent fields; events
where the field is absent or not an array pass through unchanged.

Spark mapping: ``explode_outer`` over the array (kept rows where the
field isn't an array pass through via the outer null branch), then the
element struct splats over the parent columns.  One narrow stage — no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_d_spark.actions.base import Action, register
from file_d_spark.fields import get_col, has_path, parse_selector, schema_type_at


@register("split")
class Split(Action):
    shape_changing = True

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        parts = parse_selector(self.params["field"])
        if not has_path(df.schema, parts):
            return df
        t = schema_type_at(df.schema, parts)
        if not isinstance(t, T.ArrayType):
            return df  # non-array passes unchanged
        elem_t = t.elementType
        col = get_col(parts, df.schema)
        exploded = df.withColumn("__fd_elem__", F.explode_outer(col))
        # drop the original array; splat element members (object arrays)
        from file_d_spark.fields import drop_field

        exploded = drop_field(exploded, parts)
        if isinstance(elem_t, T.StructType):
            for f in elem_t.fields:
                exploded = exploded.withColumn(
                    f.name, F.col("__fd_elem__").getField(f.name)
                )
        else:
            # array of scalars: element replaces the field value
            exploded = exploded.withColumn(parts[-1], F.col("__fd_elem__"))
        return exploded.drop("__fd_elem__")
