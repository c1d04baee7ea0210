"""modify action: set fields from substitution templates.

Reference: /root/reference/plugin/action/modify/modify.go:202 — every
config param is ``field_selector: substitution``; `_skip_empty: true`
leaves the field untouched when the rendered value is empty.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from file_d_spark.actions.base import Action, register
from file_d_spark.fields import get_col_safe, parse_selector
from file_d_spark.substitution import compile_template


@register("modify")
class Modify(Action):
    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        skip_empty = bool(self.params.pop("_skip_empty", False)) if "_skip_empty" in self.params else False
        for selector, template in self.params.items():
            parts = parse_selector(selector)
            value = compile_template(template, df.schema)
            if skip_empty:
                old = get_col_safe(parts, df.schema)
                value = F.when(value == "", old).otherwise(value)
            df = self.set_gated(df, parts, value, pred)
        return df
