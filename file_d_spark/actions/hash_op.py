"""hash action: stable hash of the first present field.

Reference: /root/reference/plugin/action/hash/hash.go:255,424 — fields
are tried in order, the first present one is hashed (xxhash64) into
``result_field``; per-field options ``max_size`` (truncate before
hashing) and ``format: no|normalize`` (token-normalize first, see
functions/normalize.py).

Spark's built-in ``xxhash64`` is the same family but a different seed
and byte layout than the reference's — hash *values* differ, hash
*semantics* (stable identity of normalized content) match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql import types as T

from file_d_spark.actions.base import Action, register
from file_d_spark.fields import get_col_safe, parse_selector, schema_type_at
from file_d_spark.functions.normalize import normalize_tokens


@register("hash")
class HashAction(Action):
    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        result_field = parse_selector(self.params["result_field"])
        # action-level normalizer config (hash.go:287-327):
        # {builtin_patterns: "all"|"no"|"a|b", custom_patterns: [
        #   {placeholder, re, priority: first|last}]}
        norm_cfg = self.params.get("normalizer") or {}
        builtin = norm_cfg.get("builtin_patterns", "all")
        customs = norm_cfg.get("custom_patterns") or []
        candidates: list[Column] = []
        if not self.params.get("fields"):
            raise ValueError("hash action needs a fields list")
        for fcfg in self.params["fields"]:
            if isinstance(fcfg, str):
                fcfg = {"field": fcfg}
            parts = parse_selector(fcfg["field"])
            # hash.go:430-436: array/object nodes are skipped in the
            # first-present scan; absent fields yield nil and fall
            # through to the next candidate
            dtype = schema_type_at(df.schema, parts)
            if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
                continue
            if dtype is None:
                continue  # statically absent — never present at runtime
            col = get_col_safe(parts, df.schema).cast("string")
            max_size = int(fcfg.get("max_size", 0) or 0)
            if max_size > 0:
                col = F.substring(col, 1, max_size)
            if fcfg.get("format", "no") == "normalize":
                col = normalize_tokens(
                    col,
                    fcfg.get("normalize_patterns", builtin),
                    custom_patterns=customs,
                )
            candidates.append(col)
        if not candidates:
            # every configured field is absent or non-scalar: the
            # reference passes the event through with no result field
            return df
        first_present = F.coalesce(*candidates) if len(candidates) > 1 else candidates[0]
        # no candidate present on this row -> leave the result null
        # (JSON-encode drops it), NOT the hash of the empty input
        return self.set_gated(
            df,
            result_field,
            F.when(first_present.isNotNull(), F.xxhash64(first_present)),
            pred,
        )
