"""Projection-family actions: keep_fields, remove_fields, rename,
move, flatten.

Reference cites:
  keep_fields    /root/reference/plugin/action/keep_fields/keep_fields.go:58,118
  remove_fields  /root/reference/plugin/action/remove_fields/remove_fields.go:63,97
  rename         /root/reference/plugin/action/rename/rename.go:129
  move           /root/reference/plugin/action/move/move.go:167,238-267
  flatten        /root/reference/plugin/action/flatten/flatten.go:32,63

All compile to pure projections — Catalyst prunes the parquet scan to
exactly the surviving columns (check ReadSchema in explain()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_d_spark.actions.base import Action, register
from file_d_spark.fields import (
    drop_field,
    get_col,
    has_path,
    parse_selector,
    rename_field,
    set_field,
)


@register("keep_fields")
class KeepFields(Action):
    """Keep only the listed (possibly nested) paths; drop everything
    else.  Nested keeps rebuild the parent struct with only the kept
    members."""

    shape_changing = True

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        selectors = [parse_selector(f) for f in self.params.get("fields", [])]
        # a selector subsumed by a shorter one keeps the whole subtree
        # regardless of config order (keep_fields_test.go
        # TestRemoveNestedFieldsInConfig: ["a.b","a.c","a"] == ["a"])
        keys = {tuple(p) for p in selectors}
        selectors = [
            p
            for p in selectors
            if not any(tuple(p[:i]) in keys for i in range(1, len(p)))
        ]
        keep_tree: dict = {}
        for parts in selectors:
            if not has_path(df.schema, parts):
                continue
            node = keep_tree
            for p in parts:
                node = node.setdefault(p, {})
            node.clear()  # leaf: keep whole subtree

        def build(prefix: Column | None, t: T.DataType, tree: dict, name: str) -> Column:
            col = get_col([name]) if prefix is None else prefix.getField(name)
            if not tree or not isinstance(t, T.StructType):
                return col
            members = []
            names = {f.name: f.dataType for f in t.fields}
            for child, sub in tree.items():
                members.append(build(col, names[child], sub, child).alias(child))
            return F.struct(*members)

        out_cols = []
        top_types = {f.name: f.dataType for f in df.schema.fields}
        for top, sub in keep_tree.items():
            out_cols.append(build(None, top_types[top], sub, top).alias(top))
        if not out_cols:
            # keep nothing: empty row, preserve count
            return df.select(F.lit(None).cast("string").alias("__empty__"))
        return df.select(*out_cols)


@register("remove_fields")
class RemoveFields(Action):
    """Drop the listed (possibly nested) paths."""

    shape_changing = True

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        for f in self.params.get("fields", []):
            df = drop_field(df, parse_selector(f))
        return df


@register("rename")
class Rename(Action):
    """Rename fields: each ``source_path: new_name`` pair MOVES the
    node to the event ROOT under ``new_name`` (reference rename.go
    Do(): ``AddFieldNoAlloc(event.Root, name)`` — the nested example in
    its doc block understates this).  ``override`` defaults to FALSE
    (rename.go Start(): preserve unless override=true), in which case
    an existing root field with the new name blocks the rename.  A
    source key starting with ``_`` is an escape: exactly one leading
    underscore is stripped (``__HOSTNAME`` addresses ``_HOSTNAME``)."""

    shape_changing = True

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        override = False
        pairs: list[tuple[str, str]] = []
        for k, v in self.params.items():
            if k == "override":
                override = v if isinstance(v, bool) else str(v).lower() == "true"
                continue
            key = k[1:] if k.startswith("_") else k
            pairs.append((key, str(v)))
        for old, new in pairs:
            df = rename_field(df, parse_selector(old), [new], override)
        return df


@register("move")
class Move(Action):
    """Move listed fields (mode=allow) or all-but-listed (mode=block)
    under the ``target`` object."""

    shape_changing = True

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        mode = self.params.get("mode", "allow")
        target = parse_selector(self.params["target"])
        # move_test.go TestConfigValidate: unknown modes are rejected,
        # block mode caps the target depth at 1
        if mode not in ("allow", "block"):
            raise ValueError(f"move: invalid mode {mode!r}")
        if mode == "block" and len(target) > 1:
            raise ValueError('move: in "block" mode, the maximum "target" depth is 1')
        fields = [parse_selector(f) for f in self.params.get("fields", [])]
        if mode == "allow":
            # the target itself is never moved into itself
            # (move_test.go allow_target_in_fields)
            movers = [
                p for p in fields if p != target and has_path(df.schema, p)
            ]
        else:
            listed = {tuple(p) for p in fields}
            listed.add(tuple(target[:1]))
            movers = [
                [f.name]
                for f in df.schema.fields
                if (f.name,) not in listed and [f.name] != target
            ]
        for parts in movers:
            leaf = parts[-1]
            df = set_field(df, target + [leaf], get_col(parts, df.schema))
            df = drop_field(df, parts)
        return df


@register("flatten")
class Flatten(Action):
    """Lift the members of object ``field`` to the event root with
    ``prefix``; the object itself is removed."""

    shape_changing = True

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        parts = parse_selector(self.params["field"])
        prefix = self.params.get("prefix", "")
        t = None
        if has_path(df.schema, parts):
            from file_d_spark.fields import schema_type_at

            t = schema_type_at(df.schema, parts)
        if not isinstance(t, T.StructType):
            return df  # nothing to flatten (reference: non-object passes)
        col = get_col(parts, df.schema)
        for f in t.fields:
            df = set_field(df, [prefix + f.name], col.getField(f.name))
        return drop_field(df, parts)
