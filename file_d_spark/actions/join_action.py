r"""Multiline join (batch mode): collapse start/continue sequences.

Reference: /root/reference/plugin/action/join/join.go:152-218 — the
state machine per ordered stream is:
  * event matches ``start``  -> flush current sequence, open a new one
  * else, joining and event matches ``continue`` -> append
  * else -> flush, event passes as a singleton

Batch mapping (SURVEY §2.3 #12): a prefix-scan.  Candidate boundaries
are rows where ``start OR NOT continue``; the running count of
boundaries is the group id; a group whose leader matched ``start``
collapses into one event (values concatenated in seq order), any other
group passes through row-by-row.  One shuffle on (source, group).

join_template: same operator with precompiled template predicates
(go_panic / cs_exception / go_data_race —
/root/reference/plugin/action/join_template/template/*.go).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from file_d_spark.actions.base import Action, register
from file_d_spark.fields import get_col_safe, parse_selector

# template predicates re-expressed as Java regexes (the reference uses
# hand-rolled substring matchers for speed; Catalyst codegens rlike)
JOIN_TEMPLATES: dict[str, dict[str, str]] = {
    "go_panic": {
        "start": r"^(panic:)|(fatal error:)|(http: panic serving)",
        "continue": (
            r"(^\s*$)|(goroutine [0-9]+ \[)|(\.go:[0-9]+)|(created by .*\/?.*\.)"
            r"|(^\[signal)|(panic.+[0-9]x[0-9,a-f]+)|(panic:)|(^\s)"
        ),
    },
    "cs_exception": {
        "start": r"^\s*(?:\S+\.)*\S*Exception:",
        "continue": r"(^\s+at\s)|(^\s*---)|(^\s*$)|(^\s*--- End of )",
    },
    "go_data_race": {
        "start": r"^WARNING: DATA RACE",
        "continue": r"^(?!==================$).*$",
    },
}


def multiline_join(
    df: DataFrame,
    field: list[str],
    start_re: str,
    continue_re: str | None,
    source_cols: list[str],
    seq_col: str,
    negate: bool = False,
    max_event_size: int = 0,
) -> DataFrame:
    value = get_col_safe(field, df.schema).cast("string")
    start = value.rlike(start_re)
    if continue_re:
        cont = value.rlike(continue_re)
        if negate:
            cont = ~cont
    else:
        cont = F.lit(False)

    w = Window.partitionBy(*source_cols).orderBy(seq_col)
    boundary = (start | ~cont).cast("int")
    df = (
        df.withColumn("__fd_start__", start)
        .withColumn("__fd_grp__", F.sum(boundary).over(w))
    )
    gw = Window.partitionBy(*source_cols, "__fd_grp__").orderBy(seq_col)
    df = df.withColumn("__fd_leader__", F.first("__fd_start__").over(gw))

    passthrough = df.filter(~F.col("__fd_leader__")).drop(
        "__fd_start__", "__fd_grp__", "__fd_leader__"
    )

    field_name = ".".join(field)
    other_cols = [c for c in df.columns if not c.startswith("__fd_")]
    joining = df.filter(F.col("__fd_leader__"))
    # seq-ordered concatenation: collect (seq, value) structs, sort,
    # join — deterministic regardless of shuffle order
    agg = (
        joining.groupBy(*source_cols, "__fd_grp__")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(seq_col).alias("s"), value.alias("v"))
                        )
                    ),
                    lambda x: x.getField("v"),
                ),
                "",
            ).alias("__fd_joined__"),
            *[
                F.min_by(F.col(c), F.col(seq_col)).alias(c)
                for c in other_cols
                if c not in source_cols
            ],
        )
        .drop("__fd_grp__")
    )
    joined_val = F.col("__fd_joined__")
    if max_event_size:
        joined_val = F.substring(joined_val, 1, max_event_size)
    from file_d_spark.fields import set_field

    agg = set_field(agg, field, joined_val).drop("__fd_joined__")
    return agg.select(*other_cols).unionByName(passthrough.select(*other_cols))


@register("join")
class Join(Action):
    shape_changing = True  # row cardinality changes

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        if df.isStreaming:
            from file_d_spark.streaming import multiline_join_stream

            return multiline_join_stream(
                df,
                key_cols=[self.params.get("source_field", "source_id")],
                seq_col=self.params.get("seq_field", "seq"),
                field=self.params.get("field", "log"),
                start_re=self.params["start"].strip("/"),
                continue_re=(self.params.get("continue") or "").strip("/") or None,
                negate=bool(self.params.get("negate", False)),
                event_timeout_ms=int(self.params.get("event_timeout_ms", 30_000)),
            )
        return multiline_join(
            df,
            parse_selector(self.params.get("field", "log")),
            self.params["start"].strip("/"),
            (self.params.get("continue") or "").strip("/") or None,
            [self.params.get("source_field", "source_id")],
            self.params.get("seq_field", "seq"),
            negate=bool(self.params.get("negate", False)),
            max_event_size=int(self.params.get("max_event_size", 0) or 0),
        )


@register("join_template")
class JoinTemplate(Action):
    shape_changing = True

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        name = self.params["name"]
        if name not in JOIN_TEMPLATES:
            raise ValueError(f"unknown join template {name!r}; known {sorted(JOIN_TEMPLATES)}")
        t = JOIN_TEMPLATES[name]
        return multiline_join(
            df,
            parse_selector(self.params.get("field", "log")),
            t["start"],
            t["continue"],
            [self.params.get("source_field", "source_id")],
            self.params.get("seq_field", "seq"),
            max_event_size=int(self.params.get("max_event_size", 0) or 0),
        )
