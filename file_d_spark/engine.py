"""PipelinePlan -> DataFrame chain.

The reference executes config order literally with no optimizer
(SURVEY.md §4); here each action contributes Column expressions to one
DataFrame chain and Catalyst does the global optimization (pushdown,
pruning, codegen fusion).  The same compiled chain serves batch
(``apply``) and streaming (``apply`` on a readStream DataFrame — all
scalar actions are stateless projections, so they transfer verbatim).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_d_spark.actions import build_action
from file_d_spark.config import PipelinePlan, load_config


def apply_input_guards(df: DataFrame, plan: PipelinePlan, raw_field: str | None) -> DataFrame:
    """Engine-level guards applied before actions: max_event_size
    drop/cutoff (/root/reference/pipeline/pipeline.go:553-580)."""
    s = plan.settings
    if s.max_event_size and raw_field and raw_field in df.columns:
        size = F.octet_length(F.col(raw_field).cast("string"))
        if s.cut_off_event_by_limit:
            # byte-based trim to match the reference's octet limit:
            # F.substring counts characters, so multi-byte UTF-8 events
            # would exceed max_event_size bytes. Trim the encoded bytes
            # and decode back (a split multi-byte sequence at the cut
            # point yields U+FFFD, matching a hard byte truncation).
            cut = F.make_valid_utf8(
                F.substring(
                    F.encode(F.col(raw_field).cast("string"), "UTF-8"),
                    1,
                    s.max_event_size,
                ).cast("string")
            )
            df = df.withColumn(raw_field, cut)
            if s.cut_off_event_by_limit_field:
                df = df.withColumn(
                    s.cut_off_event_by_limit_field, size > s.max_event_size
                )
        else:
            df = df.filter(size <= s.max_event_size)
    return df


def compile_actions(df: DataFrame, actions: list[dict[str, Any]]) -> DataFrame:
    """Apply the action chain in config order."""
    for cfg in actions:
        df = build_action(cfg).apply(df)
    return df


class Pipeline:
    """A compiled file.d-style pipeline."""

    def __init__(self, plan: PipelinePlan):
        self.plan = plan

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_yaml(cls, source: str, name: str | None = None) -> "Pipeline":
        plans = load_config(source)
        if name is None:
            if len(plans) != 1:
                raise ValueError(f"config has {len(plans)} pipelines; pass name=")
            name = next(iter(plans))
        return cls(plans[name])

    @classmethod
    def from_dict(cls, d: dict[str, Any], name: str = "pipeline") -> "Pipeline":
        return cls(PipelinePlan.from_dict(name, d))

    @classmethod
    def all_from_yaml(cls, source: str) -> dict[str, "Pipeline"]:
        """Every pipeline in the config, by name — the reference runs
        all configured pipelines side by side (fd/file.d.go:78-86)."""
        return {name: cls(plan) for name, plan in load_config(source).items()}

    @staticmethod
    def run_all_streams(
        pipelines: dict[str, "Pipeline"],
        spark: SparkSession,
        checkpoint_root: str,
        trigger_available_now: bool = True,
    ) -> dict[str, Any]:
        """Start every pipeline's stream concurrently (one Structured
        Streaming query each, isolated checkpoints under
        ``checkpoint_root/<name>``); returns name -> StreamingQuery.
        Spark schedules the queries onto the shared cluster — the
        analogue of the reference's per-pipeline goroutine groups."""
        import os

        return {
            name: p.run_stream(
                spark,
                checkpoint_dir=os.path.join(checkpoint_root, name),
                trigger_available_now=trigger_available_now,
            )
            for name, p in pipelines.items()
        }

    # -- execution --------------------------------------------------------
    def apply(self, df: DataFrame, raw_field: str | None = None) -> DataFrame:
        """Run the action chain over an existing DataFrame (batch or
        streaming)."""
        df = apply_input_guards(df, self.plan, raw_field)
        return compile_actions(df, self.plan.actions)

    def read(self, spark: SparkSession) -> DataFrame:
        from file_d_spark.sources import build_source

        return build_source(spark, self.plan)

    def run_batch(self, spark: SparkSession) -> DataFrame:
        """source -> actions; returns the final DataFrame (caller picks
        the sink via file_d_spark.sinks or DataFrame.write)."""
        return self.apply(self.read(spark))

    def read_stream(self, spark: SparkSession) -> DataFrame:
        from file_d_spark.sources import build_source

        return build_source(spark, self.plan, streaming=True)

    def run_stream(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        trigger_available_now: bool = True,
    ):
        """source -> actions -> streaming sink.  At-least-once delivery
        via checkpointing (the reference's offset-commit loop,
        /root/reference/pipeline/pipeline.go:606-649, maps onto Spark's
        checkpoint/WAL — SURVEY §3.2)."""
        from file_d_spark.sinks import build_stream_sink

        df = self.apply(self.read_stream(spark))
        return build_stream_sink(
            df,
            self.plan,
            checkpoint_dir=checkpoint_dir,
            trigger_available_now=trigger_available_now,
        )

    def write(self, df: DataFrame):
        from file_d_spark.sinks import build_sink

        return build_sink(df, self.plan)
