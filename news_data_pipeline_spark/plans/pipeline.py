"""Declarative pipeline plans: named stages as data.

SURVEY §3.3 concludes the engine's own IR should stay thin — Catalyst
owns query planning — and what the reference actually needed was its
pipelines as *data*: an ordered list of named DataFrame→DataFrame
stages, inspectable before execution, with DQ rules as config
(mirroring ``run_dq_from_config``'s design, ``_lib_dq_helpers.py:171-190``).

A ``Pipeline`` composes lazily: running it builds ONE logical plan that
Catalyst optimizes end-to-end (filters from late stages push down
through early ones), instead of the reference's per-notebook
materialization between layers. Materialization points (layer writes)
are explicit stages, not implicit boundaries.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Stage:
    name: str
    fn: Callable[[DataFrame], DataFrame]
    description: str = ""


@dataclass
class Pipeline:
    """Ordered, named, inspectable stage list.

    ``run`` threads a DataFrame through every stage lazily —
    no action is triggered; the caller decides when to materialize.
    ``run_with_trace`` also returns each stage's output for tests
    and debugging (still lazy — plans, not data).
    """

    name: str
    stages: list[Stage] = field(default_factory=list)

    def stage(self, name: str, description: str = ""):
        """Decorator: register the next stage in order."""

        def deco(fn: Callable[[DataFrame], DataFrame]):
            self.add(name, fn, description)
            return fn

        return deco

    def add(self, name: str, fn: Callable[[DataFrame], DataFrame],
            description: str = "") -> "Pipeline":
        if any(s.name == name for s in self.stages):
            # run_with_trace keys by name — a duplicate would silently
            # shadow the earlier stage's traced output
            raise ValueError(f"duplicate stage name: {name}")
        self.stages.append(Stage(name=name, fn=fn, description=description))
        return self

    def run(self, df: DataFrame) -> DataFrame:
        for stage in self.stages:
            df = stage.fn(df)
        return df

    def run_with_trace(self, df: DataFrame) -> dict[str, DataFrame]:
        trace: dict[str, DataFrame] = {}
        for stage in self.stages:
            df = stage.fn(df)
            trace[stage.name] = df
        return trace

    def describe(self) -> str:
        lines = [f"Pipeline: {self.name}"]
        for i, s in enumerate(self.stages):
            desc = f" — {s.description}" if s.description else ""
            lines.append(f"  {i + 1}. {s.name}{desc}")
        return "\n".join(lines)
