"""Declarative data-quality rules.

Typed replacement for the reference's per-table ``dq_config`` dict of
``required_columns`` / ``not_null`` / ``unique_keys``
(``_lib_dq_helpers.py:105-111``). Each rule knows how to express its
violation as a boolean Column, so the engine can evaluate every rule in
ONE pass over the data instead of the reference's one-Spark-job-per-rule
pattern (``_lib_dq_helpers.py:126,140`` force a ``.count()`` per rule).

Also fixes the reference's positional bad-key union bug (values of
differently-named columns unioned into one key set,
``_lib_dq_helpers.py:131`` — SURVEY §2.10): violations here are row-level
flags, never a detached key set, so multiplicity and column identity are
preserved by construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


@dataclass(frozen=True)
class Rule:
    """Base rule. ``name`` feeds the quarantine ``reason`` column."""

    def rule_name(self) -> str:
        raise NotImplementedError

    def violation(self, df: DataFrame) -> Column | None:
        """Boolean Column: True where the row violates the rule.

        ``None`` means the rule is schema/table-level and produces no
        row-level violations (e.g. ColumnExists, MinRows).
        """
        raise NotImplementedError


@dataclass(frozen=True)
class NotNull(Rule):
    """Null-or-empty check per column (reference ``check_not_null``,
    ``_lib_dq_helpers.py:123-131`` — empty string counts as null)."""

    columns: tuple[str, ...]

    def __init__(self, *columns: str):
        if not columns:
            raise ValueError("NotNull needs at least one column")
        object.__setattr__(self, "columns", tuple(columns))

    def rule_name(self) -> str:
        return f"not_null({','.join(self.columns)})"

    def violation(self, df: DataFrame) -> Column:
        checks = [
            F.col(c).isNull() | (F.col(c).cast("string") == "") for c in self.columns
        ]
        out = checks[0]
        for c in checks[1:]:
            out = out | c
        return out


@dataclass(frozen=True)
class Unique(Rule):
    """Duplicate-key check (reference ``check_duplicates``,
    ``_lib_dq_helpers.py:138-145``).

    ``quarantine_all=True`` reproduces the reference's semantics of
    quarantining every copy of a duplicated key (``:159``);
    ``False`` keeps the first copy by ``order_by`` and quarantines only
    the extras — the ``dropDuplicates``-style semantics the silver layer
    uses at ``02:66``. Both reference behaviors, made explicit
    (SURVEY §2.10 flags that they silently coexist).
    """

    keys: tuple[str, ...]
    quarantine_all: bool = True
    order_by: tuple[str, ...] = field(default=())

    def __init__(self, *keys: str, quarantine_all: bool = True, order_by: tuple[str, ...] = ()):
        if not quarantine_all and not order_by:
            # ordering by the partition keys themselves is a constant
            # within each partition — "first" would be whichever row a
            # task happened to see first, irreproducible across runs
            raise ValueError(
                "Unique(quarantine_all=False) needs order_by columns to "
                "make 'keep first' deterministic"
            )
        object.__setattr__(self, "keys", tuple(keys))
        object.__setattr__(self, "quarantine_all", quarantine_all)
        object.__setattr__(self, "order_by", tuple(order_by))

    def rule_name(self) -> str:
        return f"unique({','.join(self.keys)})"

    def violation(self, df: DataFrame) -> Column:
        w = Window.partitionBy(*[F.col(k) for k in self.keys])
        if self.quarantine_all:
            return F.count(F.lit(1)).over(w) > 1
        # order_by is guaranteed non-empty by the constructor
        rn = F.row_number().over(w.orderBy(*[F.col(c) for c in self.order_by]))
        return rn > 1


@dataclass(frozen=True)
class ColumnExists(Rule):
    """Schema-level required-column check (``_lib_dq_helpers.py:133-136``)."""

    columns: tuple[str, ...]

    def __init__(self, *columns: str):
        object.__setattr__(self, "columns", tuple(columns))

    def rule_name(self) -> str:
        return f"column_exists({','.join(self.columns)})"

    def violation(self, df: DataFrame) -> None:
        return None

    def missing(self, df: DataFrame) -> list[str]:
        return [c for c in self.columns if c not in df.columns]


@dataclass(frozen=True)
class MinRows(Rule):
    """Minimum-row-count check — described in the reference docs
    (``docs/pipeline_overview.md:50``) but never implemented in its code;
    implemented here for real (SURVEY §2.10)."""

    threshold: int = 1

    def rule_name(self) -> str:
        return f"min_rows({self.threshold})"

    def violation(self, df: DataFrame) -> None:
        return None


def config_to_rules(config: dict) -> list[Rule]:
    """Adapter from the reference's dict shape
    (``_lib_dq_helpers.py:105-111``) to typed rules."""
    rules: list[Rule] = []
    if config.get("required_columns"):
        rules.append(ColumnExists(*config["required_columns"]))
    for col in config.get("not_null", []):
        rules.append(NotNull(col))
    if config.get("unique_keys"):
        rules.append(Unique(*config["unique_keys"]))
    if config.get("min_rows"):
        rules.append(MinRows(config["min_rows"]))
    return rules


@dataclass(frozen=True)
class InRange(Rule):
    """Numeric bounds check: violation when outside [lo, hi] (nulls pass —
    combine with NotNull to reject them)."""

    column: str
    lo: float | None = None
    hi: float | None = None

    def rule_name(self) -> str:
        return f"in_range({self.column},{self.lo},{self.hi})"

    def violation(self, df: DataFrame) -> Column:
        c = F.col(self.column)
        checks = []
        if self.lo is not None:
            checks.append(c < F.lit(self.lo))
        if self.hi is not None:
            checks.append(c > F.lit(self.hi))
        if not checks:
            return F.lit(False)
        out = checks[0]
        for x in checks[1:]:
            out = out | x
        return c.isNotNull() & out


@dataclass(frozen=True)
class Matches(Rule):
    """Regex shape check: violation when a non-null value does NOT match.

    ``full_match=True`` anchors the pattern (the whole value must be the
    shape — use for ISO dates, ids); the default is ``rlike`` substring
    semantics (use for prefix/contains checks like ``^https?://``) —
    anchor explicitly when you mean the whole value.
    """

    column: str
    pattern: str
    full_match: bool = False

    def rule_name(self) -> str:
        return f"matches({self.column})"

    def violation(self, df: DataFrame) -> Column:
        c = F.col(self.column)
        pattern = f"^(?:{self.pattern})$" if self.full_match else self.pattern
        return c.isNotNull() & ~c.cast("string").rlike(pattern)


@dataclass(frozen=True)
class InSet(Rule):
    """Closed-vocabulary check: violation when a non-null value is not a
    member (bounded enums: statuses, country codes, languages)."""

    column: str
    values: tuple = ()

    def __init__(self, column: str, values):
        values = tuple(values)
        if not values:
            raise ValueError("InSet needs a non-empty vocabulary")
        object.__setattr__(self, "column", column)
        object.__setattr__(self, "values", values)

    def rule_name(self) -> str:
        return f"in_set({self.column})"

    def violation(self, df: DataFrame) -> Column:
        c = F.col(self.column)
        return c.isNotNull() & ~c.isin(*self.values)


@dataclass(frozen=True)
class Freshness(Rule):
    """Event-time freshness: violation when a timestamp is older than
    ``max_age`` relative to ``as_of`` (a literal, for determinism — pass
    now() at call time in production)."""

    column: str
    max_age: str  # SQL interval, e.g. "30 days"
    as_of: str = ""  # timestamp literal; required

    _AS_OF_RE = r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?$"
    _AGE_RE = r"^\d+ +[a-zA-Z]+$"

    def __post_init__(self):
        # both strings are interpolated into F.expr — validate at
        # construction so a typo fails HERE, not as a cryptic SQL parse
        # error when the plan is built
        if not re.match(self._AS_OF_RE, self.as_of or ""):
            raise ValueError(
                f"Freshness needs as_of as a timestamp literal "
                f"(YYYY-MM-DD[ HH:MM[:SS]]), got {self.as_of!r}"
            )
        if not re.match(self._AGE_RE, self.max_age or ""):
            raise ValueError(
                f"Freshness max_age must look like '30 days', got {self.max_age!r}"
            )

    def rule_name(self) -> str:
        return f"freshness({self.column},{self.max_age})"

    def violation(self, df: DataFrame) -> Column:
        c = F.col(self.column)
        cutoff = F.expr(
            f"timestamp'{self.as_of}' - interval {self.max_age}"
        )
        return c.isNotNull() & (c < cutoff)


@dataclass(frozen=True)
class FunctionalDependency(Rule):
    """Determinant -> dependent consistency: violation for EVERY row of
    a determinant group whose dependent column takes more than one
    distinct non-null value across the group (a natural key mapping to
    two names, a doc id crawled under two sources, ...).

    Distinctness is checked as min != max over the group window — no
    count-distinct (unsupported over windows and a heavier aggregate),
    and the window shares its shuffle with any other rule keyed on the
    same determinant. Null dependents are ignored (min/max skip nulls);
    add NotNull to reject them.
    """

    determinant: tuple[str, ...]
    dependent: str = ""

    def __init__(self, *determinant: str, dependent: str):
        if not determinant:
            raise ValueError("FunctionalDependency needs determinant columns")
        if not dependent:
            raise ValueError("FunctionalDependency needs a dependent column")
        object.__setattr__(self, "determinant", tuple(determinant))
        object.__setattr__(self, "dependent", dependent)

    def rule_name(self) -> str:
        return f"fd({','.join(self.determinant)}->{self.dependent})"

    def violation(self, df: DataFrame) -> Column:
        w = Window.partitionBy(*[F.col(c) for c in self.determinant])
        dep = F.col(self.dependent)
        # all-null group: min == max == null -> comparison is NULL ->
        # coalesce to no-violation
        return F.coalesce(
            F.min(dep).over(w) != F.max(dep).over(w), F.lit(False)
        )
