"""Composable Select builder (P1-P5): the reference's tiny query AST
re-expressed for Spark.

Reference (`/root/reference/src/minerva/db/query.py:263-748`): a
cloneable ``Select`` AST — expressions, comparison predicates (Eq, Lt,
Gt, …), boolean combinators (``ands``/``ors``), membership (IN,
ANY(array)), array containment (``@>``, ``<@``) — rendered to SQL and
executed by the database.  Here the same AST renders BOTH Spark SQL
text and a DataFrame pipeline (Catalyst sees identical plans either
way), and clones compose exactly like the reference's curried builders.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


# ------------------------------------------------------------ predicates
@dataclass(frozen=True)
class Pred:
    """A predicate: SQL text + a lazy Column builder (lazy so ASTs can
    be composed without an active SparkSession, like the reference's
    pure renderer)."""

    sql: str
    _build: "object"  # Callable[[], Column]

    @property
    def column(self) -> Column:
        return self._build()

    def __and__(self, other: "Pred") -> "Pred":
        return Pred(
            f"({self.sql} AND {other.sql})",
            lambda: self.column & other.column,
        )

    def __or__(self, other: "Pred") -> "Pred":
        return Pred(
            f"({self.sql} OR {other.sql})",
            lambda: self.column | other.column,
        )

    def __invert__(self) -> "Pred":
        return Pred(f"(NOT {self.sql})", lambda: ~self.column)


def _lit_sql(value) -> str:
    if isinstance(value, str):
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    return str(value)


class col:  # noqa: N801 — mirrors the reference's Column ergonomics
    def __init__(self, name: str):
        self.name = name

    def _cmp(self, op: str, value) -> Pred:
        rhs = value.name if isinstance(value, col) else _lit_sql(value)
        ops = {
            "=": lambda a, b: a == b, "<": lambda a, b: a < b,
            ">": lambda a, b: a > b, "<=": lambda a, b: a <= b,
            ">=": lambda a, b: a >= b, "<>": lambda a, b: a != b,
        }

        def build() -> Column:
            rcol = F.col(value.name) if isinstance(value, col) else F.lit(value)
            return ops[op](F.col(self.name), rcol)

        return Pred(f"{self.name} {op} {rhs}", build)

    def __eq__(self, value) -> Pred:  # type: ignore[override]
        return self._cmp("=", value)

    def __ne__(self, value) -> Pred:  # type: ignore[override]
        return self._cmp("<>", value)

    def __lt__(self, value) -> Pred:
        return self._cmp("<", value)

    def __gt__(self, value) -> Pred:
        return self._cmp(">", value)

    def __le__(self, value) -> Pred:
        return self._cmp("<=", value)

    def __ge__(self, value) -> Pred:
        return self._cmp(">=", value)

    def isin(self, values) -> Pred:
        """IN / ANY(array) membership (reference `query.py:454-456`)."""
        sql = f"{self.name} IN ({', '.join(_lit_sql(v) for v in values)})"
        return Pred(sql, lambda: F.col(self.name).isin(list(values)))

    def contains_array(self, values) -> Pred:
        """``@>``: column array contains all given elements
        (reference `query.py:444-451`)."""
        arr = "array(" + ", ".join(_lit_sql(v) for v in values) + ")"
        sql = f"size(array_except({arr}, {self.name})) = 0"
        return Pred(
            sql,
            lambda: F.size(
                F.array_except(
                    F.array(*[F.lit(v) for v in values]), F.col(self.name)
                )
            ) == 0,
        )

    def contained_by_array(self, values) -> Pred:
        """``<@``: column array contained by the given elements."""
        arr = "array(" + ", ".join(_lit_sql(v) for v in values) + ")"
        sql = f"size(array_except({self.name}, {arr})) = 0"
        return Pred(
            sql,
            lambda: F.size(
                F.array_except(
                    F.col(self.name), F.array(*[F.lit(v) for v in values])
                )
            ) == 0,
        )


def ands(preds: list[Pred]) -> Pred:
    return reduce(lambda a, b: a & b, preds)


def ors(preds: list[Pred]) -> Pred:
    return reduce(lambda a, b: a | b, preds)


# ---------------------------------------------------------------- select
@dataclass(frozen=True)
class Select:
    """Cloneable SELECT builder (reference `query.py:633-748`)."""

    exprs: tuple[str, ...]
    source: str
    where_pred: Pred | None = None
    group_by_cols: tuple[str, ...] = ()
    order_by_cols: tuple[str, ...] = ()
    limit_n: int | None = None

    def where(self, pred: Pred) -> "Select":
        combined = pred if self.where_pred is None else (self.where_pred & pred)
        return replace(self, where_pred=combined)

    def group_by(self, *cols_: str) -> "Select":
        return replace(self, group_by_cols=self.group_by_cols + cols_)

    def order_by(self, *cols_: str) -> "Select":
        return replace(self, order_by_cols=self.order_by_cols + cols_)

    def limit(self, n: int) -> "Select":
        return replace(self, limit_n=n)

    # ------------------------------------------------------------ render
    def to_sql(self) -> str:
        parts = [f"SELECT {', '.join(self.exprs)}", f"FROM {self.source}"]
        if self.where_pred is not None:
            parts.append(f"WHERE {self.where_pred.sql}")
        if self.group_by_cols:
            parts.append(f"GROUP BY {', '.join(self.group_by_cols)}")
        if self.order_by_cols:
            parts.append(f"ORDER BY {', '.join(self.order_by_cols)}")
        if self.limit_n is not None:
            parts.append(f"LIMIT {self.limit_n}")
        return " ".join(parts)

    def to_df(self, spark: SparkSession, source_df: DataFrame) -> DataFrame:
        out = source_df
        if self.where_pred is not None:
            out = out.filter(self.where_pred.column)
        if self.group_by_cols:
            grouped = out.groupBy(*[F.col(c) for c in self.group_by_cols])
            agg_exprs = [
                F.expr(e) for e in self.exprs if e not in self.group_by_cols
            ]
            out = grouped.agg(*agg_exprs)
        else:
            out = out.selectExpr(*self.exprs)
        if self.order_by_cols:
            out = out.orderBy(*[F.expr(c) for c in self.order_by_cols])
        if self.limit_n is not None:
            out = out.limit(self.limit_n)
        return out


def select(exprs: list[str], source: str) -> Select:
    return Select(tuple(exprs), source)
