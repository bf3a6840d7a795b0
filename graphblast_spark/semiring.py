"""Semiring / monoid registry — the aggregate-function catalog.

Mirrors the reference's ``REGISTER_MONOID`` / ``REGISTER_SEMIRING``
macros (reference graphblas/stddef.hpp:142-213) and the
``extractAdd`` / ``extractMul`` helpers (stddef.hpp:217-277).

A :class:`Semiring` carries four things:

- ``mul(a, b)``       — the ⊗ Column expression (used by vecmat's
  edge⊗vertex product and by eWiseMult, per the reference's convention
  that eWiseMult applies the *multiply* op, operations.hpp:129-158);
- ``add_agg(c)``      — the ⊕ as a Spark *aggregate* Column (the
  group-by combine in vecmat / reduce);
- ``add(a, b)``       — the ⊕ as a *pairwise* Column expression (used
  by eWiseAdd and accumulators, operations.hpp:269-299);
- ``identity``        — the ⊕ identity literal (the fill value for
  "missing" in union semantics).

Everything stays JVM-side: the exprs are built from
``pyspark.sql.functions`` only, so whole-stage codegen fuses them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


@dataclass(frozen=True)
class Monoid:
    name: str
    agg: Callable[[Column], Column]
    binary: Callable[[Column, Column], Column]
    identity: float | int | bool


@dataclass(frozen=True)
class Semiring:
    name: str
    add_monoid: Monoid
    mul: Callable[[Column, Column], Column]

    # Convenience pass-throughs -------------------------------------
    @property
    def identity(self):
        return self.add_monoid.identity

    def add_agg(self, c: Column) -> Column:
        return self.add_monoid.agg(c)

    def add(self, a: Column, b: Column) -> Column:
        return self.add_monoid.binary(a, b)


def _bool_or_agg(c: Column) -> Column:
    return F.max(c.cast("boolean"))


def _bool_and_agg(c: Column) -> Column:
    return F.min(c.cast("boolean"))


# Monoids — reference stddef.hpp:142-173 -----------------------------
MONOIDS: dict[str, Monoid] = {
    m.name: m
    for m in [
        Monoid("Plus", F.sum, lambda a, b: a + b, 0.0),
        # F.product (Spark >= 3.2) is exact for zeros/negatives; the old
        # exp(sum(log)) formulation was wrong for any non-positive input.
        Monoid("Multiplies", F.product, lambda a, b: a * b, 1.0),
        Monoid("Minimum", F.min, F.least, _INF),
        Monoid("Maximum", F.max, F.greatest, -_INF),
        Monoid("LogicalOr", _bool_or_agg, lambda a, b: a | b, False),
        Monoid("LogicalAnd", _bool_and_agg, lambda a, b: a & b, True),
    ]
}

# Binary (⊗) ops — reference stddef.hpp:14-138 ------------------------
BINARY_OPS: dict[str, Callable[[Column, Column], Column]] = {
    "plus": lambda a, b: a + b,
    "minus": lambda a, b: a - b,
    "multiplies": lambda a, b: a * b,
    "divides": lambda a, b: a / b,
    "minimum": F.least,
    "maximum": F.greatest,
    "first": lambda a, b: a,
    "second": lambda a, b: b,
    "select_second": lambda a, b: b,
    "logical_or": lambda a, b: a | b,
    "logical_and": lambda a, b: a & b,
    "greater": lambda a, b: (a > b).cast("double"),
    "less": lambda a, b: (a < b).cast("double"),
    "greater_equal": lambda a, b: (a >= b).cast("double"),
    "less_equal": lambda a, b: (a <= b).cast("double"),
    "equal": lambda a, b: (a == b).cast("double"),
    "not_equal_to": lambda a, b: (a != b).cast("double"),
}


def _sr(name: str, add: str, mul: str) -> Semiring:
    return Semiring(name, MONOIDS[add], BINARY_OPS[mul])


# Semirings — reference stddef.hpp:176-213 ----------------------------
SEMIRINGS: dict[str, Semiring] = {
    s.name: s
    for s in [
        _sr("PlusMultiplies", "Plus", "multiplies"),     # PR, LGC, TC
        _sr("LogicalOrAnd", "LogicalOr", "logical_and"),  # BFS, MIS, GC
        _sr("MinimumPlus", "Minimum", "plus"),            # SSSP, CC shortcut
        _sr("MaximumMultiplies", "Maximum", "multiplies"),  # MIS/GC neighbor-max
        _sr("MinimumSelectSecond", "Minimum", "select_second"),  # CC hooking
        _sr("PlusDivides", "Plus", "divides"),            # PR normalize
        _sr("PlusGreater", "Plus", "greater"),
        _sr("GreaterPlus", "Maximum", "plus"),
        _sr("PlusMinus", "Plus", "minus"),                # PR residual
        _sr("PlusLess", "Plus", "less"),
        _sr("MultipliesMultiplies", "Multiplies", "multiplies"),
        _sr("MinimumMultiplies", "Minimum", "multiplies"),
        _sr("MinimumNotEqualTo", "Minimum", "not_equal_to"),  # CC termination
        _sr("PlusNotEqualTo", "Plus", "not_equal_to"),
        _sr("MaximumSelectSecond", "Maximum", "select_second"),
        _sr("PlusFirst", "Plus", "first"),
        _sr("PlusSecond", "Plus", "second"),
        _sr("MinimumFirst", "Minimum", "first"),
        _sr("MinimumSecond", "Minimum", "second"),
        _sr("MaximumFirst", "Maximum", "first"),
        _sr("MaximumSecond", "Maximum", "second"),
    ]
}


def semiring(name_or_sr: str | Semiring) -> Semiring:
    if isinstance(name_or_sr, Semiring):
        return name_or_sr
    return SEMIRINGS[name_or_sr]


def monoid(name_or_m: str | Monoid) -> Monoid:
    if isinstance(name_or_m, Monoid):
        return name_or_m
    return MONOIDS[name_or_m]
