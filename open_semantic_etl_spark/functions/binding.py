"""let-binding for Column expressions inside higher-order functions.

Spark's whole-stage codegen performs common-subexpression elimination
within a projection but NOT across a higher-order-function lambda
boundary: a ``transform``/``filter`` lambda that closes over an
expensive outer expression (a regex split, a parse) re-evaluates that
expression PER ELEMENT. ``word_shingles`` over a 50-token document
re-ran the tokenizing split ~230× per row before this was bound once
(measured 18 s → <1 s for the sf0.1 decontamination scan).

``let(col, body)`` materializes ``col`` once per row by wrapping it in
a single-element array and binding it as the lambda variable of an
outer ``transform`` — inside ``body`` the value is a bound attribute,
not an expression tree, so per-element references are O(1).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(col: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``col`` once per row; ``body`` receives the bound value."""
    return F.element_at(F.transform(F.array(col), body), 1)
