"""Z-order (Morton) space-filling-curve keys as pure integer column
expressions — the multi-column clustering primitive behind
OPTIMIZE ... ZORDER BY (the reference's maintenance archetype,
``First experiment/Claude Sonnet 4.py:799-806``, which this repo's
``sinks/writers.py::compact_table`` mirrors).

Why it matters at 100 TB: sorting a table by ``(a, b)`` clusters file
min/max statistics on ``a`` only — predicates on ``b`` alone prune
nothing.  Sorting by the INTERLEAVED bits of bucketized ``a`` and ``b``
gives every file a narrow range in BOTH dimensions, so parquet min/max
skipping works for either predicate.  The whole computation is integer
arithmetic (bucketize by integer division, interleave by shift/mask):
deterministic, engine-portable, whole-stage-codegen'd — and the exact
same formulas are emitted as DuckDB SQL by the ``sql_*`` twins below, so
the operator is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZBITS = 8  # buckets per dimension = 2^ZBITS


def bucketize(c: Column, lo: Column, hi: Column, bits: int = ZBITS) -> Column:
    """Map an integer column with known [lo, hi] range onto
    ``[0, 2**bits)`` — pure BIGINT arithmetic (``(x-lo)·2^bits div
    (hi-lo+1)``), no doubles, so every engine buckets identically."""
    span = hi.cast("long") - lo.cast("long") + 1
    scaled = (c.cast("long") - lo.cast("long")) * F.lit(1 << bits).cast("long")
    return F.call_function("div", scaled, span)


def interleave_bits(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton interleave of two ``bits``-wide non-negative ints:
    bit j of ``a`` lands at position 2j, bit j of ``b`` at 2j+1."""
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = z + F.shiftleft(F.shiftright(a, j).bitwiseAND(F.lit(1)), 2 * j)
        z = z + F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)), 2 * j + 1)
    return z


# ---- DuckDB twins (same formulas, same constants) ----


def sql_bucketize(x: str, lo: str, hi: str, bits: int = ZBITS) -> str:
    return (
        f"((CAST({x} AS BIGINT) - CAST({lo} AS BIGINT)) * {1 << bits}) "
        f"// (CAST({hi} AS BIGINT) - CAST({lo} AS BIGINT) + 1)"
    )


def sql_interleave(a: str, b: str, bits: int = ZBITS) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"((({a} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({b} >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(terms) + ")"
