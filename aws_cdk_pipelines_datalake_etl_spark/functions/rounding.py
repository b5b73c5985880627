"""Cross-engine-stable rounding.

Engine-native ``round`` disagrees across engines at half-way
boundaries: Spark rounds the exact decimal expansion of the binary
double (BigDecimal HALF_UP) while e.g. DuckDB rounds the *scaled*
double (``std::round(x * 10^n) / 10^n``), and ``x * 10^n`` can land
exactly on .5 when the decimal expansion doesn't (observed: max delta
0.01 on per-row products).  ``floor(x * 10^n + 0.5) / 10^n`` is pure
IEEE arithmetic — identical bit-for-bit on every engine given the
same input double — so both the Spark plans and the oracle SQL use
this form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, digits: int) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    scale = 10 ** digits
    return F.floor(col * scale + F.lit(0.5)) / scale


def pround_sql(expr: str, digits: int) -> str:
    """DuckDB/ANSI twin of :func:`pround`."""
    scale = 10 ** digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def portable_round_sql(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` call in a SQL string into the
    floor form so oracle SQL stays readable at authoring time but
    executes the engine-stable rounding."""
    import re

    out: list[str] = []
    i = 0
    while True:
        m = re.search(r"\bround\s*\(", sql[i:], re.IGNORECASE)
        if not m:
            out.append(sql[i:])
            break
        start, after_paren = i + m.start(), i + m.end()
        out.append(sql[i:start])
        depth, j, top_commas = 1, after_paren, []
        while depth:
            ch = sql[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                top_commas.append(j)
            j += 1
        expr = sql[after_paren : top_commas[-1]]
        digits = int(sql[top_commas[-1] + 1 : j - 1].strip())
        out.append(pround_sql(expr, digits))
        i = j
    return "".join(out)
