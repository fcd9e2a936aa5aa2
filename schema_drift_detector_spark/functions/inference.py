"""Name-heuristic type inference — byte-parity with the reference.

Reference: /root/reference/src/schema_drift_detector/agents/
csv_crawler_agent.py:21-39 (``infer_type_from_name``). That function has
a load-bearing quirk at :30 — ``any(tok in n for tok in ("country_code"))``
iterates the *characters* of the string ``"country_code"`` (it is not a
tuple), so any name containing one of ``c o u n t r y _ d e`` falls into
the "string" branch before the int/float branches are reached. We
replicate the quirk deliberately: the golden crawler outputs
(/root/reference/examples/*/csv_crawler_agent_output.json) depend on it.

Provided both as a plain Python function (for driver-side snapshot
construction) and as a Spark Column expression (JVM-side, codegen'd,
no Python UDF) for inferring names at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DATE_TOKENS = ("date", "dob", "timestamp", "ts", "joined", "birth")
# characters of the literal "country_code" — the reference's :30 quirk
_STRING_CHARS = tuple(dict.fromkeys("country_code"))  # c,o,u,n,t,r,y,_,d,e
_INT_TOKENS = ("num", "age", "count", "quantity", "year")
_FLOAT_TOKENS = ("amount", "price", "cost", "total", "balance")


def infer_type_from_name(col_name: str) -> str:
    """Python mirror of csv_crawler_agent.py:21-39, quirk included."""
    n = col_name.lower()
    if any(tok in n for tok in _DATE_TOKENS):
        return "date"
    if n.endswith("_id") or n == "id" or any(ch in n for ch in _STRING_CHARS):
        return "string"
    if n.endswith("_id") or n == "id" or any(tok in n for tok in _INT_TOKENS):
        return "int"
    if any(tok in n for tok in _FLOAT_TOKENS):
        return "float"
    return "string"


def infer_type_expr(name_col: Column | str) -> Column:
    """Same lattice as a Catalyst expression (whole-stage codegen).

    Use when inferring types for many column names in a DataFrame
    (e.g. a long-format snapshot of thousands of entities).
    """
    n = F.lower(F.col(name_col) if isinstance(name_col, str) else name_col)

    def _any(tokens) -> Column:
        cond = F.lit(False)
        for tok in tokens:
            cond = cond | n.contains(tok)
        return cond

    return (
        F.when(_any(_DATE_TOKENS), F.lit("date"))
        .when(n.endswith("_id") | (n == "id") | _any(_STRING_CHARS), F.lit("string"))
        .when(_any(_INT_TOKENS), F.lit("int"))
        .when(_any(_FLOAT_TOKENS), F.lit("float"))
        .otherwise(F.lit("string"))
    )
