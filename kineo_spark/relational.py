"""Bridge between term-struct binding DataFrames and plain relational
columns (for oracle comparison, serialization, and downstream pipelines).

The driver's correctness gate compares engine output against DuckDB SQL
over the original tables, hashing values column-by-column — so query
wrappers extract native values out of the term structs with stable
column names/types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def extract(df: DataFrame, spec: dict[str, tuple[str, str]]) -> DataFrame:
    """Project term-struct columns to native columns.

    spec: out_name -> (var_name, typ); typ ∈
      lex   → string lexical form
      num   → double value
      int   → long value
      ts    → timestamp (from epoch-µs shadow)
      bool  → boolean
    """
    cols = []
    for out, (var, typ) in spec.items():
        t = df[var]
        if typ == "lex":
            c = t["lex"]
        elif typ == "num":
            c = t["num"]
        elif typ == "int":
            c = t["num"].cast("long")
        elif typ == "ts":
            c = F.timestamp_micros(t["num"].cast("long"))
        elif typ == "bool":
            c = t["num"].cast("boolean")
        else:
            raise ValueError(typ)
        cols.append(c.alias(out))
    return df.select(*cols)
