"""Result materialization: term-struct columns → plain SQL values.

The engine's SELECT results carry full RDF terms (struct columns).
For interop (and the driver's DuckDB oracle gate) each projected
variable is unwrapped to a plain Spark column with an explicit type —
the analog of the reference's SPARQL-results serializers
(bigdata-sails webapp conneg writers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EXTRACT = {
    "str": lambda c: c["lex"],
    "long": lambda c: F.coalesce(c["num"], c["dbl"].cast("decimal(38,18)")).cast("long"),
    "int": lambda c: F.coalesce(c["num"], c["dbl"].cast("decimal(38,18)")).cast("int"),
    "double": lambda c: c["dbl"],
    # Quantize to the money/avg scale, then canonicalize to double: the
    # oracle gate materializes DuckDB DECIMAL results as float64, so a
    # DECIMAL(18,2) Spark column would serialize '1356234.00' against the
    # oracle's '1356234.0' and fail the exact hash even when numerically
    # equal (round-1 q03 failure).  decimal->double is correctly rounded
    # on both engines, so the binary doubles coincide.
    "decimal2": lambda c: F.coalesce(c["num"].cast("decimal(18,2)"), c["dbl"].cast("decimal(18,2)")).cast("double"),
    "decimal6": lambda c: F.coalesce(c["num"].cast("decimal(28,6)"), c["dbl"].cast("decimal(28,6)")).cast("double"),
    "ts": lambda c: c["dtm"],
    "bool": lambda c: c["bool"],
    "term": lambda c: c,  # keep the struct
}


def plain(df: DataFrame, **types: str) -> DataFrame:
    """Unwrap the named term-struct columns to plain values.

    plain(df, name="str", cnt="long") → DataFrame[name string, cnt long]
    Unlisted columns are dropped.
    """
    cols: list[Column] = []
    for name, kind in types.items():
        cols.append(_EXTRACT[kind](F.col(name)).alias(name))
    return df.select(*cols)
