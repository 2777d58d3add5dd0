"""Geo predicates: vectorized point-in-polygon (F4).

Graft of the reference's geographic source filter — it keeps only
records inside the France polygon before dedup
(deduplicator/src/lib/sources.rs:65-72). Spark-first shape: the polygon
is a driver-side constant folded into a ray-casting expression, so the
filter is whole-stage-codegen JVM arithmetic pushed against the scan —
no UDF, no join. (For polygon TABLES the same expression would sit on
the probe side of a broadcast join; a constant polygon needs no join at
all.)

The generated SQL is engine-neutral (CASE/arithmetic only) and every
branch divides lazily, so y1 == y2 edges never evaluate the division —
ANSI mode would otherwise fail the job on the first horizontal edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

Point = tuple[float, float]


def _lit(v: float) -> str:
    """Double literal both engines parse identically (e-notation; a bare
    '1.5' is DECIMAL in DuckDB and the mixed-type math would diverge)."""
    return f"{float(v):.17e}"


def point_in_polygon_sql(x_expr: str, y_expr: str,
                         polygon: list[Point]) -> str:
    """Ray-casting parity test: odd number of rightward edge crossings
    from (x, y) means inside. Identical text runs on Spark SQL and
    DuckDB, so oracle parity is by construction."""
    if len(polygon) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    edges = []
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        crosses = f"(({_lit(y1)} > {y_expr}) != ({_lit(y2)} > {y_expr}))"
        # evaluated only when the edge straddles y, so y2 - y1 != 0
        xcross = (
            f"({x_expr} < ({_lit(x2)} - {_lit(x1)}) * ({y_expr} - {_lit(y1)})"
            f" / ({_lit(y2)} - {_lit(y1)}) + {_lit(x1)})"
        )
        edges.append(
            f"(CASE WHEN {crosses} THEN (CASE WHEN {xcross} THEN 1 ELSE 0 END)"
            f" ELSE 0 END)"
        )
    return "((" + " + ".join(edges) + ") % 2 = 1)"


def point_in_polygon(x: str | Column, y: str | Column,
                     polygon: list[Point]) -> Column:
    x_name = x if isinstance(x, str) else x._jc.toString()
    y_name = y if isinstance(y, str) else y._jc.toString()
    return F.expr(point_in_polygon_sql(x_name, y_name, polygon))


def geo_filter(df: DataFrame, lon_col: str, lat_col: str,
               polygon: list[Point]) -> DataFrame:
    """Rows inside the polygon — the reference's admin-boundary source
    filter as a pushdown-friendly expression."""
    return df.filter(point_in_polygon(lon_col, lat_col, polygon))
