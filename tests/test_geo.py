"""F4 point-in-polygon: vectorized ray-cast predicate vs an independent
Python twin (reference: France source filter, sources.rs:65-72)."""

from pyspark.sql import functions as F

from addresses_importer_spark.functions.geo import (
    geo_filter, point_in_polygon_sql,
)

SQUARE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
CONCAVE = [(-6.0, -2.0), (-2.0, -7.0), (3.0, -5.0), (7.0, 1.0),
           (2.0, 6.0), (-4.0, 5.0), (0.0, 0.0)]  # notch via last vertex


def _py_inside(x, y, poly):
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            if x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                inside = not inside
    return inside


def test_square_with_horizontal_edges(spark):
    """Horizontal edges must not divide by zero (ANSI mode) and corner
    cases must match the Python twin exactly."""
    pts = [(i, -1.0 + 0.7 * i, -1.0 + 0.9 * ((i * 7) % 9)) for i in range(40)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    got = {r["id"] for r in geo_filter(df, "lon", "lat", SQUARE).collect()}
    want = {i for i, x, y in pts if _py_inside(x, y, SQUARE)}
    assert got == want
    assert want and want != {i for i, _, _ in pts}  # non-trivial split


def test_concave_polygon_grid(spark):
    pts = [
        (i * 100 + j, -9.5 + i, -9.5 + j)
        for i in range(20) for j in range(20)
    ]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    got = {r["id"] for r in geo_filter(df, "lon", "lat", CONCAVE).collect()}
    want = {i for i, x, y in pts if _py_inside(x, y, CONCAVE)}
    assert got == want


def test_predicate_is_pure_expression(spark):
    """No Python evaluation: the filter must stay JVM-side (the whole
    point of the expression-based graft)."""
    import contextlib
    import io

    df = spark.createDataFrame([(1, 1.0, 1.0)], "id long, lon double, lat double")
    plan_df = geo_filter(df, "lon", "lat", SQUARE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
