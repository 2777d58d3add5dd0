"""Connected components on hand-built graphs (SURVEY §5 unit plan):
chain, star, forest, empty — the CC generalization of the reference's
within-pack greedy closure (deduplicator.rs:166-180)."""

from addresses_importer_spark.operators.components import connected_components


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src string, dst string")
    rows = connected_components(edges).collect()
    comp = {}
    for r in rows:
        comp[r["clip_id"]] = r["component"]
    return comp


def test_chain(spark):
    comp = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_star(spark):
    comp = _cc(spark, [("z", "m"), ("z", "n"), ("z", "o")])
    assert set(comp.values()) == {"m"}
    assert set(comp) == {"z", "m", "n", "o"}


def test_two_triangles(spark):
    comp = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                       ("x", "y"), ("y", "z"), ("z", "x")])
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == comp["z"] == "x"


def test_empty(spark):
    assert _cc(spark, []) == {}


def test_long_chain_converges(spark):
    n = 40
    pairs = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)]
    comp = _cc(spark, pairs)
    assert set(comp.values()) == {"n000"}
    assert len(comp) == n + 1


def test_duplicate_and_reversed_edges(spark):
    comp = _cc(spark, [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")])
    assert comp == {"a": "a", "b": "a", "c": "a"}
