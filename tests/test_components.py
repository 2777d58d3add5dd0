"""Connected components on hand-built graphs (SURVEY §5 unit plan):
chain, star, forest, empty — the CC generalization of the reference's
within-pack greedy closure (deduplicator.rs:166-180)."""

from addresses_importer_spark.operators.components import connected_components


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src string, dst string")
    rows = connected_components(edges, **kw).collect()
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


def test_driver_and_distributed_paths_agree(spark):
    """Same labeling from the driver union-find (default at this size)
    and the distributed star loop (forced via driver_max_edges=0)."""
    pairs = [("a", "b"), ("b", "c"), ("c", "d"),        # chain
             ("z", "m"), ("z", "n"), ("z", "o"),        # star
             ("p", "q"), ("q", "p"),                    # dup/reversed
             ("s", "t")]                                # pair
    via_driver = _cc(spark, pairs)
    via_loop = _cc(spark, pairs, driver_max_edges=0)
    assert via_driver == via_loop
    assert via_driver["d"] == "a" and via_driver["z"] == "m"


def test_distributed_path_chain(spark):
    comp = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")],
               driver_max_edges=0)
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_driver_max_edges_boundary(spark):
    """n_edges == bound → driver union-find; bound+1 → distributed star
    loop. Both must label identically AT the boundary (VERDICT r3 task
    #8): a 7-edge forest run with driver_max_edges=7 and then 6 (one
    below its distinct-canonical edge count) exercises <=/> on the
    exact count the probe measures — distinct CANONICAL edges, so the
    planted duplicate+reversed edge must not tip the count."""
    pairs = [("a", "b"), ("b", "c"), ("c", "d"),
             ("x", "y"), ("y", "z"),
             ("p", "q"), ("q", "r"),
             ("b", "a"), ("a", "b")]  # canonical dups: still 7 distinct
    at_bound = _cc(spark, pairs, driver_max_edges=7)     # == bound: driver
    above = _cc(spark, pairs, driver_max_edges=6)        # > bound: loop
    assert at_bound == above
    assert at_bound["d"] == "a" and at_bound["z"] == "x" and at_bound["r"] == "p"
