"""connected_components: hand-built graphs with known components."""

import pytest

from fourmc_spark.operators import graph


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out = graph.connected_components(edges, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_and_cycle(spark):
    # chain 1-2-3-4-5 plus cycle 20-21-22-20
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (20, 21), (21, 22), (22, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 20: 20, 21: 20, 22: 20}


def test_direction_and_duplicates_irrelevant(spark):
    # reversed edges, repeats, and self-loops change nothing
    got = _cc(spark, [(2, 1), (1, 2), (3, 2), (3, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_bridge_merges_clusters(spark):
    # two dense triangles joined by one bridge edge -> one component
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(7, 8), (8, 9), (7, 9)]
    got = _cc(spark, tri1 + tri2 + [(3, 7)])
    assert set(got.values()) == {1}
    assert len(got) == 6


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="no convergence"):
        _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], max_iter=1)


def test_output_column_names(spark):
    edges = spark.createDataFrame([(5, 6)], "a_id long, b_id long")
    out = graph.connected_components(
        edges, src="a_id", dst="b_id", id_out="doc_id", comp_out="component_id"
    )
    assert out.columns == ["doc_id", "component_id"]
    assert {tuple(r) for r in out.collect()} == {(5, 5), (6, 5)}


def _canon(spark, docs, pairs):
    d = spark.createDataFrame(docs, "doc_id long, n_chars long")
    e = spark.createDataFrame(pairs, "a_id long, b_id long")
    out = graph.canonicalize(d, e)
    return {
        r["doc_id"]: (r["component_id"], r["canonical_id"], r["kept"])
        for r in out.collect()
    }


def test_canonicalize_keeps_longest(spark):
    # cluster {1,2,3}: doc 2 is longest -> kept; 4 is a singleton
    got = _canon(
        spark,
        [(1, 10), (2, 99), (3, 50), (4, 7)],
        [(1, 2), (2, 3)],
    )
    assert got == {
        1: (1, 2, 0),
        2: (1, 2, 1),
        3: (1, 2, 0),
        4: (4, 4, 1),
    }


def test_canonicalize_weight_tie_prefers_min_id(spark):
    got = _canon(spark, [(5, 40), (6, 40), (7, 40)], [(5, 6), (6, 7)])
    assert got[5] == (5, 5, 1)
    assert got[6] == (5, 5, 0)
    assert got[7] == (5, 5, 0)


def test_canonicalize_exactly_one_kept_per_component(spark):
    docs = [(i, (i * 37) % 11) for i in range(20)]
    pairs = [(0, 1), (1, 2), (5, 6), (10, 11), (11, 12), (12, 13)]
    got = _canon(spark, docs, pairs)
    assert len(got) == 20
    by_comp: dict[int, int] = {}
    for _doc, (comp, canon, kept) in got.items():
        assert (canon == _doc) == bool(kept)
        by_comp[comp] = by_comp.get(comp, 0) + kept
    assert all(v == 1 for v in by_comp.values())


def test_pagerank_hand_graph_integer_exact(spark):
    # 1 -> 3, 2 -> 3, 3 dangling. N=3, S=1e12.
    from fourmc_spark.operators.graph import PAGERANK_SCALE, pagerank

    edges = spark.createDataFrame([(1, 3), (2, 3)], ["src", "dst"])
    got = {
        r["node"]: r["pr"]
        for r in pagerank(edges, iterations=2).collect()
    }
    S = PAGERANK_SCALE
    pr0 = S // 3
    base = (pr0 * 15) // 100
    # iter 1: sources get base; 3 gets base + two contribs
    c1 = (pr0 * 85) // (1 * 100)
    pr1_3 = base + 2 * c1
    # iter 2: contribs from sources now at `base`
    c2 = (base * 85) // (1 * 100)
    assert got == {1: base, 2: base, 3: base + 2 * c2}
    assert pr1_3 > got[3]  # dangling node mass decays once sources drain


def test_pagerank_mass_never_exceeds_total(spark):
    from fourmc_spark.operators.graph import PAGERANK_SCALE, pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3) % 7) for i in range(7) if i != (i * 3) % 7],
        ["src", "dst"],
    )
    total = (
        pagerank(edges, iterations=4)
        .groupBy()
        .sum("pr")
        .collect()[0][0]
    )
    # integer div only loses mass; never creates it
    assert 0 < total <= PAGERANK_SCALE


def _cc_star(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out = graph.connected_components_star(edges, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_star_matches_propagation_on_hand_graphs(spark):
    for pairs in (
        [(1, 2), (2, 3), (10, 11)],
        [(1, 2), (2, 3), (3, 4), (4, 5), (20, 21), (21, 22), (22, 20)],
        [(2, 1), (1, 2), (3, 2), (3, 3), (2, 3)],
        [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7)],
        [(5, 6)],
    ):
        assert _cc_star(spark, pairs) == _cc(spark, pairs)


def test_star_matches_propagation_on_random_graph(spark):
    import random

    rng = random.Random(41)
    nodes = list(range(400))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _cc_star(spark, pairs) == _cc(spark, pairs, max_iter=60)


def test_star_converges_on_long_path_where_propagation_cannot(spark):
    # a 240-hop path with ids scrambled (so the min is mid-chain and
    # neither propagation direction is "easy"): min-label needs
    # diameter(=239) rounds, star contraction O(log^2 n)
    import random

    ids = list(range(240))
    random.Random(7).shuffle(ids)
    pairs = list(zip(ids, ids[1:]))
    with pytest.raises(RuntimeError, match="no convergence"):
        _cc(spark, pairs, max_iter=12)
    got = _cc_star(spark, pairs, max_iter=12)
    m = min(ids)
    assert got == {n: m for n in ids}


def test_star_output_column_names(spark):
    edges = spark.createDataFrame([(5, 6)], "a_id long, b_id long")
    out = graph.connected_components_star(
        edges, src="a_id", dst="b_id", id_out="doc_id", comp_out="component_id"
    )
    assert out.columns == ["doc_id", "component_id"]
    assert {tuple(r) for r in out.collect()} == {(5, 5), (6, 5)}


def test_canonicalize_star_method_matches(spark):
    docs = [(i, 10 + i) for i in range(8)]
    pairs = [(1, 2), (2, 3), (5, 6)]
    d = spark.createDataFrame(docs, "doc_id long, n_chars long")
    e = spark.createDataFrame(pairs, "a_id long, b_id long")
    # compare the two methods EXPLICITLY (the default became star in
    # round 5 — naming both keeps this from degenerating to star==star)
    a = {
        tuple(r)
        for r in graph.canonicalize(d, e, method="propagation").collect()
    }
    b = {tuple(r) for r in graph.canonicalize(d, e, method="star").collect()}
    assert a == b

    with pytest.raises(ValueError, match="unknown method"):
        graph.canonicalize(d, e, method="nope")


def test_cc_loops_release_checkpoint_storage(spark):
    # each round localCheckpoints a frame; without an explicit release
    # the loop holds up to max_iter rounds' blocks in storage at once.
    # After convergence at most a couple of live checkpoints may remain
    # (the returned frame and the last round's input) — on a 240-hop
    # path the star variant runs ~10 rounds and propagation hundreds of
    # label updates, so an unreleased loop shows up as dozens of
    # persisted RDDs here.
    from pyspark.sql import functions as F

    sc = spark.sparkContext

    def n_persisted():
        return len(sc._jsc.sc().getRDDStorageInfo())

    base = n_persisted()
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(240)], "src long, dst long"
    )
    out = graph.connected_components_star(edges, max_iter=25)
    assert out.where(F.col("component") != 0).count() == 0
    assert n_persisted() - base <= 2

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], "src long, dst long"
    )
    out2 = graph.connected_components(chain, max_iter=30)
    assert out2.where(F.col("component") != 0).count() == 0
    assert n_persisted() - base <= 4
