"""plans/hits.py scaled-integer HITS unit tests."""

from osm_spark.plans import hits as H


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs], "src long, dst long"
    )


def test_hits_star_graph_fixed_point(spark):
    # center 0 links to 1, 2, 3: pure hub; leaves are pure authorities
    out = {
        r.node: (r.auth, r.hub)
        for r in H.hits_int(
            _nodes(spark, [0, 1, 2, 3]),
            _edges(spark, [(0, 1), (0, 2), (0, 3)]),
            iters=2,
        ).collect()
    }
    assert out[0] == (0, 1_000_000)
    for leaf in (1, 2, 3):
        assert out[leaf] == (1_000_000, 0)


def test_hits_indegree_ranks_authorities(spark):
    # 1 and 2 both point at 3; only 1 points at 4 -> auth(3) > auth(4),
    # and the max-rescale pins auth(3) at exactly scale
    out = {
        r.node: (r.auth, r.hub)
        for r in H.hits_int(
            _nodes(spark, [1, 2, 3, 4]),
            _edges(spark, [(1, 3), (2, 3), (1, 4)]),
            iters=3,
        ).collect()
    }
    assert out[3][0] == 1_000_000
    assert 0 < out[4][0] < out[3][0]
    assert out[1][1] == 1_000_000      # links to both top authorities
    assert 0 < out[2][1] < out[1][1]


def test_hits_empty_graph_all_zero(spark):
    out = H.hits_int(
        _nodes(spark, [1, 2]), _edges(spark, []), iters=1
    ).collect()
    assert {(r.auth, r.hub) for r in out} == {(0, 0)}
