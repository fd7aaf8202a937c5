"""plans/triangles.py degree-oriented triangle counting unit tests."""

from itertools import combinations

from osm_spark.plans import triangles as T


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs], "src long, dst long"
    )


def test_triangle_in_k4(spark):
    # complete graph on 4 nodes: C(4,3) = 4 triangles, every node in 3
    k4 = list(combinations(range(4), 2))
    tris = T.triangles(_edges(spark, k4)).collect()
    assert sorted((r.x, r.y, r.z) for r in tris) == \
        sorted(combinations(range(4), 3))
    cc = {r.node: r for r in T.clustering(_edges(spark, k4)).collect()}
    for n in range(4):
        assert (cc[n].deg, cc[n].tri, cc[n].cc_e6) == (3, 3, 1_000_000)


def test_duplicates_reverses_selfloops_ignored(spark):
    pairs = [(0, 1), (1, 0), (0, 1), (1, 2), (0, 2), (2, 2)]
    tris = T.triangles(_edges(spark, pairs)).collect()
    assert [(r.x, r.y, r.z) for r in tris] == [(0, 1, 2)]


def test_star_has_no_triangles_and_no_wedge_blowup(spark):
    # hub 0 with 20 leaves: orientation points every edge INTO the hub
    # (leaves have degree 1 < 20), so the hub fans out zero wedges
    star = [(0, i) for i in range(1, 21)]
    assert T.triangles(_edges(spark, star)).count() == 0
    o = T.oriented_edges(T.undirected_edges(_edges(spark, star)))
    assert o.where(o.lo == 0).count() == 0  # hub never a wedge source
    cc = {r.node: r for r in T.clustering(_edges(spark, star)).collect()}
    assert cc[0].cc_e6 == 0 and cc[1].cc_e6 == 0


def test_triangle_plus_pendant(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    cc = {r.node: r for r in T.clustering(_edges(spark, pairs)).collect()}
    assert cc[3].deg == 3 and cc[3].tri == 1
    assert cc[3].cc_e6 == 2 * 1 * 1_000_000 // (3 * 2)
    assert cc[4].deg == 1 and cc[4].tri == 0 and cc[4].cc_e6 == 0
