"""Edge-case scenarios ported from the reference annotate/edgecases_test.go
(the real-world OSM inconsistency catalog). These define the
FindVisible/nextVersionIndex contract more precisely than any docs."""

from datetime import datetime

import pytest

from tests.test_annotate_golden import NODE_SCHEMA, WAY_SCHEMA


def _d(y, m, d):
    return datetime(y, m, d)


def run(spark, nodes, ways):
    """nodes: (id, version, visible, ts, lat, lon); ways: (id, version, ts, refs)."""
    from osm_spark.temporal.annotate import annotate_ways

    ndf = spark.createDataFrame(
        [(i, v, vis, 0, ts, None, lat, lon) for (i, v, vis, ts, lat, lon) in nodes],
        NODE_SCHEMA,
    )
    wdf = spark.createDataFrame(
        [(i, v, True, 0, ts, None, [(r,) for r in refs]) for (i, v, ts, refs) in ways],
        WAY_SCHEMA,
    )
    rows = annotate_ways(wdf, ndf).orderBy("version", "ts").collect()
    return rows


def test_child_created_after_parent_single(spark):
    """edgecases_test.go:17-49: node appears 1 month after way — way is
    not annotated but gains one update when the node comes online."""
    rows = run(
        spark,
        nodes=[(1, 1, True, _d(2012, 2, 1), 1.0, 2.0)],
        ways=[(1, 1, _d(2012, 1, 1), [1])],
    )
    w = rows[0]
    assert w.nodes[0].lat == 0.0 and w.nodes[0].lon == 0.0
    assert len(w.updates) == 1
    assert (w.updates[0].lat, w.updates[0].lon) == (1.0, 2.0)


def test_child_created_after_parent_two_ways(spark):
    """edgecases_test.go:51-95: second way version annotates fine."""
    rows = run(
        spark,
        nodes=[(1, 1, True, _d(2012, 2, 1), 1.0, 2.0)],
        ways=[(1, 1, _d(2012, 1, 1), [1]), (1, 2, _d(2012, 3, 1), [1])],
    )
    w1, w2 = rows
    assert w1.nodes[0].lat == 0.0
    assert len(w1.updates) == 1
    assert w2.updates is None or len(w2.updates) == 0
    assert (w2.nodes[0].lat, w2.nodes[0].lon) == (1.0, 2.0)


def test_two_nodes_between_two_ways(spark):
    """edgecases_test.go:97-138: invisible v1 then visible v2 between the
    way versions — neither way annotated; second way gets update v2."""
    rows = run(
        spark,
        nodes=[
            (1, 1, False, _d(2012, 2, 1), 1.0, 2.0),
            (1, 2, True, _d(2012, 4, 1), 1.0, 3.0),
        ],
        ways=[(1, 1, _d(2012, 1, 1), [1]), (1, 2, _d(2012, 3, 1), [1])],
    )
    w1, w2 = rows
    assert w1.nodes[0].lat == 0.0
    assert w1.updates is None or len(w1.updates) == 0
    assert w2.nodes[0].lat == 0.0
    assert len(w2.updates) == 1 and w2.updates[0].version == 2


def test_node_deleted_between_parents(spark):
    """edgecases_test.go:141-183 (node 321452894 pattern)."""
    rows = run(
        spark,
        nodes=[
            (1, 1, True, _d(2012, 1, 1), 1.0, 2.0),
            (1, 2, False, _d(2012, 2, 1), 1.0, 3.0),
            (1, 3, True, _d(2012, 3, 1), 1.0, 4.0),
            (1, 4, True, _d(2013, 1, 1), 1.0, 5.0),
            (1, 5, True, _d(2013, 2, 1), 1.0, 6.0),
        ],
        ways=[(1, 1, _d(2012, 1, 1), [1]), (1, 2, _d(2013, 1, 1), [1])],
    )
    w1, w2 = rows
    assert len(w1.updates) == 1 and w1.updates[0].version == 3
    assert len(w2.updates) == 1 and w2.updates[0].version == 5


@pytest.mark.parametrize(
    "node_ts",
    [_d(2012, 1, 1), _d(2012, 2, 15), _d(2012, 3, 15)],
    ids=["before", "between", "after"],
)
def test_node_redacted(spark, node_ts):
    """edgecases_test.go:185-283: a single non-visible version (license
    redaction) — never annotate."""
    rows = run(
        spark,
        nodes=[(1, 1, False, node_ts, 1.0, 2.0)],
        ways=[(1, 1, _d(2012, 2, 1), [1]), (1, 2, _d(2012, 3, 1), [1])],
    )
    for w in rows:
        assert w.nodes[0].lat == 0.0 and w.nodes[0].lon == 0.0


def test_redacted_one_of_two_nodes_same_version_parents(spark):
    """edgecases_test.go:285-323 "2 nodes": two way rows with the SAME
    id+version (differing ts) — redacted node never annotated, the
    other annotated in both."""
    rows = run(
        spark,
        nodes=[
            (1, 1, False, _d(2012, 4, 1), 1.0, 2.0),
            (2, 1, True, _d(2012, 2, 1), 1.0, 2.0),
        ],
        ways=[(1, 1, _d(2012, 3, 1), [1, 2]), (1, 1, _d(2012, 5, 1), [1, 2])],
    )
    for w in rows:
        assert w.nodes[0].lat == 0.0
        assert (w.nodes[1].lat, w.nodes[1].lon) == (1.0, 2.0)


def test_child_filter_skips_only_annotated(spark):
    """ChildFilter (options.go:58-67 / compute.go:200-218): slots that
    are already annotated AND fail the filter are skipped; unannotated
    slots are processed regardless of the filter."""
    from pyspark.sql import functions as F

    from osm_spark.temporal.annotate import annotate_refs

    ndf = spark.createDataFrame(
        [
            (1, 1, True, 0, _d(2020, 1, 1), _d(2020, 1, 1), 1.0, 1.0),
            (2, 1, True, 0, _d(2020, 1, 1), _d(2020, 1, 1), 2.0, 2.0),
            (3, 1, True, 0, _d(2020, 1, 1), _d(2020, 1, 1), 3.0, 3.0),
        ],
        "ref long, version int, visible boolean, changeset long, "
        "ts timestamp, committed timestamp, lat double, lon double",
    )
    # refs: 1 annotated (would be skipped by filter), 2 annotated (passes
    # filter), 3 NOT annotated (kept despite failing filter)
    wdf = spark.createDataFrame(
        [
            (
                10, 1, True, 0, _d(2020, 6, 1), _d(2020, 6, 1),
                [(1, True), (2, True), (3, False)],
            )
        ],
        "pid long, version int, visible boolean, changeset long, "
        "ts timestamp, committed timestamp, "
        "refs array<struct<ref:long, annotated:boolean>>",
    )
    keep = {2}
    flt = lambda ref: ref.isin([2])

    out = annotate_refs(wdf, ndf, child_filter=flt).filter("kind = 'set'").collect()
    assert {r.idx for r in out} == {1, 2}  # slot 0 (ref 1) skipped

    out_all = annotate_refs(wdf, ndf).filter("kind = 'set'").collect()
    assert {r.idx for r in out_all} == {0, 1, 2}
