"""webprep.weighted_sample (Efraimidis-Spirakis) unit tests."""

from osm_spark.text import webprep as WP


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, w long")


def test_heavy_weight_dominates(spark):
    rows = [(i, "en", 1) for i in range(50)] + [(999, "en", 10**9)]
    out = WP.weighted_sample(
        _docs(spark, rows), "doc_id", "lang", "w", k=5
    ).orderBy("rank").collect()
    assert out[0].doc_id == 999  # -ln(u)/1e9 beats any -ln(u)/1


def test_sample_is_deterministic_and_partition_independent(spark):
    rows = [(i, "en", 1 + i % 7) for i in range(200)]
    a = WP.weighted_sample(
        _docs(spark, rows), "doc_id", "lang", "w", k=10
    ).orderBy("rank").collect()
    b = WP.weighted_sample(
        _docs(spark, rows).repartition(13), "doc_id", "lang", "w", k=10
    ).orderBy("rank").collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]


def test_per_stratum_k(spark):
    rows = [(i, "en", 1) for i in range(30)] + \
           [(100 + i, "fr", 1) for i in range(30)]
    out = WP.weighted_sample(_docs(spark, rows), "doc_id", "lang", "w", k=4)
    counts = {r["lang"]: 0 for r in out.collect()}
    for r in out.collect():
        counts[r["lang"]] += 1
    assert counts == {"en": 4, "fr": 4}


def test_weighted_frequencies_track_weights(spark):
    # across many disjoint strata, a weight-9 doc should win its
    # stratum against a weight-1 doc ~90% of the time (exact ES
    # property; hash-uniforms approximate it)
    rows = []
    for s in range(300):
        rows += [(s * 10 + 1, f"s{s}", 9), (s * 10 + 2, f"s{s}", 1)]
    out = WP.weighted_sample(_docs(spark, rows), "doc_id", "lang", "w", k=1)
    wins = sum(1 for r in out.collect() if r.doc_id % 10 == 1)
    assert 240 <= wins <= 295  # expect ~270 of 300
