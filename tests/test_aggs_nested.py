"""Nested sub-aggregations, _filter/_missing buckets, _date_histogram,
_date_range, and bucket _sort (reference: src/aggregations/ bucket.h +
docs aggregations/bucket.md; date/missing variants are declared but
disabled in the reference - implemented here).
"""

import math

import pytest

from xapiand_tpu.database import Database

DOCS = [
    {"fruit": "apple", "balance": 100.0, "state": "WA",
     "opened": "2021-01-15T10:00:00"},
    {"fruit": "apple", "balance": 300.0, "state": "OR",
     "opened": "2021-02-10T09:00:00"},
    {"fruit": "banana", "balance": 50.0, "state": "WA",
     "opened": "2021-02-20T12:00:00"},
    {"fruit": "cherry", "balance": 700.0, "state": "CA",
     "opened": "2022-03-01T00:00:00"},
    {"fruit": "apple", "balance": 200.0, "state": "CA",
     "opened": "2022-07-04T18:30:00"},
    {"balance": 999.0, "state": "NV",
     "opened": "2022-08-01T00:00:00"},           # no fruit (missing)
]


@pytest.fixture(scope="module")
def adb():
    db = Database()
    for i, d in enumerate(DOCS):
        db.index_document(dict(d), doc_id=f"d{i}")
    db.commit()
    return db


def aggs_for(db, aggs, query=None):
    res = db.search(query or {"_match_all": {}}, k=0, aggs=aggs)
    return res.aggregations


def test_terms_with_sub_aggs(adb):
    out = aggs_for(adb, {"fruits": {
        "_terms": {"_field": "fruit"},
        "_aggs": {"avg_balance": {"_avg": {"_field": "balance"}},
                  "max_balance": {"_max": {"_field": "balance"}}}}})
    buckets = {b["_key"]: b for b in out["fruits"]}
    assert buckets["apple"]["_doc_count"] == 3
    assert buckets["apple"]["avg_balance"]["_avg"] == pytest.approx(200.0)
    assert buckets["apple"]["max_balance"]["_max"] == pytest.approx(300.0)
    assert buckets["banana"]["avg_balance"]["_avg"] == pytest.approx(50.0)
    assert buckets["cherry"]["_doc_count"] == 1


def test_filter_bucket_with_subs(adb):
    out = aggs_for(adb, {"apple_lovers": {
        "_filter": {"_term": {"fruit": "apple"}},
        "_aggs": {"avg_balance": {"_avg": {"_field": "balance"}}}}})
    assert out["apple_lovers"]["_doc_count"] == 3
    assert out["apple_lovers"]["avg_balance"]["_avg"] == pytest.approx(200.0)


def test_filter_bucket_respects_query_context(adb):
    out = aggs_for(adb, {"apple_lovers": {
        "_filter": {"_term": {"fruit": "apple"}}}},
        query={"state": "WA"})
    assert out["apple_lovers"]["_doc_count"] == 1


def test_missing_bucket(adb):
    out = aggs_for(adb, {"no_fruit": {
        "_missing": {"_field": "fruit"},
        "_aggs": {"sum_balance": {"_sum": {"_field": "balance"}}}}})
    assert out["no_fruit"]["_doc_count"] == 1
    assert out["no_fruit"]["sum_balance"]["_sum"] == pytest.approx(999.0)


def test_histogram_with_subs(adb):
    out = aggs_for(adb, {"hist": {
        "_histogram": {"_field": "balance", "_interval": 500},
        "_aggs": {"mx": {"_max": {"_field": "balance"}}}}})
    b0 = [b for b in out["hist"] if b["_key"] == 0.0][0]
    assert b0["_doc_count"] == 4
    assert b0["mx"]["_max"] == pytest.approx(300.0)
    b1 = [b for b in out["hist"] if b["_key"] == 500.0][0]
    assert b1["_doc_count"] == 2
    assert b1["mx"]["_max"] == pytest.approx(999.0)


def test_date_histogram_month(adb):
    out = aggs_for(adb, {"by_month": {
        "_date_histogram": {"_field": "opened", "_interval": "month"}}})
    keys = {b["_key"]: b["_doc_count"] for b in out["by_month"]}
    assert keys == {"2021-01": 1, "2021-02": 2, "2022-03": 1,
                    "2022-07": 1, "2022-08": 1}


def test_date_histogram_year_with_subs(adb):
    out = aggs_for(adb, {"by_year": {
        "_date_histogram": {"_field": "opened", "_interval": "year"},
        "_aggs": {"avg_b": {"_avg": {"_field": "balance"}}}}})
    keys = {b["_key"]: b for b in out["by_year"]}
    assert keys["2021"]["_doc_count"] == 3
    assert keys["2021"]["avg_b"]["_avg"] == pytest.approx(150.0)
    assert keys["2022"]["_doc_count"] == 3
    assert keys["2022"]["avg_b"]["_avg"] == pytest.approx(
        (700 + 200 + 999) / 3)


def test_date_range(adb):
    out = aggs_for(adb, {"eras": {
        "_date_range": {"_field": "opened", "_ranges": [
            {"_key": "before_2022", "_to": "2022-01-01T00:00:00Z"},
            {"_key": "since_2022", "_from": "2022-01-01T00:00:00Z"}]}}})
    by_key = {b["_key"]: b["_doc_count"] for b in out["eras"]}
    assert by_key == {"before_2022": 3, "since_2022": 3}


def test_bucket_sort_by_doc_count_asc(adb):
    out = aggs_for(adb, {"fruits": {
        "_terms": {"_field": "fruit", "_sort": {"_doc_count": "asc"}}}})
    counts = [b["_doc_count"] for b in out["fruits"]]
    assert counts == sorted(counts)


def test_bucket_sort_by_sub_agg(adb):
    out = aggs_for(adb, {"fruits": {
        "_terms": {"_field": "fruit", "_sort": {"mx._max": "desc"}},
        "_aggs": {"mx": {"_max": {"_field": "balance"}}}}})
    maxes = [b["mx"]["_max"] for b in out["fruits"]]
    assert maxes == sorted(maxes, reverse=True)
    assert out["fruits"][0]["_key"] == "cherry"      # 700


def test_range_with_subs(adb):
    out = aggs_for(adb, {"tiers": {
        "_range": {"_field": "balance",
                   "_ranges": [{"_key": "low", "_to": 250},
                               {"_key": "high", "_from": 250}]},
        "_aggs": {"st": {"_stats": {"_field": "balance"}}}}})
    by_key = {b["_key"]: b for b in out["tiers"]}
    assert by_key["low"]["_doc_count"] == 3
    assert by_key["low"]["st"]["_min"] == pytest.approx(50.0)
    assert by_key["high"]["st"]["_max"] == pytest.approx(999.0)
    assert by_key["high"]["st"]["_sum"] == pytest.approx(300 + 700 + 999)


def test_geo_distance_buckets():
    from xapiand_tpu.database import Database

    db = Database()
    pts = [("london", 51.5, -0.1), ("paris", 48.9, 2.35),
           ("nyc", 40.7, -74.0), ("tokyo", 35.7, 139.7)]
    for name, lat, lon in pts:
        db.index_document({"city": name, "loc": {"_point": {
            "_latitude": lat, "_longitude": lon}}}, doc_id=name)
    db.commit()
    out = db.search({"_match_all": {}}, k=0, aggs={"rings": {
        "_geo_distance": {"_field": "loc",
                          "_origin": [51.5, -0.1],    # London
                          "_ranges": [
                              {"_key": "near", "_to": 1_000_000},
                              {"_key": "far", "_from": 1_000_000}]},
        "_aggs": {"n": {"_count": {}}}}}).aggregations
    by = {b["_key"]: b["_doc_count"] for b in out["rings"]}
    assert by == {"near": 2, "far": 2}          # London+Paris near
    n_near = [b for b in out["rings"] if b["_key"] == "near"][0]
    assert n_near["n"]["_count"] == 2


def test_geo_bounds_and_centroid():
    from xapiand_tpu.database import Database

    db = Database()
    for name, lat, lon in [("a", 10.0, 20.0), ("b", 30.0, -40.0),
                           ("c", -10.0, 60.0)]:
        db.index_document({"loc": {"_point": {"_latitude": lat,
                                              "_longitude": lon}}},
                          doc_id=name)
    db.commit()
    out = db.search({"_match_all": {}}, k=0, aggs={
        "b": {"_geo_bounds": {"_field": "loc"}},
        "c": {"_geo_centroid": {"_field": "loc"}}}).aggregations
    gb = out["b"]["_geo_bounds"]
    assert gb["_top_left"]["_latitude"] == pytest.approx(30.0)
    assert gb["_top_left"]["_longitude"] == pytest.approx(-40.0)
    assert gb["_bottom_right"]["_latitude"] == pytest.approx(-10.0)
    assert gb["_bottom_right"]["_longitude"] == pytest.approx(60.0)
    gc = out["c"]["_geo_centroid"]
    assert gc["_latitude"] == pytest.approx(10.0)
    assert gc["_longitude"] == pytest.approx(40.0 / 3)


def test_bucket_in_bucket_terms_terms(adb):
    out = aggs_for(adb, {"by_fruit": {
        "_terms": {"_field": "fruit"},
        "_aggs": {
            "total": {"_sum": {"_field": "balance"}},    # parent metric
            "by_state": {"_terms": {"_field": "state"},  # nested bucket
                         "_aggs": {"avg_b": {"_avg": {"_field":
                                                      "balance"}}}}}}})
    buckets = {b["_key"]: b for b in out["by_fruit"]}
    apple = buckets["apple"]
    assert apple["_doc_count"] == 3
    assert apple["total"]["_sum"] == pytest.approx(600.0)
    states = {c["_key"]: c for c in apple["by_state"]}
    assert set(states) == {"WA", "OR", "CA"}
    assert states["OR"]["_doc_count"] == 1
    assert states["OR"]["avg_b"]["_avg"] == pytest.approx(300.0)


def test_bucket_in_bucket_terms_histogram(adb):
    out = aggs_for(adb, {"by_fruit": {
        "_terms": {"_field": "fruit"},
        "_aggs": {"bal_hist": {"_histogram": {"_field": "balance",
                                              "_interval": 500}}}}})
    apple = [b for b in out["by_fruit"] if b["_key"] == "apple"][0]
    hist = {c["_key"]: c["_doc_count"] for c in apple["bal_hist"]}
    assert hist == {0.0: 3}
    # across segments too: index more docs in a second segment


def test_scripted_metric(adb):
    out = aggs_for(adb, {"rich": {"_scripted_metric": {
        "_init": {"total": 0, "n": 0},
        "_map": "state['total'] += doc.get('balance', 0)\n"
                "state['n'] += 1",
        "_reduce": "result = state['total'] / state['n']"}}},
        query={"fruit": "apple"})
    assert out["rich"]["_value"] == pytest.approx(200.0)
    # scalar state via reassignment
    out = aggs_for(adb, {"cnt": {"_scripted_metric": {
        "_init": 0, "_map": "state = state + 1"}}})
    assert out["cnt"]["_value"] == 6
    # mixes with device aggs
    out = aggs_for(adb, {"cnt": {"_scripted_metric": {
        "_init": 0, "_map": "state = state + 1"}},
        "mx": {"_max": {"_field": "balance"}}})
    assert out["cnt"]["_value"] == 6 and out["mx"]["_max"] == 999.0


def test_three_level_nesting(adb):
    # terms(state) -> terms(fruit) -> histogram(balance), metric subs at
    # the top and leaf levels (nesting beyond one bucket level)
    out = aggs_for(adb, {"by_state": {
        "_terms": {"_field": "state", "_size": 10},
        "_aggs": {
            "avg_bal": {"_avg": {"_field": "balance"}},
            "by_fruit": {
                "_terms": {"_field": "fruit"},
                "_aggs": {"bal_hist": {
                    "_histogram": {"_field": "balance", "_interval": 500,
                                   "_buckets": 8},
                    "_aggs": {"mx": {"_max": {"_field": "balance"}}}}}}}}})
    states = {b["_key"]: b for b in out["by_state"]}
    # WA: apple@100 + banana@50
    wa = states["WA"]
    assert wa["_doc_count"] == 2
    assert wa["avg_bal"]["_avg"] == pytest.approx(75.0)
    wa_fruits = {b["_key"]: b for b in wa["by_fruit"]}
    assert wa_fruits["apple"]["_doc_count"] == 1
    assert wa_fruits["banana"]["_doc_count"] == 1
    hist = {c["_key"]: c for c in wa_fruits["apple"]["bal_hist"]}
    assert hist[0.0]["_doc_count"] == 1
    assert hist[0.0]["mx"]["_max"] == pytest.approx(100.0)
    # CA: cherry@700 + apple@200
    ca_fruits = {b["_key"]: b for b in states["CA"]["by_fruit"]}
    cherry_hist = {c["_key"]: c for c in ca_fruits["cherry"]["bal_hist"]}
    assert cherry_hist[500.0]["_doc_count"] == 1
    assert cherry_hist[500.0]["mx"]["_max"] == pytest.approx(700.0)
    # NV doc has no fruit: present at level 0, absent below
    assert states["NV"]["_doc_count"] == 1
    assert states["NV"]["by_fruit"] == []


def test_four_level_nesting_width_cap():
    from xapiand_tpu.aggregations import AggError
    from xapiand_tpu.database import Database

    db = Database()
    db.index_document({"a": "x", "b": "y", "c": 1.0, "d": 2.0}, doc_id="1")
    db.commit()
    # four chained histograms below the cap compile and run
    res = db.search({"_match_all": {}}, k=0, aggs={"h1": {
        "_histogram": {"_field": "c", "_interval": 1, "_buckets": 4},
        "_aggs": {"h2": {
            "_histogram": {"_field": "d", "_interval": 1, "_buckets": 4},
            "_aggs": {"h3": {
                "_histogram": {"_field": "c", "_interval": 1,
                               "_buckets": 4},
                "_aggs": {"h4": {"_histogram": {
                    "_field": "d", "_interval": 1, "_buckets": 4}}}}}}}}})
    b1 = res.aggregations["h1"][0]
    assert b1["_key"] == 1.0 and b1["_doc_count"] == 1
    assert b1["h2"][0]["h3"][0]["h4"][0]["_key"] == 2.0
    # exceeding the 4096 composite cap raises
    with pytest.raises(AggError):
        db.search({"_match_all": {}}, k=0, aggs={"h1": {
            "_histogram": {"_field": "c", "_interval": 1, "_buckets": 64},
            "_aggs": {"h2": {
                "_histogram": {"_field": "d", "_interval": 1,
                               "_buckets": 64},
                "_aggs": {"h3": {"_histogram": {
                    "_field": "c", "_interval": 1, "_buckets": 64}}}}}}})


def test_median_mode_under_buckets():
    """VERDICT r3 missing #5: the reference nests any metric under any
    bucket (bucket.h:52 HandledSubAggregation); _median/_mode now ride a
    per-bucket order-stat histogram (ops/aggs.py _sub_stats_bucketed
    "hist2") with the same fixed bin grid as the top level, so segment
    partials merge exactly."""
    import statistics

    import numpy as np

    from xapiand_tpu.database import Database

    rng = np.random.default_rng(5)
    db = Database()
    cats = ["red", "green", "blue"]
    vals = {}
    for i in range(300):
        c = cats[int(rng.integers(3))]
        v = int(rng.integers(1, 40))
        vals.setdefault(c, []).append(v)
        db.index_document({"body": "item common", "color": c, "price": v},
                          doc_id=str(i))
        if i == 150:
            db.commit()   # two segments: exercises partial merging
    db.commit()
    res = db.search({"body": "common"}, k=1, aggs={
        "overall": {"_median": {"_field": "price"}},
        "by_color": {"_terms": {"_field": "color"},
                     "_aggs": {"m": {"_median": {"_field": "price"}},
                               "mo": {"_mode": {"_field": "price"}}}}})
    allv = [v for vs in vals.values() for v in vs]
    assert abs(res.aggregations["overall"]["_median"]
               - statistics.median(allv)) < 1e-6
    for b in res.aggregations["by_color"]:
        sub = vals[b["_key"]]
        assert abs(b["m"]["_median"] - statistics.median(sub)) < 1e-6, b
        # _mode returns SOME maximal-frequency value on the integer grid
        c = sorted(sub).count
        assert c(int(b["mo"]["_mode"])) == max(c(x) for x in set(sub)), b
    # nested composite: terms > histogram > median
    res3 = db.search({"body": "common"}, k=1, aggs={
        "by_color": {
            "_terms": {"_field": "color"},
            "_aggs": {"h": {
                "_histogram": {"_field": "price", "_interval": 20},
                "_aggs": {"m": {"_median": {"_field": "price"}}}}}}})
    for b in res3.aggregations["by_color"]:
        for hb in b["h"]:
            sub = [v for v in vals[b["_key"]]
                   if hb["_key"] <= v < hb["_key"] + 20]
            if sub:
                assert abs(hb["m"]["_median"]
                           - statistics.median(sub)) < 1e-6
