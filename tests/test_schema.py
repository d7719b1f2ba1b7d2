"""Schema tests: type inference, keyword processing, term/value generation,
nested objects/arrays, schema evolution."""

import pytest

from xapiand_tpu.schema import FieldType, Schema, SchemaError
from xapiand_tpu.schema.schema import SLOT_ID
from xapiand_tpu.utils import dtutils


def test_guess_type():
    g = Schema.guess_type
    assert g(True) == FieldType.BOOLEAN
    assert g(-5) == FieldType.INTEGER
    assert g(5) == FieldType.POSITIVE
    assert g(1.5) == FieldType.FLOATING
    assert g("550e8400-e29b-41d4-a716-446655440000") == FieldType.UUID
    assert g("2015-03-14") == FieldType.DATETIME
    assert g("09:26:53") == FieldType.TIME
    assert g("123") == FieldType.POSITIVE
    assert g("-42") == FieldType.INTEGER
    assert g("3.14") == FieldType.FLOATING
    assert g("POINT (-74 40)") == FieldType.GEO
    assert g("hello world") == FieldType.TEXT
    assert g({"a": 1}) == FieldType.OBJECT
    assert g([1, 2]) == FieldType.ARRAY
    assert g({"_point": {"_longitude": 0, "_latitude": 0}}) == FieldType.GEO


def test_index_basic_doc():
    s = Schema()
    out = s.index({"name": "John Smith", "age": 30}, doc_id="1")
    assert out.doc_id == "1" and out.id_term == "Q1"
    assert s.mutated
    # text terms (stemmed + unstemmed, prefixed)
    name_spec = s.get_field("name")
    assert name_spec.type == FieldType.TEXT
    assert any(t == name_spec.prefix + "john" for t in out.terms)
    assert any(t.startswith("Z" + name_spec.prefix) for t in out.terms)
    # numeric terms + value slot
    age_spec = s.get_field("age")
    assert age_spec.type == FieldType.POSITIVE
    assert age_spec.slot is not None and out.values[age_spec.slot] == [30.0]
    assert out.values[SLOT_ID] == ["1"]


def test_schema_persistence_roundtrip():
    s = Schema()
    s.index({"name": "A B", "age": 1}, doc_id="1")
    s2 = Schema.from_dict(s.to_dict())
    out = s2.index({"name": "C D", "age": 2}, doc_id="2")
    assert s2.get_field("age").slot == s.get_field("age").slot
    assert s2.get_field("name").prefix == s.get_field("name").prefix
    # indexing same-shaped doc must not mutate schema again
    assert not s2.mutated
    assert out.values[s2.get_field("age").slot] == [2.0]


def test_type_mismatch_uses_declared_type():
    s = Schema()
    s.index({"n": {"_type": "integer", "_value": 7}}, doc_id="1")
    assert s.get_field("n").type == FieldType.INTEGER
    out = s.index({"n": "12"}, doc_id="2")  # string coerced to declared int
    slot = s.get_field("n").slot
    assert out.values[slot] == [12.0]


def test_explicit_spec_inline():
    s = Schema()
    out = s.index({"tag": {"_type": "keyword", "_value": "Alpha"}}, doc_id="1")
    spec = s.get_field("tag")
    assert spec.type == FieldType.KEYWORD
    assert spec.prefix + "Alpha" in out.terms
    assert out.terms[spec.prefix + "Alpha"].wdf == 0  # boolean term


def test_nested_object_and_array():
    s = Schema()
    out = s.index({
        "author": {"name": "Ann Lee", "age": 44},
        "tags": ["x", "y"],
    }, doc_id="1")
    assert s.get_field("author.name").type == FieldType.TEXT
    assert s.get_field("author.age").type == FieldType.POSITIVE
    tag_spec = s.get_field("tags")
    # "x"/"y" are single words -> TEXT by guess; both values present
    assert out.values[tag_spec.slot] == ["x", "y"]


def test_date_field_terms_and_values():
    s = Schema()
    out = s.index({"when": "2015-03-14T09:26:53"}, doc_id="1")
    spec = s.get_field("when")
    assert spec.type == FieldType.DATETIME
    ts = dtutils.parse_datetime("2015-03-14T09:26:53")
    assert out.values[spec.slot] == [ts]
    day = int(dtutils.parse_datetime("2015-03-14"))
    assert f"{spec.prefix}#Dday:{day}" in out.terms


def test_geo_field():
    s = Schema()
    out = s.index({"loc": {"_point": {"_longitude": -74.0, "_latitude": 40.7}}},
                  doc_id="1")
    spec = s.get_field("loc")
    assert spec.type == FieldType.GEO
    assert out.values[spec.slot]  # centroid
    lat, lon = out.values[spec.slot][0]
    assert lat == pytest.approx(40.7) and lon == pytest.approx(-74.0)
    assert out.geo_ranges[spec.slot]
    assert any("#G" in t for t in out.terms)


def test_strict_mode_rejects_unknown():
    s = Schema({"_version": 1, "schema": {"_strict": True}})
    with pytest.raises(SchemaError):
        s.index({"surprise": 1}, doc_id="1")


def test_index_none_mode():
    s = Schema()
    out = s.index({"x": {"_index": "none", "_value": 5}}, doc_id="1")
    spec = s.get_field("x")
    assert len(out.terms) == 0
    assert spec.slot not in out.values or not out.values.get(spec.slot)


def test_field_values_only():
    s = Schema()
    out = s.index({"x": {"_index": "field_values", "_value": 5}}, doc_id="1")
    assert len(out.terms) == 0
    slot = s.get_field("x").slot
    assert out.values[slot] == [5.0]


def test_bool_and_uuid_fields():
    s = Schema()
    u = "550e8400-e29b-41d4-a716-446655440000"
    out = s.index({"ok": True, "ref": u}, doc_id="1")
    ok_spec = s.get_field("ok")
    assert ok_spec.type == FieldType.BOOLEAN
    assert ok_spec.prefix + ":t" in out.terms
    ref_spec = s.get_field("ref")
    assert ref_spec.type == FieldType.UUID
    assert out.values[ref_spec.slot] == [u]


def test_no_stem_language_none():
    s = Schema()
    out = s.index({"t": {"_type": "text", "_language": "none",
                         "_value": "running dogs"}}, doc_id="1")
    spec = s.get_field("t")
    assert spec.prefix + "running" in out.terms
    assert not any(t.startswith("Z") for t in out.terms)


def test_additional_schema_keywords():
    from xapiand_tpu.database import Database

    db = Database()
    db.index_document({
        "title": {"_type": "text", "_spelling": False,
                  "_value": "unsuggestable mispeling"},
        "body": {"_type": "text", "_value": "suggestable wording here"},
        "loc_name": {"_type": "keyword", "_index_uuid_field": "both",
                     "_value": "x"},
        "intro": {"_type": "text", "_position": 100,
                  "_value": "positioned text"},
    }, doc_id="a")
    db.commit()
    # spelling dictionary excludes the _spelling: false field's words
    assert db.suggest_spelling("suggestable") == [] or \
        db.suggest_spelling("sugestable")          # close word found
    sugg = db.suggest_spelling("mispelin")
    assert "mispeling" not in sugg
    sugg2 = db.suggest_spelling("wordin")
    assert "wording" in sugg2
    # _position offsets the stored term positions
    seg = db._searchers[0].segment
    pos_terms = [t for t in seg.terms if t.endswith("positioned")
                 and not t.startswith("Z")]
    assert pos_terms
    ti = seg.get_term(pos_terms[0])
    off = seg.post_posoff[ti.offset]
    ln = seg.post_poslen[ti.offset]
    if ln:
        assert int(seg.positions[off]) >= 100


def test_acc_prefix_and_partials_accepted():
    from xapiand_tpu.database import Database

    db = Database()
    db.index_document({
        "price": {"_type": "integer", "_accuracy": [100, 1000],
                  "_acc_prefix": ["pA", "pB"], "_value": 1234},
        "where": {"_type": "geo", "_partials": False,
                  "_value": {"_point": {"_latitude": 1.0,
                                        "_longitude": 2.0}}},
    }, doc_id="b")
    db.commit()
    r = db.search({"price": {"_from": 1000, "_to": 2000}})
    assert r.total == 1


def test_namespace_partial_paths():
    """_namespace fields emit partial-path terms: root and leaf mandatory,
    middle levels optional (namespaces.md + namespace-queries.md;
    Schema::get_partial_paths, schema.cc:4495-4549)."""
    from xapiand_tpu.database import Database

    db = Database()
    db.index_document({
        "style": {
            "_namespace": True,
            "clothing": {"pants": "khakis", "footwear": "casual shoes"},
            "hairstyle": "afro",
        }}, doc_id="1")
    db.index_document({
        "style": {
            "_namespace": True,
            "clothing": {"pants": "jeans"},
        }}, doc_id="2")
    db.commit()
    # full path
    r = db.search({"style.clothing.pants": "khakis"}, k=5)
    assert [h.id for h in r.hits] == ["1"]
    # skipped middle level
    r = db.search({"style.pants": "khakis"}, k=5)
    assert [h.id for h in r.hits] == ["1"]
    r = db.search({"style.footwear": "casual shoes"}, k=5)
    assert [h.id for h in r.hits] == ["1"]
    # direct child
    r = db.search({"style.hairstyle": "afro"}, k=5)
    assert [h.id for h in r.hits] == ["1"]
    # nested-object query form
    r = db.search({"style": {"clothing": {"pants": "jeans"}}}, k=5)
    assert [h.id for h in r.hits] == ["2"]
    # root must be present: bare leaf without the root doesn't match
    r = db.search({"pants": "khakis"}, k=5)
    assert r.total == 0


def test_namespace_partial_paths_disabled():
    """_partial_paths: false keeps only the full path (namespaces.md)."""
    from xapiand_tpu.database import Database

    db = Database()
    db.index_document({
        "hobbies": {
            "_namespace": True, "_partial_paths": False,
            "Competitive": {"Indoors": {"Judo": 10}},
        }}, doc_id="1")
    db.commit()
    r = db.search({"hobbies.Competitive.Indoors.Judo": 10}, k=5)
    assert [h.id for h in r.hits] == ["1"]
    r = db.search({"hobbies.Judo": 10}, k=5)
    assert r.total == 0


def test_namespace_numeric_and_native_parity():
    """Namespaced numeric leaves + native/Python builder parity."""
    import xapiand_tpu.native as N
    from xapiand_tpu.database import Database

    doc = {"hobbies": {"_namespace": True,
                       "Observation": {"Indoors": {"Reading": 7}},
                       "Outdoors": {"Running": 3}},
           "body": "plain text too"}
    totals = {}
    for native in (True, False):
        saved = N.lib
        if not native:
            N.lib = None
        try:
            db = Database()
            db.index_document(dict(doc), doc_id="1")
            db.commit()
            seg = db._searchers[0].segment
            totals[native] = sorted(seg.terms)
            assert db.search({"hobbies.Reading": 7}, k=5).total == 1
            assert db.search({"hobbies.Indoors.Reading": 7}, k=5).total == 1
            assert db.search({"hobbies.Observation.Reading": 7},
                             k=5).total == 1
        finally:
            N.lib = saved
    assert totals[True] == totals[False]


def test_detection_flags():
    """`_*_detection` root flags remove types from dynamic inference
    (schema.cc:1899 defaults true; 5085-5190 index-time gating)."""
    from xapiand_tpu.schema.schema import Schema
    from xapiand_tpu.schema.types import FieldType

    # defaults: everything detected
    s = Schema()
    assert s.index({"n": "123"}).doc_id   # numeric string ok
    assert s.props["schema"]["n"]["_type"] in ("positive", "integer")
    assert Schema().guess_type("true") == FieldType.BOOLEAN

    # numeric_detection off: "123" indexes as text
    s = Schema({"_version": 1, "schema": {"_numeric_detection": False}})
    s.index({"n": "123"})
    assert s.props["schema"]["n"]["_type"] == "text"

    # uuid/datetime off: fall through to text
    s = Schema({"_version": 1, "schema": {
        "_uuid_detection": False, "_date_detection": False,
        "_datetime_detection": False}})
    s.index({"d": "2023-04-05", "u": "5a5b5c5d-0000-1000-8000-010203040506"})
    assert s.props["schema"]["d"]["_type"] == "text"
    assert s.props["schema"]["u"]["_type"] == "text"

    # text off, term on: strings become keywords; both off errors
    s = Schema({"_version": 1, "schema": {"_text_detection": False}})
    s.index({"t": "some words"})
    assert s.props["schema"]["t"]["_type"] == "keyword"
    s = Schema({"_version": 1, "schema": {"_text_detection": False,
                                          "_term_detection": False}})
    with pytest.raises(Exception):
        s.index({"t": "some words"})

    # bool string detection (on by default), off restores text
    s = Schema()
    s.index({"b": "true"})
    assert s.props["schema"]["b"]["_type"] == "boolean"
    s = Schema({"_version": 1, "schema": {"_bool_detection": False}})
    s.index({"b": "true"})
    assert s.props["schema"]["b"]["_type"] == "text"

    # native JSON values gate too (reference: guess_concrete_type returns
    # empty -> error when the flag is off), but an EXPLICIT _type always
    # works and independent date/datetime flags act separately
    s = Schema({"_version": 1, "schema": {"_numeric_detection": False}})
    with pytest.raises(Exception):
        s.index({"n2": 5})
    s.index({"n3": {"_type": "integer", "_value": 5}})
    assert s.props["schema"]["n3"]["_type"] == "integer"
    s = Schema({"_version": 1, "schema": {"_date_detection": False}})
    s.index({"d1": "2023-04-05", "d2": "2023-04-05T10:00:00"})
    assert s.props["schema"]["d1"]["_type"] == "text"
    assert s.props["schema"]["d2"]["_type"] == "datetime"

    # strict mode accepts the detection keywords (no unknown-keyword error
    # when the root spec is resolved)
    s = Schema({"_version": 1, "schema": {"_strict": True,
                                          "_numeric_detection": False}})
    s._root_defaults()


def test_accuracy_prefix_alias():
    """_accuracy_prefix (the reference's canonical spelling,
    reserved/schema.h:37) works like _acc_prefix."""
    from xapiand_tpu.schema.schema import Schema
    s = Schema()
    s.index({"n": {"_type": "integer", "_value": 5,
                   "_accuracy": [10, 100],
                   "_accuracy_prefix": ["a1", "a2"]}})
    assert s.props["schema"]["n"].get("_acc_prefix") or \
        s.props["schema"]["n"].get("_accuracy_prefix")


def test_cast_keywords():
    """Value casts (cast.h HASH_OPTIONS): {"f": {"_integer": "25"}} types
    the field AND converts the value; lists of casts work; queries accept
    the same forms."""
    from xapiand_tpu.database import Database

    db = Database()
    db.index_document({
        "n": {"_integer": "25"},
        "p": {"_positive": 7},
        "f": {"_float": "2.5"},
        "b": {"_boolean": "true"},
        "k": {"_keyword": 123},
        "t": {"_text": "hello words"},
        "tags": [{"_keyword": "A"}, {"_keyword": "B"}],
    }, doc_id="1")
    db.commit()
    sp = db.schema.props["schema"]
    assert sp["n"]["_type"] == "integer"
    assert sp["f"]["_type"] == "floating"
    assert sp["b"]["_type"] == "boolean"
    assert sp["k"]["_type"] == "keyword"
    assert sp["tags"]["_type"] == "keyword"
    # query-side casts
    assert db.search({"n": {"_integer": "25"}}, k=5).total == 1
    assert db.search({"k": {"_keyword": 123}}, k=5).total == 1
    assert db.search({"b": {"_boolean": 1}}, k=5).total == 1
    assert db.search({"tags": {"_keyword": "B"}}, k=5).total == 1
    with pytest.raises(Exception):
        db.index_document({"bad": {"_integer": "not-a-number"}},
                          doc_id="2")


def test_geo_extended_geometries():
    """_convex (cap intersection), _multipolygon, _ewkt,
    _geometrycollection/-intersection, _lat/_lon aliases, _units
    (geospatial.cc make_* + process_units)."""
    from xapiand_tpu.geo import geospatial, htm
    import math

    # alias + units
    r = geospatial.to_region({"_point": {"_lat": math.radians(40.0),
                                         "_lon": math.radians(-100.0),
                                         "_units": "radians"}})
    lat, lon = r.centroid_latlon()
    assert abs(lat - 40.0) < 1e-6 and abs(lon + 100.0) < 1e-6

    # convex = intersection of two caps: a point in both is inside
    conv = geospatial.to_region({"_convex": {
        "_latitude": [40.0, 40.5], "_longitude": [-100.0, -100.0],
        "_radius": 100_000}})
    assert isinstance(conv, htm.IntersectionRegion)
    ranges, _c = geospatial.extract({"_convex": {
        "_latitude": [40.0, 40.5], "_longitude": [-100.0, -100.0],
        "_radius": 100_000}})
    assert ranges

    # multipolygon (was typed GEO but unparseable before)
    mp = geospatial.to_region({"_multipolygon": {
        "_latitude": [[40, 40, 41], [10, 10, 11]],
        "_longitude": [[-100, -99, -100], [-50, -49, -50]]}})
    assert isinstance(mp, htm.MultiRegion)

    # ewkt object + collection + intersection
    e = geospatial.to_region({"_ewkt": "POINT(-100 40)"})
    assert abs(e.centroid_latlon()[0] - 40.0) < 1e-6
    col = geospatial.to_region({"_geometrycollection": {
        "_point": {"_latitude": 40, "_longitude": -100},
        "_circle": {"_latitude": 41, "_longitude": -101,
                    "_radius": 1000}}})
    assert isinstance(col, htm.MultiRegion) and len(col.regions) == 2
    inter = geospatial.to_region({"_geometryintersection": {
        "_circle": {"_latitude": 40, "_longitude": -100,
                    "_radius": 200_000}}})
    assert isinstance(inter, htm.IntersectionRegion)

    # end-to-end: index a convex, query with an overlapping circle
    from xapiand_tpu.database import Database
    db = Database()
    db.index_document({"area": {"_convex": {
        "_latitude": [40.0, 40.2], "_longitude": [-100.0, -100.0],
        "_radius": 150_000}}}, doc_id="c")
    db.index_document({"area": {"_point": {"_latitude": -10.0,
                                           "_longitude": 30.0}}},
                      doc_id="far")
    db.commit()
    res = db.search({"area": {"_circle": {"_latitude": 40.1,
                                          "_longitude": -100.0,
                                          "_radius": 50_000}}}, k=5)
    assert [h.id for h in res.hits] == ["c"]
