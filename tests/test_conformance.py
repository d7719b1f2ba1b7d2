"""Replay docs/EXAMPLES.md against an in-process server (the
docs_to_postman-style end-to-end conformance suite, SURVEY.md §4)."""

import importlib.util
import os

from test_rest import ServerThread

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "xt_conformance", os.path.join(_ROOT, "scripts", "conformance.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_docs_examples_replay(tmp_path):
    conf = _load()
    cases = conf.parse_spec(os.path.join(_ROOT, "docs", "EXAMPLES.md"))
    assert len(cases) >= 50, "conformance spec lost examples"
    srv = ServerThread(str(tmp_path / "conf-data"))
    try:
        failures = conf.replay(f"http://127.0.0.1:{srv.port}", cases)
    finally:
        srv.stop()
    assert failures == 0


def test_subset_matcher():
    conf = _load()
    assert conf.subset_match({"a": 1}, {"a": 1, "b": 2}) is None
    assert conf.subset_match({"a": "..."}, {"a": [1, 2]}) is None
    assert conf.subset_match({"a": 1}, {"a": 2}) is not None
    assert conf.subset_match([{"x": 1}], [{"x": 1, "y": 0}, "extra"]) is None
    assert conf.subset_match([1, 2], [1]) is not None
    assert conf.subset_match({"#took": 1}, {}) is None  # volatile ignored


def test_docs_examples_replay_on_mesh(tmp_path):
    """The same conformance suite against a server whose every index is
    mesh-sharded (default_num_shards=2): REST semantics must be identical
    whether an index lives on one device or across the mesh."""
    conf = _load()
    cases = conf.parse_spec(os.path.join(_ROOT, "docs", "EXAMPLES.md"))
    srv = ServerThread(str(tmp_path / "conf-mesh"),
                       manager_opts={"default_num_shards": 2})
    try:
        failures = conf.replay(f"http://127.0.0.1:{srv.port}", cases)
    finally:
        srv.stop()
    assert failures == 0
