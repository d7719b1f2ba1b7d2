"""BASELINE.json config 2 and 4 workload rows.

Config 2: 100k docs with positional postings - phrase + boolean
(AND/OR/NOT) queries through the query DSL.
Config 4: geotagged + timestamped docs - HTM circle filters combined with
datetime range filters (scale set by --docs; the config names 1M).

Both engines run on the identical corpus and queries: the from-source
reference binary over REST (sequential, its serving model), this engine
via the batched on-device path. Our results are gated on correctness
first: phrase hits verified by token-adjacency containment, booleans
against a set-algebra + BM25 numpy oracle, geo+time against brute-force
haversine/timestamp filtering.

Usage:
    python scripts/config_bench.py --config 2 [--docs 100000]
    python scripts/config_bench.py --config 4 [--docs 250000]
        [--binary /tmp/xbuild/bin/xapiand] [--skip-reference]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def zipf_vocab(n_vocab, rng):
    words = [f"w{i}" for i in range(n_vocab)]
    weights = [1.0 / (i + 1) ** 1.07 for i in range(n_vocab)]
    return words, weights


def build_corpus2(n_docs, seed=7):
    rng = random.Random(seed)
    words, weights = zipf_vocab(5000, rng)
    docs = []
    for _ in range(n_docs):
        docs.append(" ".join(rng.choices(words, weights=weights, k=40)))
    return docs


def queries2(docs, n_each=128, seed=11):
    rng = random.Random(seed)
    phrases = []
    seen = set()
    while len(phrases) < n_each:
        toks = docs[rng.randrange(len(docs))].split()
        i = rng.randrange(len(toks) - 1)
        p = (toks[i], toks[i + 1])
        if p[0] != p[1] and p not in seen:
            seen.add(p)
            phrases.append(p)
    vocab = sorted({t for d in docs[:2000] for t in d.split()})
    booleans = []
    for _ in range(n_each):
        kind = rng.choice(("and", "or", "not"))
        terms = rng.sample(vocab, 3)
        booleans.append((kind, terms))
    return phrases, booleans


def dsl_for(kind, terms):
    if kind == "and":
        return {"_and": [{"body": t} for t in terms]}
    if kind == "or":
        return {"_or": [{"body": t} for t in terms]}
    return {"_and_not": [{"_or": [{"body": t} for t in terms[:2]]},
                         {"body": terms[2]}]}


def run_ours_config2(docs, phrases, booleans):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import numpy as np

    from xapiand_tpu.database import Database
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher

    db = Database()
    t0 = time.time()
    for i, d in enumerate(docs):
        db.index_document({"body": d}, doc_id=str(i))
    db.commit()
    index_s = time.time() - t0
    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)
    irs = [dsl.parse({"body": {"_phrase": f"{a} {b}"}})
           for a, b in phrases] + \
          [dsl.parse(dsl_for(kind, terms)) for kind, terms in booleans]
    searcher = SegmentSearcher(seg, db.scheme)
    bs = BatchSearcher(searcher, k=10)
    res = bs.run(irs)   # warm + compile + correctness material

    # correctness gates ----------------------------------------------------
    tok_docs = [d.split() for d in docs]
    for qi in range(0, len(phrases), 16):
        a, b = phrases[qi]
        got = {int(d) for d, s in zip(res[qi]["docids"], res[qi]["scores"])
               if np.isfinite(s)}
        for d in got:
            toks = tok_docs[d]
            assert any(toks[j] == a and toks[j + 1] == b
                       for j in range(len(toks) - 1)), \
                ("phrase hit not adjacent", a, b, d)
    # boolean counts vs set algebra
    posting = {}

    def ids_of(t):
        if t not in posting:
            ti = seg.terms.get(t)
            posting[t] = set() if ti is None else set(
                int(x) for x in
                seg.post_docids[ti.offset: ti.offset + ti.length])
        return posting[t]

    for bi in range(0, len(booleans), 16):
        kind, terms = booleans[bi]
        if kind == "and":
            expect = ids_of(terms[0]) & ids_of(terms[1]) & ids_of(terms[2])
        elif kind == "or":
            expect = ids_of(terms[0]) | ids_of(terms[1]) | ids_of(terms[2])
        else:
            expect = (ids_of(terms[0]) | ids_of(terms[1])) - ids_of(terms[2])
        assert res[len(phrases) + bi]["count"] == len(expect), \
            ("boolean count mismatch", kind, terms)

    qps = _timed_qps(bs, searcher, irs, seg)
    return {"index_docs_s": len(docs) / index_s, "qps": qps}


def _timed_qps(bs, searcher, irs, seg):
    """Time the PRODUCT batch path end-to-end: BatchSearcher.run includes
    host-route decisions, per-call binds/plans and result assembly, so
    host-executed conjunctive queries and device launches are measured on
    equal footing (the old loop timed pre-planned device launches only)."""
    bs.run(irs)              # warm: compiles / native registrations
    t0 = time.time()
    reps = 0
    while reps < 3 or time.time() - t0 < 5.0:
        bs.run(irs)
        reps += 1
    return len(irs) * reps / (time.time() - t0)


def build_corpus3(n_docs, seed=7):
    rng = random.Random(seed)
    words, weights = zipf_vocab(3000, rng)
    cats = [f"cat{i}" for i in range(40)]
    cat_w = [1.0 / (i + 1) ** 0.8 for i in range(40)]
    docs = []
    for _ in range(n_docs):
        docs.append({
            "body": " ".join(rng.choices(words, weights=weights, k=12)),
            "cat": rng.choices(cats, weights=cat_w)[0],
            "price": round(rng.uniform(1.0, 1000.0), 2),
        })
    return docs


def queries3(n_queries=96, seed=11):
    rng = random.Random(seed)
    out = []
    for _ in range(n_queries):
        out.append({"_and": [{"cat": f"cat{rng.randint(0, 19)}"},
                             {"body": f"w{rng.randint(0, 200)}"}]})
    return out


CFG3_AGGS = {"cats": {"_terms": {"_field": "cat", "_size": 10}},
             "price_stats": {"_stats": {"_field": "price"}}}
CFG3_SORT = [{"price": {"_order": "desc"}}]


def run_ours_config3(docs, queries):
    """Faceted serving: term filter + value sort + fused on-device aggs,
    one compilation shape per size class (BASELINE.json config 3)."""
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import numpy as np

    from xapiand_tpu import aggregations as aggs_mod
    from xapiand_tpu.database import Database
    from xapiand_tpu.query.dsl import QueryDSL, parse_sort
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher

    db = Database()
    t0 = time.time()
    for i, d in enumerate(docs):
        db.index_document(dict(d), doc_id=str(i))
    db.commit()
    index_s = time.time() - t0
    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)
    irs = [dsl.parse(q) for q in queries]
    sort = parse_sort(db.schema, CFG3_SORT)
    names, specs, arrays, metas = aggs_mod.compile_for_segment(
        db.schema, seg, CFG3_AGGS)
    searcher = SegmentSearcher(seg, db.scheme)
    bs = BatchSearcher(searcher, k=10, sort=sort, aggs=(specs, arrays),
                       min_batch=int(os.environ.get("CFG3_MIN_BATCH", "64")),
                       work_ratio=float(os.environ.get("CFG3_WORK_RATIO",
                                                       "2.0")))
    res = bs.run(irs)

    # numpy oracle on a sample: count, price-sorted top-10, stats, facets
    cat_slot = db.schema.get_field("cat").slot
    cat_names = seg.values[cat_slot].cat_names or []
    for qi in range(0, len(queries), 12):
        q = queries[qi]
        want_cat = q["_and"][0]["cat"]
        want_w = q["_and"][1]["body"]
        hits = [(d["price"], i) for i, d in enumerate(docs)
                if d["cat"] == want_cat and want_w in d["body"].split()]
        assert res[qi]["count"] == len(hits), (qi, res[qi]["count"],
                                               len(hits))
        expect_top = [i for _, i in sorted(hits,
                                           key=lambda t: (-t[0], t[1]))][:10]
        got_top = [int(d) for d, s in zip(res[qi]["docids"],
                                          res[qi]["scores"])
                   if s != float("-inf")][: len(expect_top)]
        assert got_top == expect_top, (qi, got_top, expect_top)
        if hits:
            prices = [p for p, _ in hits]
            st = res[qi]["aggs"][1]
            assert int(st["n"]) == len(hits)
            assert abs(float(st["s"]) - sum(prices)) / max(sum(prices),
                                                           1) < 1e-3
            counts = np.asarray(res[qi]["aggs"][0])
            want_code = cat_names.index(want_cat)
            assert int(counts[want_code]) == len(hits)
            assert int(counts.sum()) == len(hits)

    qps = _timed_qps(bs, searcher, irs, seg)
    return {"index_docs_s": len(docs) / index_s, "qps": qps}


def build_corpus4(n_docs, seed=7):
    rng = random.Random(seed)
    words, weights = zipf_vocab(2000, rng)
    docs = []
    for _ in range(n_docs):
        docs.append({
            "body": " ".join(rng.choices(words, weights=weights, k=12)),
            "loc": {"_point": {"_longitude": rng.uniform(-120.0, -70.0),
                               "_latitude": rng.uniform(25.0, 48.0)}},
            "ts": f"2024-{rng.randint(1, 12):02d}-"
                  f"{rng.randint(1, 28):02d}T{rng.randint(0, 23):02d}"
                  f":00:00",
        })
    return docs


def queries4(n_queries=96, seed=11):
    rng = random.Random(seed)
    out = []
    for _ in range(n_queries):
        lon = rng.uniform(-115.0, -75.0)
        lat = rng.uniform(28.0, 45.0)
        radius = rng.uniform(100_000, 400_000)
        m0 = rng.randint(1, 9)
        out.append({
            "_and": [
                {"loc": {"_circle": {"_longitude": lon, "_latitude": lat,
                                     "_radius": radius}}},
                {"ts": {"_from": f"2024-{m0:02d}-01T00:00:00",
                        "_to": f"2024-{m0 + 3:02d}-01T00:00:00"}},
            ]})
    return out


def run_ours_config4(docs, queries):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import numpy as np

    from xapiand_tpu.database import Database
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher
    from xapiand_tpu.utils import dtutils

    db = Database()
    t0 = time.time()
    for i, d in enumerate(docs):
        db.index_document(dict(d), doc_id=str(i))
    db.commit()
    index_s = time.time() - t0
    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)
    irs = [dsl.parse(q) for q in queries]
    searcher = SegmentSearcher(seg, db.scheme)
    bs = BatchSearcher(searcher, k=10)
    res = bs.run(irs)

    # brute-force parity on a sample: haversine circle + ts range
    def hav_m(lat1, lon1, lat2, lon2):
        r = 6371008.8
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp = p2 - p1
        dl = math.radians(lon2 - lon1)
        a = math.sin(dp / 2) ** 2 + \
            math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return 2 * r * math.asin(math.sqrt(a))

    for qi in range(0, len(queries), 12):
        q = queries[qi]
        circ = q["_and"][0]["loc"]["_circle"]
        rng_ts = q["_and"][1]["ts"]
        t_lo = dtutils.parse_datetime(rng_ts["_from"])
        t_hi = dtutils.parse_datetime(rng_ts["_to"])
        inside = set()
        near = set()        # within a boundary trixel of the circle edge
        for i, d in enumerate(docs):
            p = d["loc"]["_point"]
            ts = dtutils.parse_datetime(d["ts"])
            if not (t_lo <= ts <= t_hi):
                continue
            dist = hav_m(p["_latitude"], p["_longitude"],
                         circ["_latitude"], circ["_longitude"])
            if dist <= circ["_radius"]:
                inside.add(i)
            elif dist <= circ["_radius"] + 15_000:
                near.add(i)
        # HTM cover-intersection semantics exactly match the reference
        # (GeoSpatialRange::insideRanges, multivalue/geospatialrange.cc:
        # 83-110, a pure sorted range-overlap walk): every true hit
        # matches, plus possibly points in partial trixels on the circle
        # boundary (one cover-level trixel ~ <=15km here)
        got = {int(d) for d, s in zip(res[qi]["docids"], res[qi]["scores"])
               if np.isfinite(s)} if res[qi]["count"] <= 10 else None
        assert res[qi]["count"] >= len(inside), (qi, res[qi]["count"],
                                                 len(inside))
        assert res[qi]["count"] <= len(inside) + len(near), \
            (qi, res[qi]["count"], len(inside), len(near))
        if got is not None:
            assert inside <= got <= inside | near, (qi, got, inside)

    qps = _timed_qps(bs, searcher, irs, seg)
    return {"index_docs_s": len(docs) / index_s, "qps": qps}


def run_reference(binary, docs_json, query_bodies, port=18897):
    import shutil
    import subprocess
    import tempfile

    from ref_baseline import req, wait_http

    data_dir = tempfile.mkdtemp(prefix="xapiand-cfg-")
    proc = subprocess.Popen(
        [binary, "-D", data_dir, "--port", str(port), "--http-servers",
         "1", "--http-clients", "2", "--uid", "root", "--gid", "root",
         "--solo"], stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        if not wait_http(port):
            raise SystemExit("reference server did not come up")
        t0 = time.time()
        chunk = []
        for line in docs_json:
            chunk.append(line)
            if len(chunk) == 2000:
                req(port, "POST", "/cfg/:restore",
                    ("\n".join(chunk) + "\n").encode(),
                    ct="application/x-ndjson")
                chunk = []
        if chunk:
            req(port, "POST", "/cfg/:restore",
                ("\n".join(chunk) + "\n").encode(),
                ct="application/x-ndjson")
        req(port, "POST", "/cfg/:commit")
        index_s = time.time() - t0

        def body_for(q):
            b = dict(q) if isinstance(q, dict) and "_query" in q \
                else {"_query": q}
            b.setdefault("_limit", 10)
            return b

        for q in query_bodies[:8]:
            req(port, "POST", "/cfg/:search", body_for(q))
        t0 = time.time()
        for q in query_bodies:
            req(port, "POST", "/cfg/:search", body_for(q))
        dt = time.time() - t0
        return {"index_docs_s": len(docs_json) / index_s,
                "qps": len(query_bodies) / dt}
    finally:
        proc.terminate()
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()
        shutil.rmtree(data_dir, ignore_errors=True)


def build_corpus5(n_docs, seed=7):
    rng = random.Random(seed)
    words, weights = zipf_vocab(20000, rng)
    return [{"body": " ".join(rng.choices(words, weights=weights, k=16))}
            for _ in range(n_docs)]


def queries5(n_queries=256, seed=11):
    rng = random.Random(seed)
    out = []
    for _ in range(n_queries):
        terms = [f"w{rng.randint(0, 500)}" for _ in range(3)]
        out.append({"_or": [{"body": t} for t in terms]})
    return out


def run_ours_config5(docs, queries, n_shards=8):
    """BASELINE config 5: sharded cluster over a device mesh, global
    top-k merged over the interconnect. Real multi-chip hardware is not
    reachable from this host (one tunneled chip), so this row runs the
    FULL SPMD program - fnv1a routing, per-shard execute, psum counts,
    all_gather top-k merge (parallel/sharded.py) - on the 8-virtual-device
    CPU mesh the driver also uses for its multichip gate. Function + exact
    rank parity vs the unsharded engine are asserted; the QPS printed is a
    CPU-mesh number, not a TPU number (noted in the output detail).
    ≙ handler.cc:835 docid striping + DocMatcher scatter-gather."""
    # conftest.py recipe: force the virtual CPU mesh before first backend
    # use (the axon sitecustomize imports jax with JAX_PLATFORMS=axon)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from xapiand_tpu.database import Database
    from xapiand_tpu.parallel import ShardedIndex, make_mesh

    mesh = make_mesh(n_shards=n_shards, n_dp=8 // n_shards)
    idx = ShardedIndex(mesh=mesh)
    t0 = time.time()
    for i, d in enumerate(docs):
        idx.index_document(dict(d), doc_id=str(i))
    idx.commit()
    index_s = time.time() - t0

    res = idx.search_batch(queries, k=10)

    # exact rank parity vs the single-segment engine (two-phase global
    # stats make sharded scores identical, test_sharded.py invariant)
    single = Database()
    for i, d in enumerate(docs):
        single.index_document(dict(d), doc_id=str(i))
    single.commit()
    for qi in range(0, len(queries), 16):
        ref = single.search(queries[qi], k=10)
        got = res[qi]
        assert got["total"] == ref.total, (qi, got["total"], ref.total)
        np.testing.assert_allclose([h["score"] for h in got["hits"]],
                                   [h.score for h in ref.hits], rtol=1e-4)
        # ids must agree except WITHIN equal-score ties at the k boundary:
        # hash-striped global docids order ties differently than insertion
        # order, exactly like the reference's Multi backend (its merged
        # MSet tie order also depends on the shard layout, backends/
        # multi/multi_database.cc)
        by_score_got, by_score_ref = {}, {}
        for h in got["hits"]:
            by_score_got.setdefault(round(h["score"], 4), set()).add(h["id"])
        for h in ref.hits:
            by_score_ref.setdefault(round(h.score, 4), set()).add(h.id)
        ks = sorted(by_score_got, reverse=True)
        for s in ks[:-1]:       # full tie groups must match exactly
            assert by_score_got[s] == by_score_ref.get(s), (qi, s)
        if ks:                  # boundary group: same size, members must
            s = ks[-1]          # belong to the true tie set at that score
            assert len(by_score_got[s]) == len(by_score_ref.get(s, ())), qi
            wide = single.search(queries[qi], k=40)
            tie_ids = {h.id for h in wide.hits if round(h.score, 4) == s}
            assert by_score_got[s] <= tie_ids or \
                len(tie_ids) == 40, (qi, s)

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        idx.search_batch(queries, k=10)
    qps = len(queries) * reps / (time.time() - t0)
    return {"index_docs_s": len(docs) / index_s, "qps": qps}


def _enable_compile_cache():
    """Persistent XLA compile cache (same as bench.py): the tunneled
    remote-compile service is the slowest stage; warm reruns skip it."""
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, required=True,
                    choices=(2, 3, 4, 5))
    ap.add_argument("--docs", type=int, default=None)
    ap.add_argument("--binary", default="/tmp/xbuild/bin/xapiand")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--ref-only", action="store_true",
                    help="measure only the reference leg")
    args = ap.parse_args()
    _enable_compile_cache()

    if args.config == 2:
        n = args.docs or 100_000
        print(f"[cfg2] building {n} positional docs...", file=sys.stderr)
        docs = build_corpus2(n)
        phrases, booleans = queries2(docs)
        ours = run_ours_config2(docs, phrases, booleans)
        print(f"[cfg2] ours: {ours['qps']:.0f} qps", file=sys.stderr)
        ref = None
        if not args.skip_reference and os.path.exists(args.binary):
            lines = [json.dumps({"_id": str(i), "body": d})
                     for i, d in enumerate(docs)]
            bodies = [{"body": {"_phrase": f"{a} {b}"}}
                      for a, b in phrases] + \
                     [dsl_for(k, t) for k, t in booleans]
            ref = run_reference(args.binary, lines, bodies)
            print(f"[cfg2] reference: {ref['qps']:.0f} qps",
                  file=sys.stderr)
        metric = f"config2_phrase_bool_qps_{n // 1000}k_docs"
    elif args.config == 3:
        n = args.docs or 1_000_000
        print(f"[cfg3] building {n} faceted docs...", file=sys.stderr)
        docs = build_corpus3(n)
        queries = queries3()
        ours = {"qps": 0.0, "index_docs_s": 0.0} if args.ref_only \
            else run_ours_config3(docs, queries)
        print(f"[cfg3] ours: {ours['qps']:.0f} qps", file=sys.stderr)
        ref = None
        if not args.skip_reference and os.path.exists(args.binary):
            lines = [json.dumps({"_id": str(i), **d})
                     for i, d in enumerate(docs)]
            bodies = [{"_query": q, "_sort": CFG3_SORT,
                       "_aggs": CFG3_AGGS} for q in queries3()]
            ref = run_reference(args.binary, lines, bodies)
            print(f"[cfg3] reference: {ref['qps']:.0f} qps",
                  file=sys.stderr)
        metric = f"config3_faceted_qps_{n // 1000}k_docs"
    elif args.config == 5:
        n = args.docs or 200_000
        print(f"[cfg5] building {n} docs for the 8-shard mesh...",
              file=sys.stderr)
        docs = build_corpus5(n)
        queries = queries5()
        ours = run_ours_config5(docs, queries)
        print(f"[cfg5] ours (8-shard CPU mesh): {ours['qps']:.0f} qps",
              file=sys.stderr)
        ref = None
        if not args.skip_reference and os.path.exists(args.binary):
            lines = [json.dumps({"_id": str(i), **d})
                     for i, d in enumerate(docs)]
            ref = run_reference(args.binary, lines, queries5())
            print(f"[cfg5] reference: {ref['qps']:.0f} qps",
                  file=sys.stderr)
        metric = f"config5_sharded_qps_{n // 1000}k_docs"
    else:
        n = args.docs or 250_000
        print(f"[cfg4] building {n} geotagged docs...", file=sys.stderr)
        docs = build_corpus4(n)
        queries = queries4()
        ours = {"qps": 0.0, "index_docs_s": 0.0} if args.ref_only \
            else run_ours_config4(docs, queries)
        print(f"[cfg4] ours: {ours['qps']:.0f} qps", file=sys.stderr)
        ref = None
        if not args.skip_reference and os.path.exists(args.binary):
            lines = [json.dumps({"_id": str(i), **d})
                     for i, d in enumerate(docs)]
            # the from-source reference returns 0 hits for EVERY value-
            # range syntax at this snapshot (verified: numeric + datetime,
            # _in/_range and q-string forms; exact matches work), so its
            # leg runs the working subset: the geo circle alone in the
            # reference's _in form. Ours still runs circle AND ts-range.
            ref_qs = [{"loc": {"_in": q["_and"][0]["loc"]}}
                      for q in queries]
            ref = run_reference(args.binary, lines, ref_qs)
            print(f"[cfg4] reference (circle-only; its value ranges are "
                  f"broken): {ref['qps']:.0f} qps", file=sys.stderr)
        metric = f"config4_geo_time_qps_{n // 1000}k_docs"

    print(json.dumps({
        "metric": metric, "value": round(ours["qps"], 2),
        "unit": "qps/8-virtual-cpu-mesh" if args.config == 5
        else "qps/chip",
        # config 5 runs OURS on an emulated 8-device CPU mesh (no real
        # multi-chip here): a ratio against the native-CPU reference would
        # compare emulation vs silicon - report the ref number in detail
        # only ("functional + exact-parity" row, not a hardware race)
        "vs_baseline": (round(ours["qps"] / ref["qps"], 2)
                        if ref and args.config != 5 else None),
        "detail": {"ours_index_docs_s": round(ours["index_docs_s"], 1),
                   "reference": {k: round(v, 2) for k, v in ref.items()}
                   if ref else "skipped", "docs": n},
    }))


if __name__ == "__main__":
    main()
