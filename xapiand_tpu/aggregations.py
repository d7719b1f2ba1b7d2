"""Host-side aggregation DSL compilation, cross-segment merging, and
response shaping.

Reference parity target: src/aggregations/ DSL (reserved/aggregations.h):

  {"my_agg": {"_sum": {"_field": "price"}},
   "cats":   {"_terms": {"_field": "category", "_size": 10,
                         "_sort": {"_doc_count": "desc"}},
              "_aggs": {"avg_price": {"_avg": {"_field": "price"}}}},
   "hist":   {"_histogram": {"_field": "price", "_interval": 100}},
   "lovers": {"_filter": {"_term": {"fruit": "strawberry"}},
              "_aggs": {...}},
   "ranges": {"_range": {"_field": "age",
                         "_ranges": [{"_to": 30}, {"_from": 30}]}}}

Bucket aggregations (_terms/_values, _histogram, _range, _date_histogram,
_date_range, _filter, _missing) support metric sub-aggregations via the
sibling "_aggs" key and ordering via "_sort" ({"_doc_count"|"_key"|
"<sub>._max": "asc"|"desc"}), mirroring
docs/_docs/reference-guide/search/aggregations/bucket.md. The reference
declares _date_histogram/_date_range/_missing/_cardinality/_percentiles
but leaves them disabled (aggregations.cc:118-207) - implemented here.

Device kernels (ops/aggs.py) return sufficient statistics; partials from
segments/shards merge exactly here (≙ AggregationMatchSpy::merge_results,
src/database/handler.cc:1543-1545). _median/_mode merge by summing the
same fixed-grid histograms the mesh path psums (ORDER_STAT_BINS bins,
pow2 bin scale - exact on integer grids, one quantization everywhere:
single-segment, cross-segment and cross-shard results agree by
construction), clamped into the observed [min, max].
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

import numpy as np

METRICS = {"_count": "count", "_sum": "sum", "_avg": "avg", "_min": "min",
           "_max": "max", "_variance": "variance",
           "_std_deviation": "std_deviation", "_std": "std_deviation",
           "_median": "median", "_mode": "mode", "_stats": "stats",
           "_extended_stats": "extended_stats"}
BUCKETS = {"_terms", "_values", "_value", "_histogram", "_range",
           "_date_histogram", "_date_range", "_filter", "_missing"}

_CAT_BUCKETS = (16, 64, 256, 1024, 4096)

# calendar intervals in seconds (month/year roll up from days host-side)
_CAL_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
                "week": 7 * 86400}


class AggError(ValueError):
    pass


def _cat_bucket(n: int) -> int:
    for b in _CAT_BUCKETS:
        if n <= b:
            return b
    raise AggError(f"too many facet categories: {n}")


def _parse_interval(iv) -> tuple[float, str | None]:
    """-> (device interval seconds, calendar rollup or None)."""
    if isinstance(iv, (int, float)):
        return float(iv), None
    s = str(iv).strip().lower()
    if s in ("month", "year"):
        return 86400.0, s            # daily histogram, host rollup
    if s in _CAL_SECONDS:
        return float(_CAL_SECONDS[s]), None
    # "15m" / "2h" / "7d" style
    try:
        num, unit = float(s[:-1]), s[-1]
        mult = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}[unit]
        return num * mult, None
    except (ValueError, KeyError, IndexError):
        raise AggError(f"bad _interval {iv!r}")


_NESTABLE = ("_terms", "_values", "_value", "_histogram", "_range")


def _compile_subs(schema, sub_dsl: dict, segs=None, slot_ranges=None,
                  agg_params=None, pbase=""):
    """Metric sub-aggregations of a bucket -> (names, spec tuple, metas).
    Nested bucket subs are split out by compile_for_segment. median/mode
    subs (bucket.h:52 HandledSubAggregation allows any metric under any
    bucket) get a per-bucket order-stat histogram: their spec carries an
    agg_params key for the globally-agreed (lo, scale) bin grid."""
    names, specs, metas = [], [], []
    for j, (name, body) in enumerate((sub_dsl or {}).items()):
        if not isinstance(body, dict) or len(body) != 1:
            raise AggError(f"sub-aggregation {name!r} must have one type")
        key, args = next(iter(body.items()))
        kind = METRICS.get(key)
        if kind is None:
            raise AggError(
                f"sub-aggregation {name!r}: only metric sub-aggregations "
                f"are supported at this nesting depth (got {key!r})")
        if kind in ("median", "mode"):
            if agg_params is None or segs is None:
                raise AggError(f"{key} is not supported as a bucket "
                               "sub-aggregation here")
            slot = _slot_of(schema, args)
            lo, scale = _slot_range(segs, slot, slot_ranges)
            pkey = f"{pbase}s{j}"
            agg_params[pkey] = np.asarray([lo, scale], np.float32)
            specs.append((kind, slot, ORDER_STAT_BINS, pkey))
            names.append(name)
            metas.append({"kind": kind, "lo": lo, "scale": scale})
            continue
        if kind == "count":
            specs.append(("count", -1))
        else:
            specs.append((kind, _slot_of(schema, args)))
        names.append(name)
        m = {"kind": kind}
        if kind == "extended_stats" and isinstance(args, dict) \
                and "_sigma" in args:
            sig = args["_sigma"]
            if not isinstance(sig, (int, float)) or \
                    isinstance(sig, bool) or sig < 0:
                raise AggError("'_sigma' must be a positive number")
            m["sigma"] = float(sig)
        metas.append(m)
    return names, tuple(specs), metas


def _split_nested(sub_dsl: dict):
    """Partition a bucket's _aggs into (metric subs, one nested bucket)."""
    metric_dsl, nested = {}, None
    for name, body in (sub_dsl or {}).items():
        key = next(iter(body)) if isinstance(body, dict) and body else None
        if key in _NESTABLE:
            if nested is not None:
                raise AggError("at most one nested bucket aggregation is "
                               "supported per parent bucket")
            nested = (name, key, body)
        else:
            metric_dsl[name] = body
    return metric_dsl, nested


def _bucket_code_desc(schema, segment, key, args, agg_params, agg_ranges,
                      pkey):
    """Describe a code-based bucketing for composite (nested) buckets:
    -> (kind, slot, nbuckets, meta). Dynamic params registered under pkey.
    """
    slot = _slot_of(schema, args)
    if key in ("_terms", "_values", "_value"):
        col = segment.values.get(slot)
        cat_names = (col.cat_names or []) if col is not None else []
        nb = _cat_bucket(max(len(cat_names), 1))
        return ("terms", slot, nb,
                {"kind": "terms", "cat_names": list(cat_names),
                 "size": int(args.get("_size", args.get("_limit", 10))),
                 "min_doc_count": int(args.get("_min_doc_count", 1)),
                 "keyed": bool(args.get("_keyed", False)), "sort": None,
                 "sub_names": [], "sub_metas": []})
    if key == "_histogram":
        interval = float(args["_interval"])
        shift = float(args.get("_shift", 0.0))
        nb = int(args.get("_buckets", 64))
        agg_params[pkey] = np.asarray([interval, shift], np.float32)
        return ("histogram", slot, nb,
                {"kind": "histogram", "interval": interval, "shift": shift,
                 "nb": nb, "calendar": None, "dates": False,
                 "min_doc_count": int(args.get("_min_doc_count", 1)),
                 "sort": None, "keyed": bool(args.get("_keyed", False)),
                 "sub_names": [], "sub_metas": []})
    if key == "_range":
        rs = args.get("_ranges")
        if not rs:
            raise AggError("_range needs _ranges")
        bounds = np.zeros((len(rs), 2), np.float32)
        labels = []
        for j, r in enumerate(rs):
            lo = float(r.get("_from", -math.inf))
            hi = float(r.get("_to", math.inf))
            bounds[j, 0], bounds[j, 1] = lo, hi
            labels.append(r.get("_key", f"{lo}..{hi}"))
        agg_ranges[pkey] = bounds
        # nested ranges are code-based: a doc lands in its FIRST matching
        # range (documented deviation; top-level ranges stay multi-match)
        return ("range", slot, len(rs),
                {"kind": "range", "labels": labels, "sort": None,
                 "sub_names": [], "sub_metas": []})
    raise AggError(f"bucket kind {key!r} cannot nest")


ORDER_STAT_BINS = 2048


def _slot_range(segs, slot, slot_ranges=None):
    """Global [lo, hi] of a value slot + the power-of-two bin scale for
    the mergeable order-statistic histogram. slot_ranges overrides with a
    range spanning MORE segments than this compile sees (Database passes
    all its segments; ShardedDatabase all generations) so partials from
    different compiles share one bin grid."""
    if slot_ranges is not None and slot in slot_ranges:
        lo, hi = slot_ranges[slot]
    else:
        lo, hi, seen = 0.0, 0.0, False
        for sg in segs:
            col = sg.values.get(slot)
            if col is not None and col.present.any():
                vals = col.fval[col.present]
                l, h = float(vals.min()), float(vals.max())
                lo, hi = (l, h) if not seen else (min(lo, l), max(hi, h))
                seen = True
    span = hi - lo
    if span <= 0:
        scale = 1.0
    else:
        scale = 2.0 ** math.floor(math.log2((ORDER_STAT_BINS - 1) / span))
    return lo, scale


def slot_ranges_of(segments) -> dict:
    """{slot: (min, max)} over every value column - callers that merge
    agg partials from SEPARATE compiles (Database across segments,
    ShardedDatabase across generations) pass this so order-stat histograms
    share one bin grid."""
    out: dict = {}
    for sg in segments:
        for slot, col in sg.values.items():
            if col.present.any():
                vals = col.fval[col.present]
                l, h = float(vals.min()), float(vals.max())
                if slot in out:
                    ol, oh = out[slot]
                    out[slot] = (min(ol, l), max(oh, h))
                else:
                    out[slot] = (l, h)
    return out


def compile_for_segment(schema, segment, aggs_dsl: dict, slot_ranges=None):
    """-> (names, specs tuple, agg_arrays dict, meta per agg).

    segment may be a list of segments (mesh path): data-dependent anchors
    (date-histogram minimum, order-stat histogram ranges) then span all of
    them; slot_ranges widens those ranges further (see _slot_range)."""
    segs = segment if isinstance(segment, list) else [segment]
    segment = segs[0]
    names, specs, meta = [], [], []
    agg_params, agg_ranges, agg_filters = {}, {}, {}
    for i, (name, body) in enumerate(aggs_dsl.items()):
        if not isinstance(body, dict):
            raise AggError(f"aggregation {name!r} must be an object")
        sub_dsl = body.get("_aggs", body.get("_aggregations"))
        tkeys = [k for k in body if k not in ("_aggs", "_aggregations",
                                              "_meta")]
        if len(tkeys) != 1:
            raise AggError(f"aggregation {name!r} must have exactly one type")
        key = tkeys[0]
        args = body[key]
        if sub_dsl and key in METRICS:
            raise AggError(f"metric aggregation {name!r} cannot hold _aggs")
        nested = None
        if sub_dsl and key in _NESTABLE:
            metric_dsl, nested = _split_nested(sub_dsl)
            if nested is not None:
                sub_dsl = metric_dsl
        sub_names, sub_specs, sub_metas = _compile_subs(
            schema, sub_dsl, segs, slot_ranges, agg_params, str(i)) \
            if sub_dsl else ([], (), [])
        sort = args.get("_sort") if isinstance(args, dict) else None

        if nested is not None:
            # bucket-in-bucket chain of ANY depth via composite codes
            # (reference aggregations.cc:118-207 nest through sub_aggs;
            # the device computes one one-hot count per prefix level, so
            # total composite width is capped at 4096)
            chain = [(key, args, sub_dsl)]
            cur = nested
            child_names = []
            while cur is not None:
                c_name, c_key, c_body = cur
                c_args = c_body[c_key]
                c_sub = c_body.get("_aggs", c_body.get("_aggregations"))
                c_metrics, cur = _split_nested(c_sub) if c_sub \
                    else ({}, None)
                child_names.append(c_name)
                chain.append((c_key, c_args, c_metrics))
            descs, level_metas, level_subs = [], [], []
            total_nb = 1
            for lvl, (l_key, l_args, l_sub) in enumerate(chain):
                l_names, l_specs, l_metas = _compile_subs(
                    schema, l_sub, segs, slot_ranges, agg_params,
                    f"{i}:{lvl}") \
                    if l_sub else ([], (), [])
                d = _bucket_code_desc(schema, segment, l_key, l_args,
                                      agg_params, agg_ranges, f"{i}:{lvl}")
                m = d[3]
                m["sort"] = l_args.get("_sort") \
                    if isinstance(l_args, dict) else None
                m["sub_names"], m["sub_metas"] = l_names, l_metas
                descs.append((d[0], d[1], d[2], f"{i}:{lvl}"))
                level_metas.append(m)
                level_subs.append(l_specs)
                total_nb *= d[2]
            if total_nb > 4096:
                raise AggError(f"nested aggregation {name!r}: composite "
                               f"bucket count {total_nb} > 4096")
            specs.append(("nested", tuple(descs), tuple(level_subs)))
            meta.append({"kind": "nested", "levels": level_metas,
                         "child_names": child_names})
            names.append(name)
            continue

        if key in METRICS:
            kind = METRICS[key]
            if kind == "count":
                specs.append(("count",))
                meta.append({"kind": kind})
            elif kind in ("median", "mode"):
                slot = _slot_of(schema, args)
                lo, scale = _slot_range(segs, slot, slot_ranges)
                specs.append((kind, slot, ORDER_STAT_BINS))
                agg_params[str(i)] = np.asarray([lo, scale], np.float32)
                meta.append({"kind": kind, "lo": lo, "scale": scale})
            else:
                slot = _slot_of(schema, args)
                specs.append((kind, slot))
                m = {"kind": kind}
                if kind == "extended_stats" and isinstance(args, dict):
                    # ≙ metrics.h:752 RESERVED_AGGS_SIGMA (bounds width)
                    sig = args.get("_sigma", 2.0)
                    if not isinstance(sig, (int, float)) or \
                            isinstance(sig, bool) or sig < 0:
                        raise AggError("'_sigma' must be a positive number")
                    m["sigma"] = float(sig)
                meta.append(m)
        elif key in ("_terms", "_values", "_value"):
            slot = _slot_of(schema, args)
            col = segment.values.get(slot)
            cat_names = (col.cat_names or []) if col is not None else []
            ncats = _cat_bucket(max(len(cat_names), 1))
            specs.append(("terms", slot, ncats, sub_specs))
            meta.append({"kind": "terms", "cat_names": list(cat_names),
                         "size": int(args.get("_size",
                                              args.get("_limit", 10))),
                         "keyed": bool(args.get("_keyed", False)),
                         "min_doc_count": int(args.get("_min_doc_count", 1)),
                         "sort": sort,
                         "sub_names": sub_names, "sub_metas": sub_metas})
        elif key in ("_histogram", "_date_histogram"):
            slot = _slot_of(schema, args)
            calendar = None
            if key == "_date_histogram":
                interval, calendar = _parse_interval(args["_interval"])
                # anchor at the column's min so the bucket range is data-
                # bounded (host knows it; the device histogram is dense)
                vmin = 0.0
                seen = False
                for sg in segs:
                    col = sg.values.get(slot)
                    if col is not None and col.present.any():
                        m = float(col.fval[col.present].min())
                        vmin = m if not seen else min(vmin, m)
                        seen = True
                shift = math.floor(vmin / interval) * interval
                nb = 4096
            else:
                interval = float(args["_interval"])
                shift = float(args.get("_shift", 0.0))
                nb = int(args.get("_buckets", 64))
            specs.append(("histogram", slot, nb, sub_specs))
            agg_params[str(i)] = np.asarray([interval, shift], np.float32)
            meta.append({"kind": "histogram", "interval": interval,
                         "shift": shift, "nb": nb, "calendar": calendar,
                         "dates": key == "_date_histogram",
                         "min_doc_count": int(args.get("_min_doc_count", 1)),
                         "sort": sort, "keyed": bool(args.get("_keyed",
                                                              False)),
                         "sub_names": sub_names, "sub_metas": sub_metas})
        elif key == "_cardinality":
            slot = _slot_of(schema, args)
            specs.append(("cardinality", slot))
            meta.append({"kind": "cardinality"})
        elif key in ("_percentiles", "_percentiles_rank"):
            slot = _slot_of(schema, args)
            pcts = [float(p) / 100.0 for p in
                    args.get("_percentiles", [1, 5, 25, 50, 75, 95, 99])]
            lo, scale = _slot_range(segs, slot, slot_ranges)
            specs.append(("percentiles", slot, ORDER_STAT_BINS))
            agg_params[str(i)] = np.asarray([lo, scale], np.float32)
            meta.append({"kind": "percentiles", "lo": lo, "scale": scale,
                         "pcts": [p * 100 for p in pcts]})
        elif key in ("_range", "_date_range"):
            slot = _slot_of(schema, args)
            rs = args.get("_ranges")
            if not rs:
                raise AggError(f"{key} aggregation {name!r} needs _ranges")
            is_date = key == "_date_range"
            bounds = np.zeros((len(rs), 2), np.float32)
            labels = []
            for j, r in enumerate(rs):
                if is_date:
                    from xapiand_tpu.utils import dtutils
                    lo = dtutils.parse_datetime(r["_from"]) \
                        if "_from" in r else -math.inf
                    hi = dtutils.parse_datetime(r["_to"]) \
                        if "_to" in r else math.inf
                else:
                    lo = float(r.get("_from", -math.inf))
                    hi = float(r.get("_to", math.inf))
                bounds[j, 0], bounds[j, 1] = lo, hi
                labels.append(r.get("_key", f"{lo}..{hi}"))
            specs.append(("range", slot, len(rs), sub_specs))
            agg_ranges[str(i)] = bounds
            meta.append({"kind": "range", "labels": labels, "sort": sort,
                         "sub_names": sub_names, "sub_metas": sub_metas})
        elif key == "_filter":
            terms_obj = args.get("_term") if isinstance(args, dict) else None
            if not isinstance(terms_obj, dict) or not terms_obj:
                raise AggError(f"_filter aggregation {name!r} needs _term")
            term_spans = []
            for fld, val in terms_obj.items():
                term_spans.append(_filter_term_span(schema, segment,
                                                    fld, val))
            Lf = 128
            for _, ln in term_spans:
                while ln > Lf:
                    Lf *= 4
            specs.append(("filter", len(term_spans), Lf, sub_specs))
            agg_filters[str(i)] = np.asarray(term_spans, np.int32)
            meta.append({"kind": "filter",
                         "sub_names": sub_names, "sub_metas": sub_metas})
        elif key in ("_geo_bounds", "_geo_centroid"):
            slot = _slot_of(schema, args)
            specs.append(("geo_stats", slot))
            meta.append({"kind": key[1:]})
        elif key == "_geo_distance":
            slot = _slot_of(schema, args)
            rs = args.get("_ranges")
            if not rs:
                raise AggError(f"_geo_distance {name!r} needs _ranges")
            origin = args.get("_origin", args.get("_point"))
            if origin is None:
                raise AggError(f"_geo_distance {name!r} needs _origin")
            if isinstance(origin, (list, tuple)):
                lat, lon = float(origin[0]), float(origin[1])
            else:
                from xapiand_tpu.geo import geospatial
                _, (lat, lon) = geospatial.extract(origin)
            bounds = np.zeros((len(rs), 2), np.float32)
            labels = []
            for j, r in enumerate(rs):
                lo = float(r.get("_from", 0.0))
                hi = float(r.get("_to", math.inf))
                bounds[j, 0], bounds[j, 1] = lo, hi
                labels.append(r.get("_key", f"{lo}..{hi}"))
            specs.append(("geodist_range", slot, len(rs), sub_specs))
            agg_ranges[str(i)] = bounds
            agg_params[str(i)] = np.asarray([lat, lon], np.float32)
            meta.append({"kind": "range", "labels": labels, "sort": sort,
                         "sub_names": sub_names, "sub_metas": sub_metas})
        elif key == "_ip_range":
            # reserved-but-disabled in the reference (aggregations.cc:86) -
            # semantics defined here: exact u64-key range buckets over an ip
            # field; _from inclusive, _to exclusive (like _range), or _cidr
            from xapiand_tpu.utils import iputils
            from xapiand_tpu.utils import serialise as _ser

            slot = _slot_of(schema, args)
            rs = args.get("_ranges")
            if not rs:
                raise AggError(f"_ip_range aggregation {name!r} needs _ranges")
            bounds = np.zeros((len(rs), 4), np.int32)
            labels = []
            for j, r in enumerate(rs):
                if "_cidr" in r or "_mask" in r:
                    cidr = r.get("_cidr", r.get("_mask"))
                    # clamps IPv6 prefixes finer than float53 resolution
                    # to the enclosing bucket (iputils.ip_interval_keys)
                    fkey, tkey = iputils.ip_interval_keys(cidr)
                    labels.append(r.get("_key", str(cidr)))
                else:
                    lo_v = iputils.parse_ip(r["_from"]) if "_from" in r \
                        else None
                    hi_v = iputils.parse_ip(r["_to"]) if "_to" in r else None
                    labels.append(r.get("_key",
                                        f"{r.get('_from', '*')}.."
                                        f"{r.get('_to', '*')}"))
                    fkey = _ser.sortable_key_u64(lo_v) if lo_v is not None \
                        else 0
                    tkey = (_ser.sortable_key_u64(hi_v) - 1) \
                        if hi_v is not None else 2**64 - 1
                    if tkey < fkey:
                        tkey = fkey
                bounds[j, 0], bounds[j, 1] = _ser.split_key(fkey)
                bounds[j, 2], bounds[j, 3] = _ser.split_key(tkey)
            specs.append(("key_range", slot, len(rs), sub_specs))
            agg_ranges[str(i)] = bounds
            meta.append({"kind": "range", "labels": labels, "sort": sort,
                         "sub_names": sub_names, "sub_metas": sub_metas})
        elif key == "_geo_ip":
            # reserved-but-disabled in the reference (aggregations.cc:87).
            # No GeoIP database ships with either engine, so the location
            # table is caller-supplied: _networks = [{"_key": "us-east",
            # "_cidrs": ["3.0.0.0/8", ...]}, ...]; docs bucket into every
            # location whose CIDRs cover their address.
            from xapiand_tpu.utils import iputils
            from xapiand_tpu.utils import serialise as _ser

            slot = _slot_of(schema, args)
            nets = args.get("_networks")
            if not nets:
                raise AggError(f"_geo_ip aggregation {name!r} needs "
                               "_networks")
            rows, assign, labels = [], [], []
            for j, net in enumerate(nets):
                cidrs = net.get("_cidrs")
                if cidrs is None and "_cidr" in net:
                    cidrs = [net["_cidr"]]
                if not cidrs:
                    raise AggError(f"_geo_ip network #{j} needs _cidrs")
                labels.append(net.get("_key", str(cidrs[0])))
                for cidr in cidrs:
                    fkey, tkey = iputils.ip_interval_keys(cidr)
                    fh, fl = _ser.split_key(fkey)
                    th, tl = _ser.split_key(tkey)
                    rows.append((fh, fl, th, tl))
                    assign.append(j)
            specs.append(("geo_ip", slot, len(nets), len(rows), sub_specs))
            agg_ranges[str(i)] = np.asarray(rows, np.int32)
            agg_params[str(i)] = np.asarray(assign, np.int32)
            meta.append({"kind": "range", "labels": labels, "sort": sort,
                         "sub_names": sub_names, "sub_metas": sub_metas})
        elif key == "_geo_trixels":
            # reserved-but-disabled in the reference (aggregations.cc:82):
            # facet geo docs by HTM trixel at _level (<= 13); buckets are
            # codes into a sorted table of the trixels present, shaped like
            # a terms facet with HTM names ("s0123...") as keys
            from xapiand_tpu.geo import htm

            slot = _slot_of(schema, args)
            level = int(args.get("_level", 8))
            if not (0 <= level <= htm.MAX_LEVEL):
                raise AggError(f"_geo_trixels _level must be 0..13")
            shift = 2 * (htm.MAX_LEVEL - level)
            tris: set[int] = set()
            for sg in segs:
                g = sg.geo.get(slot)
                if g is None or len(g.flat_start) == 0:
                    continue
                nd = sg.num_docs
                lens = g.doc_len[:nd]
                first = g.flat_start[np.minimum(g.doc_off[:nd],
                                                max(len(g.flat_start) - 1,
                                                    0))]
                tris.update(np.unique(first[lens > 0] >> shift).tolist())
            table = np.asarray(sorted(tris), np.int32)
            nb = _cat_bucket(max(len(table), 1))
            padded = np.full(nb, 2**31 - 1, np.int32)
            padded[: len(table)] = table
            specs.append(("geo_trixels", slot, nb, shift, sub_specs))
            agg_params[str(i)] = padded
            meta.append({"kind": "terms",
                         "cat_names": [htm.trixel_name(int(t), level)
                                       for t in table],
                         "size": int(args.get("_size",
                                              args.get("_limit", 10))),
                         "keyed": bool(args.get("_keyed", False)),
                         "min_doc_count": int(args.get("_min_doc_count", 1)),
                         "sort": sort,
                         "sub_names": sub_names, "sub_metas": sub_metas})
        elif key == "_missing":
            slot = _slot_of(schema, args)
            specs.append(("missing", slot, sub_specs))
            meta.append({"kind": "missing",
                         "sub_names": sub_names, "sub_metas": sub_metas})
        else:
            raise AggError(f"unknown aggregation type {key!r}")
        names.append(name)
    arrays = {}
    if agg_params:
        arrays["agg_params"] = agg_params
    if agg_ranges:
        arrays["agg_ranges"] = agg_ranges
    if agg_filters:
        arrays["agg_filters"] = agg_filters
    return names, tuple(specs), arrays, meta


def _filter_term_span(schema, segment, field, value) -> tuple[int, int]:
    """(offset, length) of the filter term's postings in this segment."""
    from xapiand_tpu.query.dsl import QueryDSL

    q = QueryDSL(schema).field_query(str(field), value)
    # a filter must be a single concrete term (docs filter-aggregation.md)
    if q.op not in ("term", "or_terms") or len(q.terms) != 1:
        raise AggError(f"_filter._term on {field!r} must resolve to one "
                       f"term (got {q.op})")
    ti = segment.get_term(q.terms[0])
    if ti is None:
        return (0, 0)
    return (ti.offset, ti.length)


def _slot_of(schema, args) -> int:
    field = args.get("_field") if isinstance(args, dict) else args
    if not field:
        raise AggError("aggregation needs _field")
    spec = schema.get_field(str(field))
    if spec.slot is None:
        raise AggError(f"field {field!r} has no value slot")
    return spec.slot


# ---------------------------------------------------------------------------
# merge + shape
# ---------------------------------------------------------------------------

def _merge_sub_parts(sub_parts_per_segment):
    """Merge per-bucket sufficient stats across segments.

    each part: {"n": [nb], "s": [nb], "s2": [nb], "min": [nb], "max": [nb]}
    """
    out = None
    for p in sub_parts_per_segment:
        p = {k: np.asarray(v, np.float64) for k, v in p.items()}
        if out is None:
            out = dict(p)
        else:
            out["n"] = out["n"] + p["n"]
            out["s"] = out["s"] + p["s"]
            out["s2"] = out["s2"] + p["s2"]
            out["min"] = np.minimum(out["min"], p["min"])
            out["max"] = np.maximum(out["max"], p["max"])
            if "hist2" in p:
                out["hist2"] = out["hist2"] + p["hist2"]
    return out


def _shape_metric(kind, n, s, s2, vmin, vmax, sigma=2.0):
    mean = s / n if n else None
    var = max(s2 / n - mean * mean, 0.0) if n else None
    if kind == "count":
        return {"_count": int(n)}
    if kind == "sum":
        return {"_sum": s}
    if kind == "avg":
        return {"_avg": mean}
    if kind == "min":
        return {"_min": vmin if n else None}
    if kind == "max":
        return {"_max": vmax if n else None}
    if kind == "variance":
        return {"_variance": var}
    if kind == "std_deviation":
        return {"_std_deviation": math.sqrt(var) if var is not None
                else None}
    if kind == "stats":
        return {"_count": int(n), "_min": vmin if n else None,
                "_max": vmax if n else None, "_avg": mean, "_sum": s}
    if kind == "extended_stats":
        std = math.sqrt(var) if var is not None else None
        # _std_deviation_bounds at mean +- _sigma*std (metrics.h:773-775)
        bounds = {"_upper": mean + sigma * std,
                  "_lower": mean - sigma * std} \
            if (std is not None and mean is not None) else \
            {"_upper": None, "_lower": None}
        return {"_count": int(n), "_min": vmin if n else None,
                "_max": vmax if n else None, "_avg": mean, "_sum": s,
                "_sum_of_squares": s2, "_variance": var,
                "_std_deviation": std,
                "_std_deviation_bounds": bounds}
    raise AggError(f"unshapeable metric {kind!r}")


def _shape_subs(meta, merged_subs, b):
    """Shape bucket b's sub-aggregation values."""
    out = {}
    for sub_name, sub_meta, ms in zip(meta["sub_names"], meta["sub_metas"],
                                      merged_subs):
        kind = sub_meta["kind"]
        if kind in ("median", "mode"):
            hist = np.asarray(ms["hist2"][b], np.float64)
            htotal = int(round(hist.sum()))
            vmin, vmax = float(ms["min"][b]), float(ms["max"][b])
            lo_b, sc_b = sub_meta["lo"], sub_meta["scale"]
            if htotal == 0:
                out[sub_name] = {f"_{kind}": None}
            elif kind == "median":
                v1 = _hist_rank_value(hist, (htotal - 1) // 2, lo_b, sc_b)
                v2 = _hist_rank_value(hist, htotal // 2, lo_b, sc_b)
                out[sub_name] = {"_median":
                                 min(max((v1 + v2) / 2.0, vmin), vmax)}
            else:
                bi = int(np.argmax(hist))
                out[sub_name] = {"_mode":
                                 min(max(lo_b + bi / sc_b, vmin), vmax)}
            continue
        out[sub_name] = _shape_metric(
            kind, float(ms["n"][b]), float(ms["s"][b]),
            float(ms["s2"][b]), float(ms["min"][b]), float(ms["max"][b]),
            sigma=sub_meta.get("sigma", 2.0))
    return out


def _bucket_sort_key(meta, merged_subs):
    """-> (key_fn over bucket dicts, reverse) honoring _sort."""
    sort = meta.get("sort")
    if not sort:
        return None, False
    if not isinstance(sort, dict) or len(sort) != 1:
        raise AggError(f"bad _sort {sort!r}")
    field, order = next(iter(sort.items()))
    if isinstance(order, dict):
        # object form {"_doc_count": {"_order": "desc"}} (bucket.h:244)
        if "_order" not in order:
            raise AggError(f"'_sort.{field}' must contain '_order'")
        order = order["_order"]
    reverse = str(order).lower() == "desc"
    if field == "_doc_count":
        return (lambda b: b["_doc_count"]), reverse
    if field == "_key":
        return (lambda b: b["_key"]), reverse
    # "<sub_name>._max" style
    sub, _, metric = field.partition(".")
    if not metric:
        raise AggError(f"bad _sort field {field!r}")

    def key(b):
        v = b.get(sub, {}).get(metric)
        return (v is None, v if v is not None else 0.0)
    return key, reverse


def _iso(ts: float) -> str:
    return datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S")


def merge_and_shape(names, metas, parts_per_segment, cat_names_per_segment):
    """parts_per_segment: list over segments of tuples (one per agg)."""
    out = {}
    for i, (name, meta) in enumerate(zip(names, metas)):
        parts = [p[i] for p in parts_per_segment]
        kind = meta["kind"]
        if kind == "count":
            out[name] = {"_count": int(sum(int(p) for p in parts))}
        elif kind in ("sum", "avg", "min", "max", "variance",
                      "std_deviation", "median", "mode", "stats",
                      "extended_stats"):
            n = sum(float(p["n"]) for p in parts)
            s = sum(float(p["s"]) for p in parts)
            s2 = sum(float(p["s2"]) for p in parts)
            vmin = min((float(p["min"]) for p in parts), default=math.inf)
            vmax = max((float(p["max"]) for p in parts), default=-math.inf)
            if kind == "median":
                hist, htotal = _sum_hists(parts)
                if htotal == 0:
                    out[name] = {"_median": None}
                else:
                    lo_b, sc_b = meta["lo"], meta["scale"]
                    v1 = _hist_rank_value(hist, (htotal - 1) // 2, lo_b,
                                          sc_b)
                    v2 = _hist_rank_value(hist, htotal // 2, lo_b, sc_b)
                    out[name] = {"_median":
                                 min(max((v1 + v2) / 2.0, vmin), vmax)}
            elif kind == "mode":
                hist, htotal = _sum_hists(parts)
                if htotal == 0:
                    out[name] = {"_mode": None}
                else:
                    b = int(np.argmax(hist))
                    out[name] = {"_mode":
                                 min(max(meta["lo"] + b / meta["scale"],
                                         vmin), vmax)}
            else:
                out[name] = _shape_metric(kind, n, s, s2, vmin, vmax,
                                          sigma=meta.get("sigma", 2.0))
        elif kind == "cardinality":
            # exact within one part; across parts (segments/shards) the
            # max-merged HLL registers give the union estimate, clamped
            # into the rigorous bounds [max(exact), sum(exact)] - so a
            # single part (or pre-merged mesh partial from one shard)
            # stays exact
            n_sum = sum(int(p["n"]) for p in parts)
            n_max = max((int(p["maxn"]) for p in parts), default=0)
            if n_sum == n_max:
                out[name] = {"_cardinality": n_max}
            else:
                regs = None
                for p in parts:
                    r = np.asarray(p["hll"], np.float64)
                    regs = r if regs is None else np.maximum(regs, r)
                est = int(round(_hll_estimate(regs)))
                out[name] = {"_cardinality": min(max(est, n_max), n_sum)}
        elif kind in ("geo_bounds", "geo_centroid"):
            n = sum(float(p["n"]) for p in parts)
            if kind == "geo_centroid":
                slat = sum(float(p["slat"]) for p in parts)
                slon = sum(float(p["slon"]) for p in parts)
                out[name] = {"_geo_centroid": {
                    "_latitude": slat / n if n else None,
                    "_longitude": slon / n if n else None,
                    "_count": int(n)}}
            else:
                out[name] = {"_geo_bounds": {
                    "_top_left": {
                        "_latitude": max((float(p["maxlat"])
                                          for p in parts), default=None),
                        "_longitude": min((float(p["minlon"])
                                           for p in parts), default=None)},
                    "_bottom_right": {
                        "_latitude": min((float(p["minlat"])
                                          for p in parts), default=None),
                        "_longitude": max((float(p["maxlon"])
                                           for p in parts), default=None)},
                    "_count": int(n)}} if n else {"_geo_bounds": None}
        elif kind == "percentiles":
            # exact-rank selection from the summed order-stat histogram
            # (psum'd across shards / summed across segments); endpoint
            # percentiles use the exact min/max partials
            hist, htotal = _sum_hists(parts)
            vmin = min((float(p["min"]) for p in parts), default=math.inf)
            vmax = max((float(p["max"]) for p in parts), default=-math.inf)
            shaped = {}
            for pct in meta["pcts"]:
                key_s = str(int(pct)) if pct == int(pct) else str(pct)
                if htotal == 0:
                    shaped[key_s] = None
                elif pct <= 0:
                    shaped[key_s] = vmin
                elif pct >= 100:
                    shaped[key_s] = vmax
                else:
                    rank = int(pct / 100.0 * (htotal - 1))
                    v = _hist_rank_value(hist, rank, meta["lo"],
                                         meta["scale"])
                    shaped[key_s] = min(max(v, vmin), vmax)
            out[name] = {"_percentiles": shaped}
        elif kind == "terms":
            has_subs = bool(meta.get("sub_names"))
            counts: dict[str, int] = {}
            sub_by_key: dict[str, list] = {}
            for seg_idx, p in enumerate(parts):
                seg_cats = cat_names_per_segment[seg_idx].get(i, [])
                arr = np.asarray(p["counts"] if has_subs else p)
                subs = p.get("subs") if has_subs else None
                for code, c in enumerate(arr):
                    if c > 0 and code < len(seg_cats):
                        key = seg_cats[code]
                        counts[key] = counts.get(key, 0) + int(c)
                        if has_subs:
                            sub_by_key.setdefault(key, []).append(
                                [{kk: np.asarray(vv)[code]
                                  for kk, vv in sm.items()}
                                 for sm in subs])
            buckets = []
            for k, v in counts.items():
                b = {"_key": k, "_doc_count": v}
                if has_subs:
                    # merge this key's per-segment scalar sub stats
                    merged = []
                    for si in range(len(meta["sub_names"])):
                        merged.append(_merge_sub_parts(
                            [{kk: np.asarray([vv]) for kk, vv in seg[si].items()}
                             for seg in sub_by_key.get(k, [])]))
                    b.update(_shape_subs(meta, merged, 0))
                buckets.append(b)
            key_fn, reverse = _bucket_sort_key(meta, None)
            if key_fn is None:
                buckets.sort(key=lambda b: (-b["_doc_count"], b["_key"]))
            else:
                buckets.sort(key=key_fn, reverse=reverse)
            mdc = meta.get("min_doc_count", 1)
            buckets = [b for b in buckets if b["_doc_count"] >= mdc]
            buckets = buckets[: meta.get("size", 10)]
            if meta.get("keyed"):
                out[name] = {b.pop("_key"): b for b in buckets}
            else:
                out[name] = buckets
        elif kind == "histogram":
            has_subs = bool(meta.get("sub_names"))
            total = None
            merged_subs = None
            for p in parts:
                c = np.asarray(p["counts"] if has_subs else p, np.int64)
                total = c if total is None else total + c
            if has_subs:
                merged_subs = [
                    _merge_sub_parts([p["subs"][si] for p in parts])
                    for si in range(len(meta["sub_names"]))]
            interval, shift = meta["interval"], meta["shift"]
            calendar = meta.get("calendar")
            if calendar:
                out[name] = _calendar_rollup(meta, total, merged_subs)
                continue
            buckets = []
            for b, c in enumerate(total):
                if int(c) >= meta.get("min_doc_count", 1):
                    key = b * interval + shift
                    bd = {"_key": _iso(key) if meta.get("dates") else key,
                          "_doc_count": int(c)}
                    if has_subs:
                        bd.update(_shape_subs(meta, merged_subs, b))
                    buckets.append(bd)
            key_fn, reverse = _bucket_sort_key(meta, None)
            if key_fn is not None:
                buckets.sort(key=key_fn, reverse=reverse)
            if meta.get("keyed"):
                out[name] = {str(b.pop("_key")): b for b in buckets}
            else:
                out[name] = buckets
        elif kind == "range":
            has_subs = bool(meta.get("sub_names"))
            total = None
            for p in parts:
                c = np.asarray(p["counts"] if has_subs else p, np.int64)
                total = c if total is None else total + c
            merged_subs = [
                _merge_sub_parts([p["subs"][si] for p in parts])
                for si in range(len(meta["sub_names"]))] if has_subs else None
            buckets = []
            for b, (lbl, c) in enumerate(zip(meta["labels"], total)):
                bd = {"_key": lbl, "_doc_count": int(c)}
                if has_subs:
                    bd.update(_shape_subs(meta, merged_subs, b))
                buckets.append(bd)
            out[name] = buckets
        elif kind == "nested":
            out[name] = _shape_nested(i, meta, parts,
                                      cat_names_per_segment)
        elif kind in ("filter", "missing"):
            n = sum(int(np.asarray(p["count"])) for p in parts)
            bd = {"_doc_count": n}
            if meta.get("sub_names"):
                merged_subs = [
                    _merge_sub_parts([p["subs"][si] for p in parts])
                    for si in range(len(meta["sub_names"]))]
                bd.update(_shape_subs(meta, merged_subs, 0))
            out[name] = bd
    return out


def _bucket_key(bmeta, b, names):
    """Human key for code b of a code-based bucketing."""
    k = bmeta["kind"]
    if k == "terms":
        return names[b] if b < len(names) else None
    if k == "histogram":
        return b * bmeta["interval"] + bmeta["shift"]
    return bmeta["labels"][b]


def _shape_nested(i, meta, parts, cat_names_per_segment):
    """Shape a bucket-in-bucket chain of any depth: per-segment code
    spaces map to keys first (terms codes are segment-local), then merge
    by key path into a tree and shape level by level."""
    levels = meta["levels"]
    child_names = meta["child_names"]
    L = len(levels)
    root: dict = {"children": {}}
    for seg_idx, p in enumerate(parts):
        counts_list = [np.asarray(c) for c in p["counts"]]
        subs_list = p.get("subs")
        # per-segment level widths: counts_l has shape prod(nb_0..l)
        nbs, prev = [], 1
        for c in counts_list:
            nbs.append(len(c) // prev)
            prev = len(c)
        tables = [cat_names_per_segment[seg_idx].get((i, lvl), [])
                  for lvl in range(L)]
        for lvl in range(L):
            c = counts_list[lvl]
            subs_l = subs_list[lvl] if subs_list else None
            for comp_idx in np.nonzero(c)[0]:
                x = int(comp_idx)
                digits = [0] * (lvl + 1)
                for j in range(lvl, -1, -1):
                    digits[j] = x % nbs[j]
                    x //= nbs[j]
                keys = [_bucket_key(levels[j], digits[j], tables[j])
                        for j in range(lvl + 1)]
                if any(k is None for k in keys):
                    continue
                node = root
                for k in keys:
                    node = node["children"].setdefault(
                        k, {"_doc_count": 0, "subs": [], "children": {}})
                node["_doc_count"] += int(c[comp_idx])
                if subs_l:
                    node["subs"].append(
                        [{kk: np.asarray(vv)[comp_idx: comp_idx + 1]
                          for kk, vv in sm.items()} for sm in subs_l])

    def shape_level(children: dict, lvl: int):
        lm = levels[lvl]
        buckets = []
        for k in sorted(children, key=lambda x: (str(type(x)), x)):
            nd = children[k]
            bd = {"_key": k, "_doc_count": nd["_doc_count"]}
            if lm.get("sub_names") and nd["subs"]:
                merged = [
                    _merge_sub_parts([seg[si] for seg in nd["subs"]])
                    for si in range(len(lm["sub_names"]))]
                bd.update(_shape_subs(lm, merged, 0))
            if lvl + 1 < L:
                bd[child_names[lvl]] = shape_level(nd["children"], lvl + 1)
            buckets.append(bd)
        key_fn, reverse = _bucket_sort_key(lm, None)
        if key_fn is None:
            buckets.sort(key=lambda b: (-b["_doc_count"], str(b["_key"])))
        else:
            buckets.sort(key=key_fn, reverse=reverse)
        mdc = lm.get("min_doc_count", 1)
        buckets = [b for b in buckets if b["_doc_count"] >= mdc]
        return buckets[: lm.get("size", len(buckets))]

    return shape_level(root["children"], 0)


def _calendar_rollup(meta, daily_counts, merged_subs):
    """Roll daily device buckets into exact calendar months/years."""
    interval, shift = meta["interval"], meta["shift"]
    calendar = meta["calendar"]
    has_subs = bool(meta.get("sub_names"))
    groups: dict[str, dict] = {}
    for b, c in enumerate(daily_counts):
        if int(c) == 0 and not has_subs:
            continue
        ts = b * interval + shift
        dt = datetime.fromtimestamp(ts, tz=timezone.utc)
        key = f"{dt.year:04d}-{dt.month:02d}" if calendar == "month" \
            else f"{dt.year:04d}"
        g = groups.setdefault(key, {"_doc_count": 0, "_subs": None})
        g["_doc_count"] += int(c)
        if has_subs:
            if g["_subs"] is None:
                g["_subs"] = [
                    {kk: np.asarray([vv[b]], np.float64)
                     for kk, vv in ms.items()} for ms in merged_subs]
            else:
                for si, ms in enumerate(merged_subs):
                    cur = g["_subs"][si]
                    cur["n"][0] += float(ms["n"][b])
                    cur["s"][0] += float(ms["s"][b])
                    cur["s2"][0] += float(ms["s2"][b])
                    cur["min"][0] = min(cur["min"][0], float(ms["min"][b]))
                    cur["max"][0] = max(cur["max"][0], float(ms["max"][b]))
    buckets = []
    for key in sorted(groups):
        g = groups[key]
        if g["_doc_count"] < meta.get("min_doc_count", 1):
            continue
        bd = {"_key": key, "_doc_count": g["_doc_count"]}
        if has_subs and g["_subs"] is not None:
            bd.update(_shape_subs(meta, g["_subs"], 0))
        buckets.append(bd)
    return buckets


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HyperLogLog estimate with the small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / float(np.sum(2.0 ** -regs))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return e


def _sum_hists(parts):
    hist = None
    for p in parts:
        h = np.asarray(p["hist"], np.float64)
        hist = h if hist is None else hist + h
    if hist is None:
        return np.zeros(1), 0
    return hist, int(round(hist.sum()))


def _hist_rank_value(hist, rank, lo, scale):
    """Value of the rank-th (0-based) element: the bin whose cumulative
    count first covers it; bin lower edge = exact value on integer grids
    (power-of-two scale)."""
    cum = np.cumsum(hist)
    b = int(np.searchsorted(cum, rank + 1))
    return lo + min(b, len(hist) - 1) / scale


def _weighted_pick(parts, field):
    best, best_n = None, -1.0
    for p in parts:
        n = float(p["n"])
        v = float(p[field])
        if n > best_n and not math.isnan(v):
            best, best_n = v, n
    return best
