"""Host-side aggregation DSL compilation, cross-segment merging, and
response shaping.

Reference parity target: src/aggregations/ DSL (reserved/aggregations.h):

  {"my_agg": {"_sum": {"_field": "price"}},
   "cats":   {"_terms": {"_field": "category", "_size": 10}},
   "hist":   {"_histogram": {"_field": "price", "_interval": 100}},
   "ranges": {"_range": {"_field": "age",
                         "_ranges": [{"_to": 30}, {"_from": 30}]}}}

Device kernels (ops/aggs.py) return sufficient statistics; partials from
segments/shards merge exactly here (≙ AggregationMatchSpy::merge_results,
src/database/handler.cc:1543-1545) except _median/_mode which are exact
single-segment and doc-count-weighted picks across segments (documented
deviation).
"""

from __future__ import annotations

import math

import numpy as np

METRICS = {"_count": "count", "_sum": "sum", "_avg": "avg", "_min": "min",
           "_max": "max", "_variance": "variance",
           "_std_deviation": "std_deviation", "_std": "std_deviation",
           "_median": "median", "_mode": "mode", "_stats": "stats",
           "_extended_stats": "extended_stats"}
BUCKETS = {"_terms", "_values", "_value", "_histogram", "_range"}

_CAT_BUCKETS = (16, 64, 256, 1024, 4096)


class AggError(ValueError):
    pass


def _cat_bucket(n: int) -> int:
    for b in _CAT_BUCKETS:
        if n <= b:
            return b
    raise AggError(f"too many facet categories: {n}")


def compile_for_segment(schema, segment, aggs_dsl: dict):
    """-> (names, specs tuple, agg_arrays dict, meta per agg)."""
    names, specs, meta = [], [], []
    agg_params, agg_ranges = {}, {}
    for i, (name, body) in enumerate(aggs_dsl.items()):
        if not isinstance(body, dict) or len(body) != 1:
            raise AggError(f"aggregation {name!r} must have exactly one type")
        key, args = next(iter(body.items()))
        if key in METRICS:
            kind = METRICS[key]
            if kind == "count":
                specs.append(("count",))
                meta.append({"kind": kind})
            else:
                slot = _slot_of(schema, args)
                specs.append((kind, slot))
                meta.append({"kind": kind})
        elif key in ("_terms", "_values", "_value"):
            slot = _slot_of(schema, args)
            col = segment.values.get(slot)
            cat_names = (col.cat_names or []) if col is not None else []
            ncats = _cat_bucket(max(len(cat_names), 1))
            specs.append(("terms", slot, ncats))
            meta.append({"kind": "terms", "cat_names": list(cat_names),
                         "size": int(args.get("_size", 10)),
                         "keyed": bool(args.get("_keyed", False)),
                         "min_doc_count": int(args.get("_min_doc_count", 1))})
        elif key == "_histogram":
            slot = _slot_of(schema, args)
            interval = float(args["_interval"])
            shift = float(args.get("_shift", 0.0))
            nb = int(args.get("_buckets", 64))
            specs.append(("histogram", slot, nb))
            agg_params[i] = np.asarray([interval, shift], np.float32)
            meta.append({"kind": "histogram", "interval": interval,
                         "shift": shift, "nb": nb,
                         "min_doc_count": int(args.get("_min_doc_count", 1))})
        elif key == "_cardinality":
            slot = _slot_of(schema, args)
            specs.append(("cardinality", slot))
            meta.append({"kind": "cardinality"})
        elif key in ("_percentiles", "_percentiles_rank"):
            slot = _slot_of(schema, args)
            pcts = [float(p) / 100.0 for p in
                    args.get("_percentiles", [1, 5, 25, 50, 75, 95, 99])]
            specs.append(("percentiles", slot))
            agg_params[i] = np.asarray(pcts, np.float32)
            meta.append({"kind": "percentiles",
                         "pcts": [p * 100 for p in pcts]})
        elif key == "_range":
            slot = _slot_of(schema, args)
            rs = args.get("_ranges")
            if not rs:
                raise AggError(f"_range aggregation {name!r} needs _ranges")
            bounds = np.zeros((len(rs), 2), np.float32)
            labels = []
            for j, r in enumerate(rs):
                lo = float(r.get("_from", -math.inf))
                hi = float(r.get("_to", math.inf))
                bounds[j, 0], bounds[j, 1] = lo, hi
                labels.append(r.get("_key", f"{lo}..{hi}"))
            specs.append(("range", slot, len(rs)))
            agg_ranges[i] = bounds
            meta.append({"kind": "range", "labels": labels})
        else:
            raise AggError(f"unknown aggregation type {key!r}")
        names.append(name)
    arrays = {}
    if agg_params:
        arrays["agg_params"] = agg_params
    if agg_ranges:
        arrays["agg_ranges"] = agg_ranges
    return names, tuple(specs), arrays, meta


def _slot_of(schema, args) -> int:
    field = args.get("_field") if isinstance(args, dict) else args
    if not field:
        raise AggError("aggregation needs _field")
    spec = schema.get_field(str(field))
    if spec.slot is None:
        raise AggError(f"field {field!r} has no value slot")
    return spec.slot


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
            mean = s / n if n else None
            var = max(s2 / n - mean * mean, 0.0) if n else None
            if kind == "sum":
                out[name] = {"_sum": s}
            elif kind == "avg":
                out[name] = {"_avg": mean}
            elif kind == "min":
                out[name] = {"_min": vmin if n else None}
            elif kind == "max":
                out[name] = {"_max": vmax if n else None}
            elif kind == "variance":
                out[name] = {"_variance": var}
            elif kind == "std_deviation":
                out[name] = {"_std_deviation": math.sqrt(var) if var is not None else None}
            elif kind == "median":
                med = _weighted_pick(parts, "median")
                out[name] = {"_median": med}
            elif kind == "mode":
                out[name] = {"_mode": _weighted_pick(parts, "mode")}
            elif kind == "stats":
                out[name] = {"_count": int(n), "_min": vmin if n else None,
                             "_max": vmax if n else None, "_avg": mean,
                             "_sum": s}
            else:  # extended_stats
                out[name] = {
                    "_count": int(n), "_min": vmin if n else None,
                    "_max": vmax if n else None, "_avg": mean, "_sum": s,
                    "_sum_of_squares": s2, "_variance": var,
                    "_std_deviation": math.sqrt(var) if var is not None else None,
                }
        elif kind == "cardinality":
            # exact within one segment; across segments the sum is an upper
            # bound (values may repeat across segments) - documented
            # approximation until sketch merging lands
            out[name] = {"_cardinality": int(sum(int(p) for p in parts))}
        elif kind == "percentiles":
            best, best_n = None, -1.0
            total_n = 0
            for p in parts:
                n = float(p["n"])
                total_n += n
                if n > best_n:
                    best, best_n = p, n
            vals = [float(v) for v in np.asarray(best["values"])] \
                if best is not None else []
            out[name] = {"_percentiles": {
                (str(int(pct)) if pct == int(pct) else str(pct)):
                    (v if total_n else None)
                for pct, v in zip(meta["pcts"], vals)}}
        elif kind == "terms":
            counts: dict[str, int] = {}
            for seg_idx, p in enumerate(parts):
                seg_cats = cat_names_per_segment[seg_idx].get(i, [])
                arr = np.asarray(p)
                for code, c in enumerate(arr):
                    if c > 0 and code < len(seg_cats):
                        key = seg_cats[code]
                        counts[key] = counts.get(key, 0) + int(c)
            items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            mdc = meta.get("min_doc_count", 1)
            items = [(k, v) for k, v in items if v >= mdc]
            items = items[: meta.get("size", 10)]
            if meta.get("keyed"):
                out[name] = {k: {"_doc_count": v} for k, v in items}
            else:
                out[name] = [{"_key": k, "_doc_count": v} for k, v in items]
        elif kind == "histogram":
            total = np.zeros_like(np.asarray(parts[0]))
            for p in parts:
                total = total + np.asarray(p)
            interval, shift = meta["interval"], meta["shift"]
            buckets = []
            for b, c in enumerate(total):
                if int(c) >= meta.get("min_doc_count", 1):
                    buckets.append({"_key": b * interval + shift,
                                    "_doc_count": int(c)})
            out[name] = buckets
        elif kind == "range":
            total = np.zeros_like(np.asarray(parts[0]))
            for p in parts:
                total = total + np.asarray(p)
            out[name] = [{"_key": lbl, "_doc_count": int(c)}
                         for lbl, c in zip(meta["labels"], total)]
    return out


def _weighted_pick(parts, field):
    best, best_n = None, -1.0
    for p in parts:
        n = float(p["n"])
        v = float(p[field])
        if n > best_n and not math.isnan(v):
            best, best_n = v, n
    return best
