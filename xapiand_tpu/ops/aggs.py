"""On-device aggregations, fused with the match pipeline.

Reference parity target: src/aggregations/ (AggregationMatchSpy driven during
match; metrics metrics.h:225-1137, buckets bucket.h:52-1173). Instead of a
per-document spy callback, aggregations are masked reductions over the
candidate rows (or the dense doc axis), computed in the same jitted program
as the match - bucket counting uses a one-hot matmul so it lands on the MXU.

Static spec forms (cfg.with_aggs entries):
  ("count",)
  ("sum"|"avg"|"min"|"max"|"variance"|"std_deviation"|"median"|"mode", slot)
  ("stats"|"extended_stats", slot)
  ("terms", slot, ncats, sub_specs)   - facet counts over category codes
  ("histogram", slot, nb, sub_specs)  - interval/offset via
                                        plan["agg_params"][str(i)]
  ("range", slot, nr, sub_specs)      - bounds via plan["agg_ranges"][str(i)]
  ("filter", n_terms, Lf, sub_specs)  - posting-membership filter bucket;
                                        term spans via plan["agg_filters"][str(i)]
  ("missing", slot, sub_specs)        - docs lacking the field

sub_specs: tuple of metric specs (kind, slot) computed per bucket as
sufficient statistics via one-hot matmuls (n/s/s2 on the MXU, min/max as
masked broadcast reductions XLA fuses without materialising [rows, nb]).
Results are raw arrays; host-side shaping into the reference's response
format happens in xapiand_tpu.aggregations.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from xapiand_tpu.ops.executor import _get_value_col


_HLL_P = 10
_HLL_M = 1 << _HLL_P


def _hash32(hi, lo):
    """32-bit avalanche (murmur3 fmix32) of a (hi, lo) int32 key pair."""
    h = hi.astype(jnp.uint32) ^ (lo.astype(jnp.uint32)
                                 * jnp.uint32(0x9E3779B9))
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def _value_hist(v, m, lo, scale, nb):
    """[nb] f32 histogram of masked values, bins floor((v-lo)*scale)
    clipped into range. One-hot + column-sum keeps it an MXU-friendly
    reduction (scatter-adds serialize on TPU)."""
    b = jnp.clip(jnp.floor((v - lo) * scale).astype(jnp.int32), 0, nb - 1)
    oh = ((b[:, None] == jnp.arange(nb)[None, :]) & m[:, None]) \
        .astype(jnp.float32)
    return jnp.sum(oh, axis=0)


def _slot_vals(seg, slot, docids, mask, carried=None):
    cc = (carried or {}).get(slot)
    if cc and "fval" in cc:
        # carried channel (cfg.carry): row-aligned, NaN codes absence -
        # sanitize to 0 so masked sums never see NaN
        v = cc["fval"]
        m = mask & ~jnp.isnan(v)
        return jnp.where(m, v, 0.0), m
    col = _get_value_col(seg, slot)
    d = jnp.minimum(docids, col["fval"].shape[0] - 1)
    v = col["fval"][d]
    m = mask & col["present"][d]
    return v, m


def _key_ranges_membership(col, d, b, vmax):
    """[rows, nr] bool: does SOME actual value of doc d lie in range r?

    Exact per-value containment (MultipleValueRange semantics, range.cc:
    352-366): interval-overlap on the [min,max] key pair is exact for
    single-value docs; docs with >=2 values (mv_len > 0) additionally
    gather their per-value keys at static width ``vmax`` and require a
    real hit. b: [nr, 4] int32 split-key range bounds."""
    from xapiand_tpu.ops.executor import _lex_ge, _lex_le

    ge = _lex_ge(col["max_hi"][d][:, None], col["max_lo"][d][:, None],
                 b[None, :, 0], b[None, :, 1])
    le = _lex_le(col["hi"][d][:, None], col["lo"][d][:, None],
                 b[None, :, 2], b[None, :, 3])
    inr = ge & le                                         # [rows, nr]
    if vmax > 1 and "mv_hi" in col:
        off = col["mv_off"][d]
        cnt = col["mv_len"][d]
        vidx = off[:, None] + jnp.arange(vmax)[None, :]
        vidx = jnp.minimum(vidx, col["mv_hi"].shape[0] - 1)
        vh = col["mv_hi"][vidx][:, :, None]               # [rows, vmax, 1]
        vl = col["mv_lo"][vidx][:, :, None]
        valid = (jnp.arange(vmax)[None, :] < cnt[:, None])[:, :, None]
        hit = (_lex_ge(vh, vl, b[None, None, :, 0], b[None, None, :, 1])
               & _lex_le(vh, vl, b[None, None, :, 2], b[None, None, :, 3])
               & valid)
        inr = inr & ((cnt == 0)[:, None] | jnp.any(hit, axis=1))
    return inr


def _sub_stats_bucketed(seg, sub_specs, docids, oh_bool, plan=None):
    """Per-bucket sufficient stats for metric sub-aggregations.

    oh_bool: [rows, nb] bucket membership (already ANDed with the match
    mask). Returns a list of {"n","s","s2","min","max"} arrays [nb];
    median/mode subs (4-tuple specs carrying an agg_params key) add
    "hist2" [nb, BINS] - the same mergeable fixed-grid order-statistic
    histogram as the top level, one per bucket (bucket.h:52
    HandledSubAggregation recursion allows any metric under any bucket).
    """
    out = []
    ohf = oh_bool.astype(jnp.float32)
    for spec in sub_specs:
        kind, slot = spec[0], spec[1]
        if kind == "count" or slot < 0:
            n = jnp.sum(ohf, axis=0)
            z = jnp.zeros_like(n)
            out.append({"n": n, "s": z, "s2": z,
                        "min": jnp.full_like(n, jnp.inf),
                        "max": jnp.full_like(n, -jnp.inf)})
            continue
        col = _get_value_col(seg, slot)
        d = jnp.minimum(docids, col["fval"].shape[0] - 1)
        v = col["fval"][d]
        present = col["present"][d]
        both = oh_bool & present[:, None]
        bf = both.astype(jnp.float32)
        n = jnp.sum(bf, axis=0)
        s = jnp.einsum("r,rb->b", v, bf, preferred_element_type=jnp.float32)
        s2 = jnp.einsum("r,rb->b", v * v, bf,
                        preferred_element_type=jnp.float32)
        vmin = jnp.min(jnp.where(both, v[:, None], jnp.inf), axis=0)
        vmax = jnp.max(jnp.where(both, v[:, None], -jnp.inf), axis=0)
        res = {"n": n, "s": s, "s2": s2, "min": vmin, "max": vmax}
        if len(spec) > 3:   # (median|mode, slot, nb, params_key)
            nbins, pkey = spec[2], spec[3]
            lo = plan["agg_params"][pkey][0]
            scale = plan["agg_params"][pkey][1]
            vb = jnp.clip(jnp.floor((v - lo) * scale).astype(jnp.int32),
                          0, nbins - 1)
            voh = (vb[:, None] == jnp.arange(nbins)[None, :]) \
                .astype(jnp.float32)
            # [nb, rows] @ [rows, BINS] contraction -> one order-stat
            # histogram per bucket, as an MXU matmul (bf already masks
            # bucket membership AND value presence)
            res["hist2"] = jnp.einsum("rb,rk->bk", bf, voh,
                                      preferred_element_type=jnp.float32)
        out.append(res)
    return out


def _sub_stats_single(seg, sub_specs, docids, m, plan=None):
    """Single-bucket (filter/missing) sufficient stats; arrays of size 1."""
    return _sub_stats_bucketed(seg, sub_specs, docids, m[:, None], plan)


def _bucket_codes(seg, desc, plan, docids, mask):
    """Code-based bucketing for composite (nested) buckets:
    desc = (kind, slot, nb, params_key) -> (codes i32[rows], valid[rows])."""
    kind, slot, nb, pkey = desc
    col = _get_value_col(seg, slot)
    d = jnp.minimum(docids, col["fval"].shape[0] - 1)
    if kind == "terms":
        code = col["cats"][d] if "cats" in col else jnp.full_like(d, -1)
        return jnp.clip(code, 0, nb - 1), mask & (code >= 0) & (code < nb)
    if kind == "histogram":
        v = col["fval"][d]
        interval = plan["agg_params"][pkey][0]
        shift = plan["agg_params"][pkey][1]
        b = jnp.floor((v - shift) / interval).astype(jnp.int32)
        valid = mask & col["present"][d] & (b >= 0) & (b < nb)
        return jnp.clip(b, 0, nb - 1), valid
    if kind == "range":
        v = col["fval"][d]
        bounds = plan["agg_ranges"][pkey]
        inr = (v[:, None] >= bounds[None, :, 0]) \
            & (v[:, None] < bounds[None, :, 1])
        code = jnp.argmax(inr, axis=1).astype(jnp.int32)   # first match
        return code, mask & col["present"][d] & jnp.any(inr, axis=1)
    raise ValueError(f"unbucketable nested kind {kind!r}")


def compute_aggs(seg, specs, docids, mask, scores, plan=None,
                 carried=None):
    from xapiand_tpu.ops.executor import lower_bound

    out = []
    for i, spec in enumerate(specs):
        kind = spec[0]
        if kind == "count":
            out.append(jnp.sum(mask.astype(jnp.int32)))
            continue
        if kind == "filter":
            n_terms, Lf, sub_specs = spec[1], spec[2], spec[3]
            spans = plan["agg_filters"][str(i)]          # [n_terms, 2]
            m = mask
            for t in range(n_terms):
                span = lax.dynamic_slice(seg["post_docids"],
                                         (spans[t, 0],), (Lf,))
                inlen = jnp.arange(Lf) < spans[t, 1]
                span = jnp.where(inlen, span, jnp.int32(2**31 - 1))
                pos = lower_bound(span, docids, Lf)
                found = span[jnp.minimum(pos, Lf - 1)] == docids
                m = m & found & (spans[t, 1] > 0)
            res = {"count": jnp.sum(m.astype(jnp.int32))}
            if sub_specs:
                res["subs"] = _sub_stats_single(seg, sub_specs, docids, m, plan)
            out.append(res)
            continue
        if kind == "nested":
            # bucket chain of any depth: one composite one-hot count per
            # prefix level; level l's code = fold of codes 0..l in a
            # mixed-radix number (width capped 4096 at compile)
            descs, subs_list = spec[1], spec[2]
            comp = jnp.zeros_like(docids)
            valid = mask
            size = 1
            res_counts, res_subs = [], []
            for lvl, desc in enumerate(descs):
                code, v = _bucket_codes(seg, desc, plan, docids, mask)
                comp = comp * desc[2] + code
                valid = valid & v
                size *= desc[2]
                oh = (comp[:, None] == jnp.arange(size)[None, :]) \
                    & valid[:, None]
                res_counts.append(jnp.sum(oh.astype(jnp.int32), axis=0))
                res_subs.append(
                    _sub_stats_bucketed(seg, subs_list[lvl], docids, oh, plan)
                    if subs_list[lvl] else None)
            out.append({"counts": tuple(res_counts),
                        "subs": tuple(res_subs)})
            continue
        if kind == "missing":
            slot, sub_specs = spec[1], spec[2]
            col = _get_value_col(seg, slot)
            d = jnp.minimum(docids, col["present"].shape[0] - 1)
            m = mask & ~col["present"][d]
            res = {"count": jnp.sum(m.astype(jnp.int32))}
            if sub_specs:
                res["subs"] = _sub_stats_single(seg, sub_specs, docids, m, plan)
            out.append(res)
            continue
        slot = spec[1]
        if kind in ("sum", "avg", "min", "max", "variance", "std_deviation",
                    "stats", "extended_stats", "median", "mode"):
            v, m = _slot_vals(seg, slot, docids, mask, carried)
            fm = m.astype(jnp.float32)
            n = jnp.sum(fm)
            s = jnp.sum(v * fm)
            s2 = jnp.sum(v * v * fm)
            vmin = jnp.min(jnp.where(m, v, jnp.inf))
            vmax = jnp.max(jnp.where(m, v, -jnp.inf))
            # sufficient statistics so segment/shard partials merge exactly
            # host-side (≙ merge_results, src/database/handler.cc:1543-1545)
            res = {"n": n, "s": s, "s2": s2, "min": vmin, "max": vmax}
            if kind in ("median", "mode"):
                # order statistics as a MERGEABLE sufficient statistic: a
                # fixed histogram over the globally-agreed [lo, lo+B/scale)
                # range (agg_params) - partials psum across shards and sum
                # across segments/generations, then the host picks ranks
                # (VERDICT: "percentiles/median/mode via gathered
                # per-shard histograms"); power-of-two scale keeps integer
                # grids exact
                lo = plan["agg_params"][str(i)][0]
                scale = plan["agg_params"][str(i)][1]
                nb = spec[2]
                res["hist"] = _value_hist(v, m, lo, scale, nb)
            out.append(res)
        elif kind == "terms":
            ncats = spec[2]
            sub_specs = spec[3] if len(spec) > 3 else ()
            cc = (carried or {}).get(slot)
            if cc and "cats" in cc:
                codes = cc["cats"]    # carried channel: -1 codes absence
            else:
                col = _get_value_col(seg, slot)
                d = jnp.minimum(docids, col["fval"].shape[0] - 1)
                # segments that never saw the field have no cats table
                codes = col["cats"][d] if "cats" in col \
                    else jnp.full_like(d, -1)
            remap = (plan or {}).get("cat_remap", {}).get(i)
            if remap is not None:
                # mesh path: local category codes -> global table
                codes = jnp.where(
                    codes >= 0,
                    remap[jnp.clip(codes, 0, remap.shape[0] - 1)], -1)
            m = mask & (codes >= 0) & (codes < ncats)
            in_bucket = (codes[:, None] == jnp.arange(ncats)[None, :]) \
                & m[:, None]
            counts = jnp.sum(in_bucket.astype(jnp.int32), axis=0)
            if sub_specs:
                out.append({"counts": counts,
                            "subs": _sub_stats_bucketed(seg, sub_specs,
                                                        docids, in_bucket,
                                                        plan)})
            else:
                out.append(counts)
        elif kind == "histogram":
            nb = spec[2]
            sub_specs = spec[3] if len(spec) > 3 else ()
            v, m = _slot_vals(seg, slot, docids, mask, carried)
            interval = plan["agg_params"][str(i)][0]
            shift = plan["agg_params"][str(i)][1]
            b = jnp.floor((v - shift) / interval).astype(jnp.int32)
            inb = m & (b >= 0) & (b < nb)
            bc = jnp.clip(b, 0, nb - 1)
            in_bucket = (bc[:, None] == jnp.arange(nb)[None, :]) \
                & inb[:, None]
            oh = in_bucket.astype(jnp.float32)
            counts = jnp.sum(oh, axis=0).astype(jnp.int32)
            if sub_specs:
                out.append({"counts": counts,
                            "subs": _sub_stats_bucketed(seg, sub_specs,
                                                        docids, in_bucket,
                                                        plan)})
            else:
                out.append(counts)
        elif kind == "key_range":
            # exact u64-sort-key range buckets (_ip_range: reserved-but-
            # disabled in the reference, aggregations.cc:86). A doc lands in
            # every range containing SOME actual value, mirroring the
            # value-filter per-value semantics (multivalue/range.cc:352-366).
            nr = spec[2]
            sub_specs = spec[3] if len(spec) > 3 else ()
            vmax = spec[4] if len(spec) > 4 else 1
            col = _get_value_col(seg, slot)
            d = jnp.minimum(docids, col["hi"].shape[0] - 1)
            m = mask & col["present"][d]
            b = plan["agg_ranges"][str(i)]               # [nr, 4] int32 key pairs
            inr = _key_ranges_membership(col, d, b, vmax) & m[:, None]
            counts = jnp.sum(inr.astype(jnp.int32), axis=0)
            if sub_specs:
                out.append({"counts": counts,
                            "subs": _sub_stats_bucketed(seg, sub_specs,
                                                        docids, inr)})
            else:
                out.append(counts)
        elif kind == "geo_ip":
            # _geo_ip (reserved-but-disabled, aggregations.cc:87): bucket an
            # ip field by a caller-supplied network->location table; bucket
            # membership = OR over the location's CIDR key intervals, folded
            # through a one-hot matmul so it lands on the MXU.
            nb, ncidr = spec[2], spec[3]
            sub_specs = spec[4] if len(spec) > 4 else ()
            vmax = spec[5] if len(spec) > 5 else 1
            col = _get_value_col(seg, slot)
            d = jnp.minimum(docids, col["hi"].shape[0] - 1)
            m = mask & col["present"][d]
            b = plan["agg_ranges"][str(i)]               # [ncidr, 4]
            inc = _key_ranges_membership(col, d, b, vmax) \
                .astype(jnp.float32)                # [rows, ncidr]
            assign = plan["agg_params"][str(i)]          # [ncidr] -> bucket idx
            onehot = (assign[:, None] == jnp.arange(nb)[None, :]) \
                .astype(jnp.float32)
            in_bucket = (jnp.dot(inc, onehot,
                                 preferred_element_type=jnp.float32) > 0) \
                & m[:, None]
            counts = jnp.sum(in_bucket.astype(jnp.int32), axis=0)
            if sub_specs:
                out.append({"counts": counts,
                            "subs": _sub_stats_bucketed(seg, sub_specs,
                                                        docids, in_bucket,
                                                        plan)})
            else:
                out.append(counts)
        elif kind == "geo_trixels":
            # _geo_trixels (reserved-but-disabled, aggregations.cc:82):
            # bucket geo docs by the HTM trixel of their first level-13
            # range at the requested level; codes resolve through a sorted
            # per-compile trixel table (lower_bound, no scatter).
            nb, shift = spec[2], spec[3]
            sub_specs = spec[4] if len(spec) > 4 else ()
            g = seg["geo"][slot]
            d = jnp.minimum(docids, g["doc_off"].shape[0] - 1)
            off = jnp.minimum(g["doc_off"][d], g["flat_start"].shape[0] - 1)
            tri = g["flat_start"][off] >> shift    # ids positive: >> exact
            valid = mask & (g["doc_len"][d] > 0)
            table = plan["agg_params"][str(i)]           # [nb] asc, pad INT32MAX
            code = lower_bound(table, tri, nb)
            m = valid & (table[jnp.minimum(code, nb - 1)] == tri)
            in_bucket = (code[:, None] == jnp.arange(nb)[None, :]) \
                & m[:, None]
            counts = jnp.sum(in_bucket.astype(jnp.int32), axis=0)
            if sub_specs:
                out.append({"counts": counts,
                            "subs": _sub_stats_bucketed(seg, sub_specs, d,
                                                        in_bucket)})
            else:
                out.append(counts)
        elif kind in ("range", "geodist_range"):
            nr = spec[2]
            sub_specs = spec[3] if len(spec) > 3 else ()
            if kind == "geodist_range":
                # bucket by great-circle distance from an origin
                # (_geo_distance; declared-but-disabled in the reference)
                from xapiand_tpu.ops.executor import _haversine

                col = _get_value_col(seg, slot)
                d = jnp.minimum(docids, col["fval"].shape[0] - 1)
                lon = col["fval2"][d] if "fval2" in col \
                    else jnp.zeros_like(col["fval"][d])
                v = _haversine(col["fval"][d], lon,
                               plan["agg_params"][str(i)][0],
                               plan["agg_params"][str(i)][1])
                m = mask & col["present"][d]
            else:
                v, m = _slot_vals(seg, slot, docids, mask)
            bounds = plan["agg_ranges"][str(i)]          # [nr, 2]
            inr = (v[:, None] >= bounds[None, :, 0]) \
                & (v[:, None] < bounds[None, :, 1]) & m[:, None]
            counts = jnp.sum(inr.astype(jnp.int32), axis=0)
            if sub_specs:
                out.append({"counts": counts,
                            "subs": _sub_stats_bucketed(seg, sub_specs,
                                                        docids, inr)})
            else:
                out.append(counts)
        elif kind == "cardinality":
            # exact distinct count of value keys among matched docs
            # (reference declares _cardinality but leaves it disabled,
            # aggregations.cc:118-207 - implemented here), PLUS an HLL
            # register sketch so partials from different shards/segments
            # merge by elementwise max (the sum of exacts is only an upper
            # bound when values repeat across shards). The host estimate
            # clamps into [max(exact), sum(exact)], so one-part results
            # stay exact.
            col = _get_value_col(seg, slot)
            d = jnp.minimum(docids, col["hi"].shape[0] - 1)
            m = mask & col["present"][d]
            I32MAX = jnp.int32(2**31 - 1)
            h = jnp.where(m, col["hi"][d], I32MAX)
            l = jnp.where(m, col["lo"][d], I32MAX)
            hs, ls = lax.sort((h, l), num_keys=2)
            valid = ~((hs == I32MAX) & (ls == I32MAX))
            headd = jnp.concatenate([
                jnp.ones((1,), bool),
                (hs[1:] != hs[:-1]) | (ls[1:] != ls[:-1])])
            exact = jnp.sum((headd & valid).astype(jnp.int32))
            # HLL(p=10, m=1024, ~3.2% rel err): 32-bit avalanche of the
            # order-preserving (hi,lo) key, top p bits pick the register,
            # rho = leading zeros of the rest + 1, per-register max as a
            # masked broadcast reduction (fused; no scatter)
            hh = _hash32(col["hi"][d], col["lo"][d])
            idx = (hh >> jnp.uint32(32 - _HLL_P)).astype(jnp.int32)
            rest = hh << jnp.uint32(_HLL_P)
            rho = jnp.where(rest == 0, 32 - _HLL_P + 1,
                            lax.clz(rest).astype(jnp.int32) + 1)
            rho = jnp.where(m, rho, 0).astype(jnp.int32)
            # per-register max as a sort-based segment reduction: append
            # an identity grid so every register id has a segment, sort
            # by (register, rho), read maxima at segment tails, then pack
            # the tails to the front. Two streamed sorts of rows+m - the
            # masked [rows, 1024] broadcast-max this replaces risks a
            # multi-GB materialization at full row width if XLA declines
            # to fuse it (compact_cap is 0 for OR/match-all queries)
            grid = jnp.arange(_HLL_M, dtype=jnp.int32)
            ks, vs = lax.sort(
                (jnp.concatenate([idx, grid]),
                 jnp.concatenate([rho, jnp.zeros((_HLL_M,), jnp.int32)])),
                num_keys=2)
            tailm = jnp.concatenate([ks[1:] != ks[:-1],
                                     jnp.ones((1,), bool)])
            k2 = jnp.where(tailm, jnp.int32(0), jnp.int32(1))
            _, _, regs = lax.sort((k2, ks, vs), num_keys=2)
            out.append({"n": exact, "maxn": exact,
                        "hll": regs[:_HLL_M]})
        elif kind == "geo_stats":
            # sufficient stats for _geo_bounds / _geo_centroid
            col = _get_value_col(seg, slot)
            d = jnp.minimum(docids, col["fval"].shape[0] - 1)
            m = mask & col["present"][d]
            lat = col["fval"][d]
            lon = col["fval2"][d] if "fval2" in col \
                else jnp.zeros_like(lat)
            fm = m.astype(jnp.float32)
            out.append({
                "n": jnp.sum(fm),
                "slat": jnp.sum(lat * fm), "slon": jnp.sum(lon * fm),
                "minlat": jnp.min(jnp.where(m, lat, jnp.inf)),
                "maxlat": jnp.max(jnp.where(m, lat, -jnp.inf)),
                "minlon": jnp.min(jnp.where(m, lon, jnp.inf)),
                "maxlon": jnp.max(jnp.where(m, lon, -jnp.inf)),
            })
        elif kind == "percentiles":
            v, m = _slot_vals(seg, slot, docids, mask)
            fm = m.astype(jnp.float32)
            lo = plan["agg_params"][str(i)][0]
            scale = plan["agg_params"][str(i)][1]
            nb = spec[2]
            out.append({
                "n": jnp.sum(fm),
                "min": jnp.min(jnp.where(m, v, jnp.inf)),
                "max": jnp.max(jnp.where(m, v, -jnp.inf)),
                "hist": _value_hist(v, m, lo, scale, nb)})
        else:
            raise ValueError(f"unknown aggregation {kind!r}")
    return tuple(out)
