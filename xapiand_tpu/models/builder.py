"""SegmentBuilder: accumulates analysed documents into a Segment.

Replaces the glass inverter/B-tree insert path
(src/xapian/backends/glass/glass_inverter.cc) with columnar accumulation +
one flat pack at finalize. Document length = sum of wdf over all terms,
matching Xapian document length semantics (used by BM25 normlen).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from xapiand_tpu.models.segment import (GeoColumn, Segment, TermInfo,
                                        ValueColumn, size_class)
from xapiand_tpu.schema.schema import IndexedDocument
from xapiand_tpu.utils import serialise as ser

_I32MAX = np.int32(2**31 - 1)


class SegmentBuilder:
    def __init__(self):
        self._postings = defaultdict(list)   # term -> [(docid, wdf)]
        self._positions = defaultdict(list)  # term -> [(docid, [pos...])]
        self._doclen: list[float] = []
        self._values = defaultdict(dict)     # slot -> {docid: [values]}
        self._geo = defaultdict(dict)        # slot -> {docid: [(s,e)...]}
        self._doc_keys: list[str] = []
        self._collfreq = defaultdict(int)
        self._uniq: list[int] = []

    def __len__(self):
        return len(self._doc_keys)

    def add(self, idoc: IndexedDocument) -> int:
        docid = len(self._doc_keys)
        self._doc_keys.append(idoc.doc_id)
        # distinct terms incl. the id term (Xapian UNIQUE_TERMS = termlist
        # entry count; used by dicecoeff / LM absolute-discount smoothing)
        self._uniq.append(len(idoc.terms) + 1)
        length = 0
        for term, entry in idoc.terms.items():
            self._postings[term].append((docid, entry.wdf))
            self._collfreq[term] += entry.wdf
            length += entry.wdf
            if entry.positions:
                self._positions[term].append((docid, entry.positions))
        self._doclen.append(float(length))
        for slot, vals in idoc.values.items():
            if vals:
                self._values[slot][docid] = list(vals)
        for slot, ranges in idoc.geo_ranges.items():
            if ranges:
                self._geo[slot].setdefault(docid, []).extend(ranges)
        # the id term must exist so deletes/replaces can find the doc
        self._postings[idoc.id_term].append((docid, 0))
        return docid

    # -- pack ------------------------------------------------------------------

    def finalize(self) -> Segment:
        nd = len(self._doc_keys)
        terms = sorted(self._postings.keys())
        total_post = sum(len(self._postings[t]) for t in terms)
        max_len = max((len(self._postings[t]) for t in terms), default=0)
        guard = size_class(max(max_len, 1))
        P = total_post + guard

        post_docids = np.full(P, nd, dtype=np.int32)  # pad -> dump row
        post_wdf = np.zeros(P, dtype=np.float32)
        post_posoff = np.zeros(P, dtype=np.int32)
        post_poslen = np.zeros(P, dtype=np.int32)

        # positions flat array
        pos_chunks = []
        pos_index = {}  # (term, docid) -> (off, len)
        pos_total = 0
        for term, entries in self._positions.items():
            for docid, plist in entries:
                pos_index[(term, docid)] = (pos_total, len(plist))
                pos_chunks.append(np.asarray(sorted(plist), dtype=np.int32))
                pos_total += len(plist)
        positions = (np.concatenate(pos_chunks) if pos_chunks
                     else np.zeros(0, dtype=np.int32))
        positions = np.concatenate(
            [positions, np.zeros(128, dtype=np.int32)])  # guard

        # one global pack instead of 2 numpy conversions per term: the
        # per-call overhead dominates with many small posting lists
        import itertools

        lens = np.fromiter((len(self._postings[t]) for t in terms),
                           dtype=np.int64, count=len(terms))
        offs = np.zeros(len(terms) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        if total_post:
            flat = np.fromiter(
                itertools.chain.from_iterable(
                    itertools.chain.from_iterable(
                        self._postings[t] for t in terms)),
                dtype=np.float64, count=2 * total_post).reshape(-1, 2)
            post_docids[:total_post] = flat[:, 0].astype(np.int32)
            post_wdf[:total_post] = flat[:, 1].astype(np.float32)
            maxw = np.maximum.reduceat(flat[:, 1], offs[:-1]) \
                if len(terms) else np.zeros(0)
        else:
            maxw = np.zeros(len(terms))

        term_infos: dict[str, TermInfo] = {}
        for tid, term in enumerate(terms):
            off, L = int(offs[tid]), int(lens[tid])
            if term in self._positions:
                plist = self._postings[term]
                for k, (docid, _) in enumerate(plist):
                    pi = pos_index.get((term, docid))
                    if pi is not None:
                        post_posoff[off + k] = pi[0]
                        post_poslen[off + k] = pi[1]
            term_infos[term] = TermInfo(
                tid=tid, offset=off, length=L,
                collfreq=self._collfreq.get(term, 0),
                max_wdf=float(maxw[tid]) if L else 0.0)

        doclen = np.zeros(nd + 1, dtype=np.float32)
        uniqterms = np.ones(nd + 1, dtype=np.float32)
        if nd:
            doclen[:nd] = np.asarray(self._doclen, dtype=np.float32)
            uniqterms[:nd] = np.asarray(self._uniq, dtype=np.float32)
        deleted = np.zeros(nd + 1, dtype=bool)
        # denormalised per-posting doclen (see segment.py docstring)
        post_doclen = doclen[np.minimum(post_docids, nd)]

        values = {}
        for slot, per_doc in self._values.items():
            values[slot] = self._pack_value_column(slot, per_doc, nd)

        geo = {}
        for slot, per_doc in self._geo.items():
            geo[slot] = self._pack_geo_column(per_doc, nd)

        return Segment(
            num_docs=nd,
            total_doclen=float(sum(self._doclen)),
            post_docids=post_docids,
            post_wdf=post_wdf,
            post_doclen=post_doclen,
            post_posoff=post_posoff,
            post_poslen=post_poslen,
            positions=positions,
            doclen=doclen,
            deleted=deleted,
            terms=term_infos,
            values=values,
            geo=geo,
            doc_keys=list(self._doc_keys),
            guard=guard,
            uniqterms=uniqterms,
        )

    def _pack_value_column(self, slot, per_doc, nd) -> ValueColumn:
        hi = np.full(nd + 1, _I32MAX, dtype=np.int32)
        lo = np.full(nd + 1, _I32MAX, dtype=np.int32)
        max_hi = np.full(nd + 1, -(2**31), dtype=np.int32)
        max_lo = np.full(nd + 1, -(2**31), dtype=np.int32)
        fval = np.zeros(nd + 1, dtype=np.float32)
        fval2 = None
        present = np.zeros(nd + 1, dtype=bool)
        raw = [None] * nd
        kind = "numeric"
        cats: dict[str, int] = {}
        cat_codes = np.full(nd + 1, -1, dtype=np.int32)
        has_strings = False

        for docid, vals in per_doc.items():
            raw[docid] = vals[0] if len(vals) == 1 else vals
            keys = []
            for v in vals:
                if isinstance(v, bool):
                    kind = "bool"
                    keys.append(ser.sortable_key_u64(1.0 if v else 0.0))
                elif isinstance(v, (int, float)):
                    keys.append(ser.sortable_key_u64(float(v)))
                elif isinstance(v, str):
                    has_strings = True
                    keys.append(ser.serialise_string_key(v))
                elif isinstance(v, tuple) and len(v) == 2:
                    # geo centroid (lat, lon): key on packed lat for sorting;
                    # real geo filtering uses the GeoColumn ranges
                    kind = "geo"
                    keys.append(ser.sortable_key_u64(float(v[0])))
                else:
                    keys.append(ser.sortable_key_u64(0.0))
            if not keys:
                continue
            kmin, kmax = min(keys), max(keys)
            hi[docid], lo[docid] = ser.split_key(kmin)
            max_hi[docid], max_lo[docid] = ser.split_key(kmax)
            present[docid] = True
            v0 = vals[0]
            if isinstance(v0, bool):
                fval[docid] = 1.0 if v0 else 0.0
            elif isinstance(v0, (int, float)):
                fval[docid] = float(v0)
            elif isinstance(v0, tuple) and len(v0) == 2:
                fval[docid] = float(v0[0])
                if fval2 is None:
                    fval2 = np.zeros(nd + 1, dtype=np.float32)
                fval2[docid] = float(v0[1])     # geo centroid lon
            if isinstance(v0, str):
                code = cats.setdefault(v0, len(cats))
                cat_codes[docid] = code

        if has_strings and kind == "numeric":
            kind = "string"
        col = ValueColumn(kind=kind, hi=hi, lo=lo, max_hi=max_hi,
                          max_lo=max_lo, fval=fval, present=present, raw=raw,
                          fval2=fval2)
        if cats:
            names = [None] * len(cats)
            for name, code in cats.items():
                names[code] = name
            col.cats = cat_codes
            col.cat_names = names
        return col

    def _pack_geo_column(self, per_doc, nd) -> GeoColumn:
        doc_off = np.zeros(nd + 1, dtype=np.int32)
        doc_len = np.zeros(nd + 1, dtype=np.int32)
        starts, ends = [], []
        off = 0
        max_r = 0
        for docid in sorted(per_doc):
            ranges = sorted(per_doc[docid])
            doc_off[docid] = off
            doc_len[docid] = len(ranges)
            max_r = max(max_r, len(ranges))
            for s, e in ranges:
                starts.append(s)
                ends.append(e)
            off += len(ranges)
        guard = 64
        flat_start = np.full(off + guard, _I32MAX, dtype=np.int32)
        flat_end = np.full(off + guard, -1, dtype=np.int32)
        if starts:
            flat_start[:off] = np.asarray(starts, dtype=np.int32)
            flat_end[:off] = np.asarray(ends, dtype=np.int32)
        return GeoColumn(flat_start=flat_start, flat_end=flat_end,
                         doc_off=doc_off, doc_len=doc_len,
                         max_doc_ranges=max_r)
