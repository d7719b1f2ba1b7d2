"""Binary database snapshots: committed segments as a byte stream.

Reference parity target: the replication full-copy path ships the raw
database files - LZ4-compressed chunks with checksum trailers written by
``client_compressor`` and applied into a temp shard that is swapped in
(src/server/replication_protocol_client.h:68-80, .cc:547-583,
client_compressor.h:101); compaction likewise streams tables without
re-analysing documents (glass_compact.cc). Here the committed state IS a
set of flat numpy arrays plus host dictionaries, so a snapshot is simply:

  header  : MAGIC(8) | version u32 | reserved u32       (storage.h:53-68)
  records : length u32 | flags u8 | payload | xxh64 u64 (bit0 = LZ4 block)

  record 0        : msgpack manifest (revision, uuid, schema, metadata,
                    versions, blob index, segment/generation counts)
  per segment     : msgpack segment meta (terms as raw tuples, doc_keys,
                    value/geo slot metadata, array manifest), then one raw
                    record per numpy array
  per generation  : insertion-order tiebreak array (sharded indexes only)
  doc-data chunks : msgpack [[doc_id, data], ...] (the docs store)
  blob records    : msgpack [doc_id, content_type] + raw blob bytes

Loading reconstructs Segment objects by pointing numpy at the payload
bytes - NO re-tokenization, NO schema.index calls - which makes both
replica bootstrap (GET /idx/:snapshot) and restart-from-checkpoint
O(bytes) instead of O(re-analysis). The WAL replays only lines at or
after the snapshot revision on open (wal.cc:506 execute_line semantics
with a base revision).
"""

from __future__ import annotations

import io
import os
import struct
from typing import Optional

import numpy as np

from xapiand_tpu.index.storage import faults
from xapiand_tpu.models.segment import (GeoColumn, Segment, TermInfo,
                                        TermTable, ValueColumn)
from xapiand_tpu.utils.codecs import (block_compress, block_decompress,
                                      pack_msgpack, unpack_msgpack)
from xapiand_tpu.utils.hashing import xxh64

MAGIC = b"XPSNAP01"
_REC = struct.Struct("<IB")
_SUM = struct.Struct("<Q")
_FLAG_LZ4 = 0x01

SNAPSHOT_FILE = "snapshot"   # durable checkpoint name under the data dir


class SnapshotError(IOError):
    pass


# -- record framing (same wire shape as index.storage records) --------------

def _emit(fh, payload: bytes) -> None:
    faults.maybe_io("snapshot.write")
    flags = 0
    body = payload
    if len(payload) >= 128:
        c = block_compress(payload)
        if len(c) < len(payload):
            body, flags = c, _FLAG_LZ4
    fh.write(_REC.pack(len(body), flags))
    fh.write(body)
    fh.write(_SUM.pack(xxh64(body)))


def _take(fh) -> bytes:
    faults.maybe_io("snapshot.read")
    hdr = fh.read(_REC.size)
    if len(hdr) < _REC.size:
        raise SnapshotError("truncated snapshot record")
    length, flags = _REC.unpack(hdr)
    body = fh.read(length)
    tail = fh.read(_SUM.size)
    if len(body) < length or len(tail) < _SUM.size:
        raise SnapshotError("truncated snapshot record")
    (checksum,) = _SUM.unpack(tail)
    if xxh64(body) != checksum:
        raise SnapshotError("snapshot record checksum mismatch")
    if flags & _FLAG_LZ4:
        body = block_decompress(body)
    return body


# -- segment (de)serialisation ----------------------------------------------

_BASE_ARRAYS = ("post_docids", "post_wdf", "post_doclen", "post_posoff",
                "post_poslen", "positions", "doclen", "deleted",
                "uniqterms")
_VAL_ARRAYS = ("hi", "lo", "max_hi", "max_lo", "fval", "present", "cats",
               "fval2", "mv_hi", "mv_lo", "mv_off", "mv_len")
_GEO_ARRAYS = ("flat_start", "flat_end", "doc_off", "doc_len")


def _term_tuple(ti):
    if type(ti) is tuple:
        return list(ti)
    return [ti.tid, ti.offset, ti.length, ti.collfreq, ti.max_wdf,
            ti.max_poslen]


def _segment_arrays(seg: Segment) -> list[tuple[str, np.ndarray]]:
    out = []
    for name in _BASE_ARRAYS:
        arr = getattr(seg, name)
        if arr is not None:
            out.append((name, np.ascontiguousarray(arr)))
    for slot, col in seg.values.items():
        for name in _VAL_ARRAYS:
            arr = getattr(col, name)
            if arr is not None:
                out.append((f"v.{slot}.{name}", np.ascontiguousarray(arr)))
    for slot, g in seg.geo.items():
        for name in _GEO_ARRAYS:
            out.append((f"g.{slot}.{name}",
                        np.ascontiguousarray(getattr(g, name))))
    return out


def _write_segment(fh, seg: Segment) -> None:
    arrays = _segment_arrays(seg)
    meta = {
        "num_docs": seg.num_docs,
        "total_doclen": float(seg.total_doclen),
        "guard": seg.guard,
        "doc_keys": list(seg.doc_keys),
        # raw tuples, not TermInfo objects: raw_items() bypasses the lazy
        # TermTable materialisation (eager TermInfo construction was ~40%
        # of finalize cost; same trick as models/merge)
        "terms": ([[t, list(v)] for t, v in seg.terms.raw_items()]
                  if hasattr(seg.terms, "raw_items") else
                  [[t, _term_tuple(v)] for t, v in dict.items(seg.terms)]),
        "values": [[slot, {"kind": col.kind, "max_vals": col.max_vals,
                           "cat_names": col.cat_names, "raw": col.raw}]
                   for slot, col in seg.values.items()],
        "geo": [[slot, {"max_doc_ranges": g.max_doc_ranges}]
                for slot, g in seg.geo.items()],
        "arrays": [[name, arr.dtype.str, list(arr.shape)]
                   for name, arr in arrays],
    }
    _emit(fh, pack_msgpack(meta))
    for _name, arr in arrays:
        _emit(fh, arr.tobytes())


def _read_segment(fh) -> Segment:
    meta = unpack_msgpack(_take(fh))
    arrs: dict[str, np.ndarray] = {}
    for name, dtype, shape in meta["arrays"]:
        raw = _take(fh)
        a = np.frombuffer(raw, dtype=np.dtype(dtype)).reshape(shape)
        # deleted must stay mutable (delta deletes on immutable segments)
        arrs[name] = a.copy() if name == "deleted" else a
    terms = TermTable()
    for t, tup in meta["terms"]:
        dict.__setitem__(terms, t, tuple(tup))
    values = {}
    for slot, vm in meta["values"]:
        kw = {n: arrs.get(f"v.{slot}.{n}") for n in _VAL_ARRAYS}
        values[int(slot)] = ValueColumn(
            kind=vm["kind"], max_vals=vm.get("max_vals", 1),
            cat_names=vm.get("cat_names"), raw=vm.get("raw"), **kw)
    geo = {}
    for slot, gm in meta["geo"]:
        geo[int(slot)] = GeoColumn(
            max_doc_ranges=gm["max_doc_ranges"],
            **{n: arrs[f"g.{slot}.{n}"] for n in _GEO_ARRAYS})
    return Segment(
        num_docs=meta["num_docs"], total_doclen=meta["total_doclen"],
        post_docids=arrs["post_docids"], post_wdf=arrs["post_wdf"],
        post_doclen=arrs["post_doclen"], post_posoff=arrs["post_posoff"],
        post_poslen=arrs["post_poslen"], positions=arrs["positions"],
        doclen=arrs["doclen"], deleted=arrs["deleted"], terms=terms,
        values=values, geo=geo, doc_keys=meta["doc_keys"],
        guard=meta["guard"], uniqterms=arrs.get("uniqterms"))


# -- whole-database snapshot -------------------------------------------------

_DOC_CHUNK = 2000


def write_snapshot(db, fh) -> None:
    """Serialise the COMMITTED state of ``db`` (pending writes are not
    included - commit first, as the replication trigger always does)."""
    fh.write(MAGIC + struct.pack("<II", 1, 0))
    sharded = None
    generations = []
    if hasattr(db, "_generations") and getattr(db, "n_shards", 0):
        generations = db._generations
        sharded = {
            "n_shards": db.n_shards,
            "insert_seq": db._insert_seq,
            "generations": [{"searcher_idx": g["searcher_idx"]}
                            for g in generations],
        }
    doc_ids = list(db._docs_store.keys())
    # locator travels with the bytes: a restart-from-checkpoint whose local
    # datastore already holds the blob reuses the locator instead of
    # re-appending the payload on every open (the reference never rewrites
    # committed data files on open)
    blob_index = [[did, loc.get("_content_type"), loc]
                  for did, locs in db._blobs.items() for loc in locs]
    manifest = {
        "revision": db.revision,
        "uuid": db.uuid,
        "schema": db.schema.to_dict(),
        "metadata": db._metadata,
        "spellings": db._spellings,
        "synonyms": db._synonyms,
        "versions": db._versions,
        "n_segments": len(db._searchers),
        "n_doc_chunks": (len(doc_ids) + _DOC_CHUNK - 1) // _DOC_CHUNK,
        "n_blobs": len(blob_index),
        "sharded": sharded,
    }
    _emit(fh, pack_msgpack(manifest))
    for s in db._searchers:
        _write_segment(fh, s.segment)
    for gen in generations:
        ok = np.ascontiguousarray(gen["orderkey"])
        _emit(fh, pack_msgpack([ok.dtype.str, list(ok.shape)]))
        _emit(fh, ok.tobytes())
    for i in range(0, len(doc_ids), _DOC_CHUNK):
        chunk = [[did, db._docs_store[did]]
                 for did in doc_ids[i:i + _DOC_CHUNK]]
        _emit(fh, pack_msgpack(chunk))
    for did, ct, loc in blob_index:
        _emit(fh, pack_msgpack([did, ct, loc]))
        _emit(fh, db.get_blob(did, ct))


def snapshot_bytes(db) -> bytes:
    buf = io.BytesIO()
    write_snapshot(db, buf)
    return buf.getvalue()


def load_snapshot(db, fh) -> int:
    """Replace ``db``'s state with the snapshot's; returns live doc count.

    Pure deserialisation - no tokenization, no schema.index - then locator
    tables are rebuilt from the segments themselves (latest non-deleted
    row per key wins, the same invariant commit maintains). The temp-apply
    + swap discipline of the reference
    (replication_protocol_client.cc:547-583) maps to building the full new
    state before touching ``db``."""
    from xapiand_tpu.schema import Schema
    from xapiand_tpu.search import SegmentSearcher

    head = fh.read(16)
    if len(head) < 16 or head[:8] != MAGIC:
        raise SnapshotError("bad snapshot magic")
    manifest = unpack_msgpack(_take(fh))
    segments = [_read_segment(fh) for _ in range(manifest["n_segments"])]
    sharded = manifest.get("sharded")
    orderkeys = []
    if sharded:
        for _ in sharded["generations"]:
            dtype, shape = unpack_msgpack(_take(fh))
            orderkeys.append(np.frombuffer(
                _take(fh), dtype=np.dtype(dtype)).reshape(shape))
    docs_store: dict = {}
    for _ in range(manifest["n_doc_chunks"]):
        for did, data in unpack_msgpack(_take(fh)):
            docs_store[did] = data
    blobs: list[tuple[str, str, Optional[dict], bytes]] = []
    for _ in range(manifest["n_blobs"]):
        rec = unpack_msgpack(_take(fh))
        did, ct = rec[0], rec[1]
        loc = rec[2] if len(rec) > 2 else None
        blobs.append((did, ct, loc, _take(fh)))

    # ---- swap the fully-built state in ------------------------------------
    db.schema = Schema.from_dict(manifest["schema"])
    db.schema.mutated = False
    db._metadata = dict(manifest["metadata"])
    db._spellings = dict(manifest.get("spellings") or {})
    db._synonyms = {k: list(v) for k, v in
                    (manifest.get("synonyms") or {}).items()}
    db._versions = dict(manifest["versions"])
    db._searchers = []
    db._locate = {}
    db._docs_store = docs_store
    db._blobs = {}
    db._pending_docs = {}
    db._pending_deletes = set()
    db._builder = db._new_builder()
    for seg in segments:
        idx = len(db._searchers)
        db._searchers.append(SegmentSearcher(seg, db.scheme,
                                             device=db.device))
        for docid, key in enumerate(seg.doc_keys):
            if not seg.deleted[docid]:
                db._locate[key] = (idx, docid)
    if sharded and hasattr(db, "_generations"):
        db.n_shards = sharded["n_shards"]
        db._insert_seq = sharded["insert_seq"]
        db._generations = []
        db._seg_to_gen = {}
        db._mesh_step_cache.clear()
        for gmeta, ok in zip(sharded["generations"], orderkeys):
            gi = len(db._generations)
            db._generations.append({
                "searcher_idx": list(gmeta["searcher_idx"]),
                "segments": [db._searchers[i].segment
                             for i in gmeta["searcher_idx"]],
                "orderkey": ok, "stacked": None})
            for si, idx in enumerate(gmeta["searcher_idx"]):
                db._seg_to_gen[idx] = (gi, si)
    elif hasattr(db, "_generations"):
        # sharded replica of an unsharded primary: segments load fine,
        # there is just no generation/orderkey plane to rebuild
        db._generations = []
        db._seg_to_gen = {}
        db._mesh_step_cache.clear()
    for did, ct, loc, raw in blobs:
        have = None
        if loc is not None:
            try:
                have = db.datastore.get_by_type([loc], ct)
            except Exception:
                have = None
        if have == raw:   # local datastore already holds it: reuse locator
            locs = db._blobs.setdefault(did, [])
            locs[:] = [l for l in locs
                       if l.get("_content_type") != ct] + [loc]
        else:
            db.store_blob(did, ct, raw)   # replica: fresh local locator
    db.revision = int(manifest["revision"])
    return len(db._locate)


def load_snapshot_bytes(db, data: bytes) -> int:
    return load_snapshot(db, io.BytesIO(data))


# -- durable checkpoint under the data dir -----------------------------------

def checkpoint_path(data_path: str) -> str:
    return os.path.join(data_path, SNAPSHOT_FILE)


def write_checkpoint(db) -> Optional[str]:
    """Atomically persist a snapshot next to the WAL (temp + rename swap,
    the reference's temp-shard discipline), then prune WAL volumes wholly
    below the checkpointed revision: restart becomes load-bytes + replay
    of the post-checkpoint tail only."""
    if db.path is None:
        return None
    path = checkpoint_path(db.path)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        write_snapshot(db, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    if db.wal is not None:
        db.wal.prune(db.revision)
    return path


def _clear_state(db) -> None:
    """Reset ``db`` to pristine-empty after a failed snapshot swap, so the
    caller's full-WAL-replay fallback starts from a clean slate (a corrupt
    checkpoint must never leave half-loaded segments behind)."""
    from xapiand_tpu.schema import Schema

    db.schema = Schema()
    db._metadata = {}
    db._spellings = {}
    db._synonyms = {}
    db._versions = {}
    db._searchers = []
    db._locate = {}
    db._docs_store = {}
    db._blobs = {}
    db._pending_docs = {}
    db._pending_deletes = set()
    db._builder = db._new_builder()
    db.revision = 0
    if hasattr(db, "_generations"):
        db._generations = []
        db._seg_to_gen = {}
        db._mesh_step_cache.clear()
        db._insert_seq = 0


def load_checkpoint(db) -> Optional[int]:
    """Load the data dir's snapshot if present; returns its revision or
    None (missing/corrupt - caller falls back to full WAL replay)."""
    if db.path is None:
        return None
    path = checkpoint_path(db.path)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as fh:
            load_snapshot(db, fh)
        return db.revision
    except Exception:
        _clear_state(db)
        return None
