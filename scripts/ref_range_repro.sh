#!/bin/bash
# Minimal repro: the reference's value-range queries return 0 hits for
# EVERY range form while exact terms and value sorts work (VERDICT r4 #6;
# BASELINE.md cfg4 note). Run against a from-source build:
#
#     bash scripts/ref_range_repro.sh /tmp/xbuild/bin/xapiand
#
# Expected (broken) output: exact=1 sort=3 then 0 for every range row.
#
# Diagnosis (2026-08-19, see BASELINE.md "reference value-range defect"):
# - slot values ARE stored and readable: "_sort":[{"price":...}] orders
#   correctly, and the glass postlist.glass contains both valuestats
#   entries ("\0\xd0"+slot, glass_values.cc:63) and value chunks
#   ("\0\xd8"+slot) for the fields;
# - every range form fails identically: numeric, datetime, string
#   (string ranges build NO accuracy terms - range.cc getStringQuery is a
#   bare MultipleValueRange posting source - so the failure is in the
#   ValuePostingSource/valuestream path, not term generation);
# - _id (slot 0) ranges fail too, ruling out big-hashed-slot truncation;
# - the fork rewrote the matcher + ExternalPostList plumbing
#   (PostingSource::reset(db, shard_index), max_weight_cached_flag_ptr -
#   neither exists in upstream Xapian 1.4 which this forks), and ships
#   ZERO engine tests (tests/test_string.cc is the whole suite), so the
#   defect is attributed to the reference snapshot itself, not to our
#   GCC-12 build patches (which touch errno_to_string, libuuid, and the
#   unicode-table codegen only - none on this path).
set -e
BIN="${1:-/tmp/xbuild/bin/xapiand}"
DATA=$(mktemp -d /tmp/xt-rangerepro-XXXX)
"$BIN" -D "$DATA" --port 18898 --http-servers 1 --http-clients 2 \
    --uid root --gid root --solo >/dev/null 2>&1 &
SRV=$!
trap 'kill $SRV 2>/dev/null; rm -rf "$DATA"' EXIT
for i in $(seq 1 20); do
    curl -sf localhost:18898/ >/dev/null 2>&1 && break; sleep 1
done
for i in 1 2 3; do
    curl -s -XPUT "localhost:18898/r/$i" -H 'Content-Type: application/json' \
        -d "{\"price\": $((i*10)), \"ts\": \"2024-0$i-15T12:00:00\", \"name\": {\"_type\": \"keyword\", \"_value\": \"k$i\"}}" >/dev/null
done
curl -s -XPOST localhost:18898/r/:commit >/dev/null
q() { curl -s -XPOST localhost:18898/r/:search \
        -H 'Content-Type: application/json' -d "$1" \
      | python3 -c 'import json,sys; print(json.load(sys.stdin).get("total"))'; }
echo "exact price=20            -> $(q '{"_query": {"price": 20}}') (expect 1)"
echo "sort by price (total)     -> $(q '{"_query": "*", "_sort": [{"price": {"_order": "desc"}}]}') (expect 3; ordering correct)"
echo "numeric range 5..35       -> $(q '{"_query": {"price": {"_in": {"_range": {"_from": 5, "_to": 35}}}}}') (expect 2, get 0 = BROKEN)"
echo "numeric range 10..10      -> $(q '{"_query": {"price": {"_in": {"_range": {"_from": 10, "_to": 10}}}}}') (expect 1, get 0)"
echo "numeric GE 5 (open)       -> $(q '{"_query": {"price": {"_in": {"_range": {"_from": 5}}}}}') (expect 3, get 0)"
echo "date range 2024           -> $(q '{"_query": {"ts": {"_in": {"_range": {"_from": "2024-01-01", "_to": "2024-12-31"}}}}}') (expect 3, get 0)"
echo "string range k1..k3       -> $(q '{"_query": {"name": {"_in": {"_range": {"_from": "k1", "_to": "k3"}}}}}') (expect 3, get 0; NO accuracy terms involved)"
echo "_id range 1..3 (slot 0)   -> $(q '{"_query": {"_id": {"_in": {"_range": {"_from": 1, "_to": 3}}}}}') (expect 3, get 0)"
