"""Content negotiation: JSON / MsgPack / NDJSON / YAML bodies.

Reference parity target: http_client.cc:1000-1005 (accepted types) and the
serialise-per-Accept response path; gzip/deflate content encodings.
"""

from __future__ import annotations

from xapiand_tpu.utils import codecs

CT_JSON = "application/json"
CT_MSGPACK = "application/x-msgpack"
CT_NDJSON = "application/x-ndjson"
CT_YAML = "application/yaml"

_ALIASES = {
    "application/json": CT_JSON, "text/json": CT_JSON,
    "application/x-msgpack": CT_MSGPACK, "application/msgpack": CT_MSGPACK,
    "application/x-ndjson": CT_NDJSON, "application/ndjson": CT_NDJSON,
    "application/yaml": CT_YAML, "text/yaml": CT_YAML,
    "application/x-yaml": CT_YAML, "text/x-yaml": CT_YAML,
}


def normalise_ct(value: str | None, default: str = CT_JSON) -> str:
    if not value:
        return default
    base = value.split(";")[0].strip().lower()
    return _ALIASES.get(base, default if base in ("*/*", "") else
                        _ALIASES.get(base, CT_JSON))


def decode_body(raw: bytes, content_type: str | None):
    ct = normalise_ct(content_type)
    if not raw:
        return None
    if ct == CT_MSGPACK:
        return codecs.unpack_msgpack(raw)
    if ct == CT_NDJSON:
        return codecs.loads_ndjson(raw)
    if ct == CT_YAML:
        return codecs.loads_yaml(raw)
    return codecs.loads_json(raw)


def pick_accept(accept_header: str | None, request_ct: str | None) -> str:
    """Response type: explicit Accept wins, else mirror the request type."""
    if accept_header:
        for part in accept_header.split(","):
            base = part.split(";")[0].strip().lower()
            if base in _ALIASES:
                return _ALIASES[base]
            if base in ("*/*", "application/*"):
                break
    return normalise_ct(request_ct)


def encode_body(obj, content_type: str, pretty: bool = False) -> bytes:
    if content_type == CT_MSGPACK:
        return codecs.pack_msgpack(obj)
    if content_type == CT_NDJSON:
        items = obj if isinstance(obj, list) else [obj]
        return codecs.dumps_ndjson(items)
    if content_type == CT_YAML:
        return codecs.dumps_yaml(obj)
    return codecs.dumps_json(obj, indent=2 if pretty else None)


# structured body types the engine itself speaks (blob retrieval bypasses)
KNOWN_STRUCTURED = frozenset({
    CT_JSON, CT_MSGPACK, CT_NDJSON, CT_YAML, "application/msgpack",
    "application/ndjson", "text/yaml", "application/x-yaml", "text/x-yaml",
    "text/plain", "text/html",
})
