"""HTTP/REST plane.

Reference parity target: src/server/http_client.{h,cc} (views
http_client.h:321-351; method/command dispatch http_client.cc:1013-1219;
content negotiation JSON/MsgPack/NDJSON/YAML http_client.cc:1000-1005).

The reference extends HTTP with custom verbs (SEARCH, COUNT, UPDATE, STORE,
... http_client.cc:150-155); aiohttp's C parser rejects unknown methods at
the wire, so the pure-Python parser is selected before aiohttp loads.
"""

import os as _os
import sys as _sys

if "aiohttp" not in _sys.modules:
    _os.environ.setdefault("AIOHTTP_NO_EXTENSIONS", "1")

from xapiand_tpu.server.app import create_app, IndexManager  # noqa: F401,E402
