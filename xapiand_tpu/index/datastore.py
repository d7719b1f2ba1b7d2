"""Document data store: content-type -> Locator blob map per document.

Reference parity target: src/database/data.{h,cc} (Data/Locator: a msgpack
map from content type to inplace or stored blob, data.h:128-184) and the
.docdata volumes written by storage_push_blobs (shard.cc:1099). Powers the
STORE verb (arbitrary typed blobs per document) and document hydration.

Small objects stay "inplace" (in the locator map itself); large ones go to
an append-only volume and the locator keeps (volume, offset, size).
"""

from __future__ import annotations

import os
from typing import Optional

from xapiand_tpu.index.storage import Storage
from xapiand_tpu.utils.codecs import pack_msgpack, unpack_msgpack

INPLACE_LIMIT = 4096
OBJ_CT = "application/msgpack"  # the structured document body


class DataStore:
    """One directory of .docdata volumes + an in-memory locator map.

    The locator map itself is persisted through the WAL/commit flow by the
    owning shard (locators ride REPLACE_DOCUMENT lines), so this class only
    manages blob bytes.
    """

    def __init__(self, dirname: Optional[str]):
        self.dir = dirname
        self._volume: Optional[Storage] = None
        if dirname is not None:
            os.makedirs(dirname, exist_ok=True)

    def _vol(self) -> Storage:
        if self.dir is None:
            raise RuntimeError("in-memory datastore cannot store blobs")
        if self._volume is None:
            self._volume = Storage(os.path.join(self.dir, "docdata.0"))
        return self._volume

    # -- locator construction ---------------------------------------------------

    def put_object(self, obj) -> dict:
        """Structured document body -> locator entry."""
        raw = pack_msgpack(obj)
        return self.put_blob(OBJ_CT, raw)

    def put_blob(self, content_type: str, raw: bytes) -> dict:
        if len(raw) <= INPLACE_LIMIT or self.dir is None:
            return {"_type": "inplace", "_content_type": content_type,
                    "_data": raw}
        off = self._vol().write(raw)
        return {"_type": "stored", "_content_type": content_type,
                "_volume": 0, "_offset": off, "_size": len(raw)}

    # -- retrieval -----------------------------------------------------------------

    def get_blob(self, locator: dict) -> bytes:
        if locator["_type"] == "inplace":
            return locator["_data"]
        return self._vol().read(locator["_offset"])

    def get_object(self, locators: list[dict]):
        for loc in locators:
            if loc.get("_content_type") == OBJ_CT:
                return unpack_msgpack(self.get_blob(loc))
        return None

    def content_types(self, locators: list[dict]) -> list[str]:
        return [loc.get("_content_type") for loc in locators]

    def get_by_type(self, locators: list[dict], content_type: str) -> bytes | None:
        for loc in locators:
            if loc.get("_content_type") == content_type:
                return self.get_blob(loc)
        return None

    def fsync(self):
        if self._volume is not None:
            self._volume.fsync()

    def close(self):
        if self._volume is not None:
            self._volume.close()
            self._volume = None
