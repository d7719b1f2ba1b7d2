"""Host-side persistence: append-only storage volumes, write-ahead log,
document data store.

Reference parity targets: src/storage.h (volume files), src/database/wal.cc
(per-shard WAL with replay), src/database/data.cc (content-type -> Locator
blob map in .docdata volumes).
"""

from xapiand_tpu.index.storage import Storage, StorageError  # noqa: F401
from xapiand_tpu.index.wal import DatabaseWAL, WalOp  # noqa: F401
from xapiand_tpu.index.datastore import DataStore  # noqa: F401
