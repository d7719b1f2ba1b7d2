"""xapiand-tpu: a TPU-native distributed search & storage engine.

A ground-up rebuild of the capabilities of Kronuz/Xapiand (C++ search engine
embedding a forked Xapian) designed for TPU hardware:

- Device plane (JAX/XLA/Pallas): immutable HBM-resident index segments as
  flat sorted posting arrays; queries compile to static dataflow
  (gather -> sort -> segmented scan -> predicate -> lax.top_k) replacing the
  reference's postlist iterator trees (reference: src/xapian/matcher/).
- Host plane (Python + C++ where hot): schema'd JSON/MsgPack document model,
  term generation, WAL + blob storage, REST API
  (reference: src/database/schema.cc, src/database/wal.cc, src/server/http_client.cc).
- Mesh plane (jax.sharding / shard_map): docid-striped shards across a device
  mesh, global BM25 stats and top-k merge via collectives
  (reference: src/database/handler.cc scatter-gather two-phase match).
"""

__version__ = "0.1.0"
