"""Mesh plane: shard parallelism over jax.sharding meshes.

Reference parity target: the scatter-gather distributed match
(src/database/handler.cc:1415-1553 two-phase prepare_mset/merge_mset, shard
routing handler.cc:1963-2005, docid striping handler.cc:835) - re-designed
as SPMD: per-device shard segments, global stats at plan time, local top-k
per device, all_gather + re-top-k merge over ICI, psum'd counts/aggregates.
A second 'dp' mesh axis data-parallelises the query batch (replica
parallelism for throughput, ≙ replicas serving reads).
"""

from xapiand_tpu.parallel.mesh import make_mesh  # noqa: F401
from xapiand_tpu.parallel.sharded import ShardedIndex  # noqa: F401
