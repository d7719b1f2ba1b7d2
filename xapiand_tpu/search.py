"""SegmentSearcher: jit-compiled query execution over one DeviceSegment.

Holds the per-(ExecConfig, segment) compilation cache - the TPU-era
equivalent of the reference's DatabasePool of ready readers (pool.h:151):
reopening a reader becomes a jit-cache hit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from xapiand_tpu.models.segment import DeviceSegment, Segment
from xapiand_tpu.models.weights import WeightScheme, get_scheme
from xapiand_tpu.ops.executor import ExecConfig, execute
from xapiand_tpu.query.plan import BoundPlan


class SegmentSearcher:
    def __init__(self, seg: Segment, scheme: Optional[WeightScheme] = None,
                 device=None):
        self.segment = seg
        self.device_segment = DeviceSegment(seg, device=device)
        self.scheme = scheme or get_scheme("bm25")
        self._cache: dict = {}

    def refresh_deleted(self):
        """Re-upload the delete bitmap after host-side deletes (delta
        deletes on immutable segments, SURVEY.md §7 hard-parts)."""
        self.device_segment.deleted = jax.device_put(
            jnp.asarray(self.segment.deleted, jnp.bool_))

    def _compiled(self, cfg: ExecConfig, scheme: WeightScheme):
        key = (cfg, scheme.key())
        fn = self._cache.get(key)
        if fn is None:
            def run(seg_arrays, plan_arrays, stats):
                return execute(seg_arrays, plan_arrays, cfg, stats, scheme)

            fn = jax.jit(run)
            self._cache[key] = fn
        return fn

    def batched(self, cfg: ExecConfig, scheme: Optional[WeightScheme] = None):
        """jit(vmap(execute)) over a leading query axis - the single-chip
        throughput path (one compiled program serves every query of this
        shape class)."""
        scheme = scheme or self.scheme
        key = ("batched", cfg, scheme.key())
        fn = self._cache.get(key)
        if fn is None:
            def run(seg_arrays, plan_batch, stats):
                return jax.vmap(
                    lambda p: execute(seg_arrays, p, cfg, stats, scheme)
                )(plan_batch)

            fn = jax.jit(run)
            self._cache[key] = fn
        return fn

    def execute(self, bound: BoundPlan, stats: dict,
                scheme: Optional[WeightScheme] = None) -> dict:
        """stats: {"N": float, "avg_doclen": float, "doclen_lower": float,
        "doclen_upper": float, "total_len": float}."""
        fn = self._compiled(bound.cfg, scheme or self.scheme)
        plan_arrays = jax.tree.map(jnp.asarray, bound.arrays)
        stats_arrays = {k: jnp.float32(v) for k, v in stats.items()}
        out = fn(self.device_segment.arrays_pytree(), plan_arrays,
                 stats_arrays)
        return jax.tree.map(np.asarray, out)
