"""Device-plane query kernels (JAX/XLA/Pallas).

The reference's query hot path - the postlist operator tree walked by
Matcher::get_local_mset (src/xapian/matcher/matcher.cc:347-542) - is
re-designed as a scatter-free static dataflow:

  gather posting spans (lax.dynamic_slice, size-class bucketed)
    -> flatten -> lax.sort by docid
    -> segmented scan merges per-doc score / term-match bits
    -> boolean tree evaluated bitwise over match bits (vectorised)
    -> value/geo filters as dense column compares
    -> lax.top_k (or multi-key lax.sort for value ordering)

plus fused aggregations (masked reductions + one-hot matmuls on the MXU).
"""
