"""Host-side utility layer: canonical type serialisation, sortable keys,
datetime math, UUIDs, hashing, codecs.

Reference parity targets: src/serialise.{h,cc}, src/sortable_serialise.{h,cc},
src/datetime.{h,cc}, src/cuuid/, src/hashes.hh.
"""
