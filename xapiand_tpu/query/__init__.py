"""Query layer: logical IR, JSON DSL compiler, query-string parsers, and the
IR -> device-plan compiler.

Reference parity targets: src/query_dsl.{h,cc} (JSON DSL -> Xapian::Query),
src/booleanParser/ (string query syntax), src/field_parser.*, and the query
serialisation of src/xapian/api/query*.
"""

from xapiand_tpu.query.ir import Q  # noqa: F401
