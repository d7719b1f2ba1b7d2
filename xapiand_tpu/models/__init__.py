"""Index data model (segments, dictionaries) and ranking weight schemes.

Reference parity targets: the glass backend's posting/value/position tables
(src/xapian/backends/glass/) re-designed as immutable flat device arrays, and
the Xapian weight schemes (src/xapian/weight/).
"""

from xapiand_tpu.models.segment import Segment, DeviceSegment  # noqa: F401
from xapiand_tpu.models.builder import SegmentBuilder  # noqa: F401
