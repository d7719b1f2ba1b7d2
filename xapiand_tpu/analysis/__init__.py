"""Text analysis chain: tokenisation, stemming, stopwords, term generation,
accuracy terms.

Reference parity targets: Xapian TermGenerator
(src/xapian/queryparser/termgenerator_internal.cc: tokenisation, stemming,
positions, CJK n-grams), Snowball stemmers (src/xapian/languages/),
stopword lists (/stopwords/*.txt), GenerateTerms accuracy terms
(src/multivalue/generate_terms.h:57-116).
"""

from xapiand_tpu.analysis.termgen import TermGenerator, STEM_SOME, STEM_ALL, STEM_ALL_Z, STEM_NONE  # noqa: F401
from xapiand_tpu.analysis.unicode_tok import tokenize  # noqa: F401
