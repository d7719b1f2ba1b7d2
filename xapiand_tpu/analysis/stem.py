"""Snowball stemming with ISO language-code resolution.

Reference parity target: src/xapian/languages/ (Snowball stemmers compiled
from .sbl) and the schema's `_language`/`_stem_language` keywords
(src/database/schema.h). Uses NLTK's pure-Python Snowball implementations
(same Snowball algorithm family as the reference's compiled stemmers).
"""

from __future__ import annotations

from functools import lru_cache

from nltk.stem.snowball import SnowballStemmer

# ISO 639-1 / common-name resolution, mirroring Xapian::Stem language aliases
# (src/xapian/stem.cc language list).
_LANG_ALIASES = {
    "ar": "arabic", "da": "danish", "nl": "dutch", "en": "english",
    "fi": "finnish", "fr": "french", "de": "german", "hu": "hungarian",
    "it": "italian", "no": "norwegian", "nb": "norwegian", "nn": "norwegian",
    "pt": "portuguese", "ro": "romanian", "ru": "russian", "es": "spanish",
    "sv": "swedish", "porter": "porter",
    "id": "indonesian", "ga": "irish", "ne": "nepali",
    "early_english": "earlyenglish",
    "hy": "armenian", "eu": "basque", "ca": "catalan",
    "kraaij-pohlmann": "kraaij_pohlmann",
    "lt": "lithuanian", "ta": "tamil", "tr": "turkish",
}
from xapiand_tpu.analysis.stem_extra import EXTRA_STEMMERS  # noqa: E402
from xapiand_tpu.analysis.stem_extra2 import EXTRA_STEMMERS_2  # noqa: E402

EXTRA_STEMMERS.update(EXTRA_STEMMERS_2)

_SUPPORTED = set(SnowballStemmer.languages) | set(EXTRA_STEMMERS)


class StemError(ValueError):
    pass


def resolve_language(lang: str | None) -> str | None:
    """Resolve a language spec to a Snowball language name, or None for
    'none'/'' (no stemming)."""
    if not lang or lang.lower() in ("none", "false"):
        return None
    lang = lang.lower()
    lang = _LANG_ALIASES.get(lang, lang)
    if lang not in _SUPPORTED:
        return None  # unsupported languages degrade to no stemming
    return lang


@lru_cache(maxsize=32)
def _stemmer(lang: str) -> SnowballStemmer:
    return SnowballStemmer(lang)


@lru_cache(maxsize=262144)
def _stem_cached(lang: str, word: str) -> str:
    """Vocabulary repeats heavily during bulk indexing; memoising the
    Snowball call is the single biggest host-side analysis speedup."""
    extra = EXTRA_STEMMERS.get(lang)
    if extra is not None:
        return extra(word)
    return _stemmer(lang).stem(word)


class Stem:
    """Callable stemmer, Xapian::Stem-alike."""

    def __init__(self, lang: str | None = "english"):
        self.language = resolve_language(lang)
        self._impl = None
        if self.language:
            self._impl = EXTRA_STEMMERS.get(self.language) or \
                _stemmer(self.language)

    def __call__(self, word: str) -> str:
        if self._impl is None:
            return word
        return _stem_cached(self.language, word)

    def __repr__(self):
        return f"Stem({self.language or 'none'})"


def stem_word(word: str, lang: str | None = "english") -> str:
    return Stem(lang)(word)
