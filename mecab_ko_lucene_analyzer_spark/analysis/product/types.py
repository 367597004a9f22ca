"""Character/term type classification for the product-name chain (A11).

Matches ``ProductNameTokenizer.getType/getUniType/getTermType``
(``ProductNameTokenizer.java:424-531``) using Unicode general
categories, plus the symbol whitelists and the number pattern
(``:51-96``).
"""

from __future__ import annotations

import re
import unicodedata

__all__ = [
    "WHITESPACE", "SYMBOL", "ALPHA", "NUMBER", "HANGUL", "HANGUL_JAMO",
    "JAPANESE", "CHINESE", "OTHER_LANGUAGE", "UNCATEGORIZED",
    "NUMBER_TRANS", "MODEL_NAME", "ALPHANUM", "ASCII_TYPE", "UNIT",
    "UNIT_ALPHA", "FULL_STRING", "MAKER", "BRAND", "COMPOUND", "STOPWORD",
    "char_type", "uni_type", "term_type", "is_alphanum",
    "AVAIL_SYMBOLS", "AVAIL_SYMBOLS_CONNECTOR", "AVAIL_SYMBOLS_INNUMBER",
    "PTN_NUMBER", "MAX_UNIT_LENGTH", "FULL_TERM_LENGTH",
]

WHITESPACE = "<WHITESPACE>"
SYMBOL = "<SYMBOL>"
ALPHA = "<ALPHA>"
NUMBER = "<NUMBER>"
HANGUL = "<HANGUL>"
HANGUL_JAMO = "<HANGUL_JAMO>"
JAPANESE = "<JAPANESE>"
CHINESE = "<CHINESE>"
OTHER_LANGUAGE = "<OTHER_LANGUAGE>"
UNCATEGORIZED = "<UNCATEGORIZED>"
NUMBER_TRANS = "<NUMBER_TRANS>"
MODEL_NAME = "<MODEL_NAME>"
ALPHANUM = "<ALPHANUM>"
ASCII_TYPE = "<ASCII>"
UNIT = "<UNIT>"
UNIT_ALPHA = "<UNIT_ALPHA>"
FULL_STRING = "<FULL_STRING>"
MAKER = "<MAKER>"
BRAND = "<BRAND>"
COMPOUND = "<COMPOUND>"
STOPWORD = "<STOPWORD>"

FULL_TERM_LENGTH = 64
MAX_UNIT_LENGTH = 10

#: symbols a term may contain (``AVAIL_SYMBOLS``)
AVAIL_SYMBOLS = frozenset("-./+&")
#: connector symbols inside model names (``AVAIL_SYMBOLS_CONNECTOR``)
AVAIL_SYMBOLS_CONNECTOR = frozenset("-./&")
#: symbols allowed inside numbers (``AVAIL_SYMBOLS_INNUMBER``)
AVAIL_SYMBOLS_INNUMBER = frozenset(",.:")

#: comma/decimal/colon number shape (``PTN_NUMBER``, :64-87)
PTN_NUMBER = re.compile(
    r"^((([0-9]{0,3}([,][0-9]{3})*)|([0-9]+))([.][0-9]+)*)"
    r"([:](((([0-9]{0,3}([,][0-9]{3})*)|([0-9]+))([.][0-9]+)*))){0,1}$"
)

_SYMBOL_CATS = {"Pd", "Ps", "Pe", "Pc", "Po", "Sm", "Sc", "Sk", "So", "Pi", "Pf"}


def char_type(ch: str) -> str:
    if ch.isspace():
        return WHITESPACE
    cat = unicodedata.category(ch)
    if cat in _SYMBOL_CATS:
        return SYMBOL
    if cat == "Lo":
        cp = ord(ch)
        if 0xAC00 <= cp <= 0xD7A3:
            return HANGUL
        if 0x3130 <= cp <= 0x318F or 0x1100 <= cp <= 0x11FF:
            return HANGUL_JAMO
        if 0x3040 <= cp <= 0x30FF:
            return JAPANESE
        if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF:
            return CHINESE
        return OTHER_LANGUAGE
    if cat in ("Lu", "Ll"):
        return ALPHA
    if cat == "Nd":
        return NUMBER
    return UNCATEGORIZED


def uni_type(s: str) -> str:
    """Single uniform type or UNCATEGORIZED (``getUniType``)."""
    t = None
    for ch in s:
        cur = char_type(ch)
        if t is not None and cur != t:
            return UNCATEGORIZED
        t = cur
    return t


def term_type(s: str) -> str:
    """Composite term type (``getTermType``): ALPHA/NUMBER runs mixing
    → ALPHANUM; +SYMBOL → ASCII; anything else mixed → UNCATEGORIZED."""
    t = None
    for ch in s:
        cur = char_type(ch)
        if t is None:
            t = cur
            continue
        if cur == t:
            continue
        if (t == ALPHA and cur == NUMBER) or (t == NUMBER and cur == ALPHA):
            t = ALPHANUM
        elif t == ALPHANUM and cur in (ALPHA, NUMBER):
            t = ALPHANUM
        elif t in (ALPHA, NUMBER, ALPHANUM) and cur == SYMBOL:
            t = ASCII_TYPE
        elif t == ASCII_TYPE and cur in (ALPHA, NUMBER, SYMBOL):
            t = ASCII_TYPE
        else:
            t = UNCATEGORIZED
    return t


def is_alphanum(s: str) -> bool:
    return len(s) > 0 and all(char_type(c) in (ALPHA, NUMBER) for c in s)
