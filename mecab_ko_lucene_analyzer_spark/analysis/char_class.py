"""Character-class segmentation (A11).

Re-expresses ``ProductNameTokenizer.getType/isSplit``
(``ProductNameTokenizer.java:487-531,197-259``): classify each char,
break runs on class change or whitespace. Used by the fallback
dictionary segmenter and the product-name chain.
"""

from __future__ import annotations

from enum import Enum

__all__ = ["CharClass", "classify_char", "split_runs"]


class CharClass(Enum):
    HANGUL = "HANGUL"
    JAMO = "JAMO"
    ALPHA = "ALPHA"
    NUMBER = "NUMBER"
    SYMBOL = "SYMBOL"
    JAPANESE = "JAPANESE"
    CHINESE = "CHINESE"
    WHITESPACE = "WHITESPACE"


def _classify_uncached(ch: str) -> CharClass:
    cp = ord(ch)
    if ch.isspace():
        return CharClass.WHITESPACE
    if 0xAC00 <= cp <= 0xD7A3:
        return CharClass.HANGUL
    if 0x1100 <= cp <= 0x11FF or 0x3130 <= cp <= 0x318F:
        return CharClass.JAMO
    if ("a" <= ch <= "z") or ("A" <= ch <= "Z"):
        return CharClass.ALPHA
    if "0" <= ch <= "9":
        return CharClass.NUMBER
    if 0x3040 <= cp <= 0x30FF:
        return CharClass.JAPANESE
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF:
        return CharClass.CHINESE
    return CharClass.SYMBOL


# per-char memo: this sits on the per-character hot path of every
# tokenized document; real corpora use a few thousand distinct chars,
# so a plain dict turns the range checks into one hash lookup
_CLS_CACHE: dict[str, CharClass] = {}


def classify_char(ch: str) -> CharClass:
    cls = _CLS_CACHE.get(ch)
    if cls is None:
        cls = _CLS_CACHE[ch] = _classify_uncached(ch)
    return cls


def split_runs(text: str) -> list[tuple[str, CharClass, int]]:
    """Split ``text`` into maximal same-class runs.

    Returns ``(run, char_class, space_len)`` triples where ``space_len``
    is the length of the whitespace run immediately preceding this run
    (mecab's ``rlength - length`` convention, ``Pos.java:215-218``).
    Symbols do not merge into multi-char runs except repeats of the
    same symbol category; we keep symbol runs char-by-char only when
    the chars differ in punctuation role downstream, so here symbols
    run together like other classes and the segmenter re-splits.
    """
    runs: list[tuple[str, CharClass, int]] = []
    i = 0
    n = len(text)
    pending_space = 0
    while i < n:
        cls = classify_char(text[i])
        if cls is CharClass.WHITESPACE:
            j = i
            while j < n and classify_char(text[j]) is CharClass.WHITESPACE:
                j += 1
            pending_space += j - i
            i = j
            continue
        j = i
        while j < n and classify_char(text[j]) is cls:
            j += 1
        runs.append((text[i:j], cls, pending_space))
        pending_space = 0
        i = j
    return runs
