"""Hangul jamo compose/decompose arithmetic (A16, ``MorphUtil.java:3-116``).

Pure code-point math on the 0xAC00 syllable block: syllable =
0xAC00 + 초성*588 + 중성*28 + 종성.
"""

from __future__ import annotations

__all__ = [
    "CHOSEONG",
    "JUNGSEONG",
    "JONGSEONG",
    "is_hangul",
    "has_jongseong",
    "decompose",
    "compose",
]

CHOSEONG = "ㄱㄲㄴㄷㄸㄹㅁㅂㅃㅅㅆㅇㅈㅉㅊㅋㅌㅍㅎ"
JUNGSEONG = "ㅏㅐㅑㅒㅓㅔㅕㅖㅗㅘㅙㅚㅛㅜㅝㅞㅟㅠㅡㅢㅣ"
JONGSEONG = "\0ㄱㄲㄳㄴㄵㄶㄷㄹㄺㄻㄼㄽㄾㄿㅀㅁㅂㅄㅅㅆㅇㅈㅊㅋㅌㅍㅎ"

_BASE = 0xAC00
_JUNG_JONG = 21 * 28
_JONG = 28


def is_hangul(ch: str) -> bool:
    return 0xAC00 <= ord(ch) <= 0xD7A3


def has_jongseong(ch: str) -> bool:
    """Final-consonant presence — drives josa agreement (은/는, 이/가...)."""
    if not is_hangul(ch):
        return False
    return (ord(ch) - _BASE) % _JONG != 0


def decompose(ch: str) -> tuple[str, ...]:
    if not is_hangul(ch):
        return (ch,)
    c = ord(ch) - _BASE
    cho = CHOSEONG[c // _JUNG_JONG]
    jung = JUNGSEONG[(c % _JUNG_JONG) // _JONG]
    jong = JONGSEONG[c % _JONG]
    return (cho, jung, jong) if jong != "\0" else (cho, jung)


def compose(cho: str, jung: str, jong: str | None = None) -> str:
    ci = CHOSEONG.index(cho)
    ji = JUNGSEONG.index(jung)
    ki = JONGSEONG.index(jong) if jong else 0
    return chr(_BASE + ci * _JUNG_JONG + ji * _JONG + ki)
