"""Pinned mini morpheme dictionary for the fallback lattice provider.

The reference loads mecab-ko-dic through JNI (``MeCabLoader.java:33``).
That native dictionary is unavailable here, so integration paths use a
deterministic mini-dictionary: the synthetic corpus is generated *from*
this vocabulary, making segmentation exact and reproducible — the same
two-tier strategy as the reference's tests (mocked lattice for
semantics, live dictionary when present).

Feature strings follow the mecab-ko-dic 8-field CSV layout
(``Pos.java:47-55``)::

    POS,semanticClass,hasJongseong,reading,type,startPos,endPos,expression
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["stem_dict", "suffix_dict", "corpus_nouns", "JOSA"]

# final-consonant (jongseong) presence decides josa form; computed, not stored
_BASE = 0xAC00


def has_jongseong(word: str) -> bool:
    cp = ord(word[-1])
    if not (0xAC00 <= cp <= 0xD7A3):
        return False
    return (cp - _BASE) % 28 != 0


def _noun_feature(word: str, sem: str = "*") -> str:
    t = "T" if has_jongseong(word) else "F"
    return f"NNG,{sem},{t},{word},*,*,*,*"


def _compound_feature(word: str, parts: list[str]) -> str:
    t = "T" if has_jongseong(word) else "F"
    expr = "+".join(f"{p}/NNG/*" for p in parts)
    return f"NNG,*,{t},{word},Compound,*,*,{expr}"


#: josa (particles) — deliberately the skew-heavy terms; the josa set the
#: reference hardcodes for its extractor lives at
#: ``KoreanWordExtractor.java:62``.
JOSA: dict[str, str] = {
    "은": "JX,*,T,은,*,*,*,*",
    "는": "JX,*,T,는,*,*,*,*",
    "이": "JKS,*,F,이,*,*,*,*",
    "가": "JKS,*,F,가,*,*,*,*",
    "을": "JKO,*,T,을,*,*,*,*",
    "를": "JKO,*,T,를,*,*,*,*",
    "의": "JKG,*,F,의,*,*,*,*",
    "과": "JC,*,F,과,*,*,*,*",
    "와": "JC,*,F,와,*,*,*,*",
    "에": "JKB,*,F,에,*,*,*,*",
    "에서": "JKB,*,F,에서,*,*,*,*",
    "으로": "JKB,*,F,으로,*,*,*,*",
    "로": "JKB,*,F,로,*,*,*,*",
    "도": "JX,*,F,도,*,*,*,*",
    "만": "JX,*,T,만,*,*,*,*",
}

#: verb/adjective stems + endings for minimal predicate coverage
_VERB_STEMS = ["하", "보", "가", "남", "먹", "읽", "만들"]
_ENDINGS = {
    "다": "EF,*,F,다,*,*,*,*",
    "았다": "EP+EF,*,F,았다,*,*,*,*",
    "었다": "EP+EF,*,F,었다,*,*,*,*",
    "는다": "EF,*,F,는다,*,*,*,*",
    "고": "EC,*,F,고,*,*,*,*",
    "며": "EC,*,F,며,*,*,*,*",
    "었습니다": "EP+EF,*,F,었습니다,*,*,*,*",
}

# deterministic syllable pool for generated corpus nouns (no RNG here;
# composition index IS the seed)
_SYLLABLES = list("가나다라마바사아자차카타파하거너더러머버서어저처커터퍼허고노도로모보소오조초코토포호구누두루무부수우주추쿠투푸후기니디리미비시지치키티피히")


@lru_cache(maxsize=None)
def corpus_nouns(n: int = 600) -> list[str]:
    """Deterministic noun vocabulary: 2–3 syllable combinations indexed
    by base-m digits of the position (guaranteed distinct for
    ``n < len(pool)**2``)."""
    out = []
    seen = set()
    m = len(_SYLLABLES)
    k = 0
    while len(out) < n:
        a, b = k % m, (k // m) % m
        word = _SYLLABLES[a] + _SYLLABLES[b]
        if k % 3 == 0:
            word += _SYLLABLES[(k * 7 + 5) % m]
        if word not in seen:
            seen.add(word)
            out.append(word)
        k += 1
        if k > 100 * n + m * m:  # safety: never spin unbounded
            raise RuntimeError("corpus_nouns: vocabulary pool exhausted")
    return out


@lru_cache(maxsize=None)
def stem_dict() -> dict[str, str]:
    """surface → feature CSV for stems (nouns, compounds, verb stems)."""
    d: dict[str, str] = {}
    # hand-pinned nouns (fixture-adjacent vocabulary)
    for w in [
        "진달래", "대표", "복합", "명사", "영어", "단어", "문제", "스타일",
        "오픈", "소스", "사람", "게임", "정상", "검색", "엔진", "형태소",
        "분석", "결과", "문서", "색인", "질의", "순위", "점수", "한국어",
        "데이터", "처리", "시스템", "웹", "페이지", "서울", "부산",
    ]:
        d[w] = _noun_feature(w)
    d["강남"] = _noun_feature("강남", "지명")
    d["충남"] = _noun_feature("충남", "지명")
    # vocabulary for the reference-replica goldens
    # (MeCabKoStandardTokenizerTest.java:104-204) — entries mirror the
    # mecab-ko-dic analyses those tests assert against
    for w in ["꽃", "배달", "망울", "오토바이", "한글", "형태", "소",
              "가고", "문헌", "소설", "무궁", "화"]:
        d[w] = _noun_feature(w)
    d["이승기"] = "NNP,인명,F,이승기,*,*,*,*"
    d["미근"] = "NNP,지명,T,미근,*,*,*,*"
    d["동"] = _noun_feature("동")
    d["미근동"] = "NNP,지명,T,미근동,Compound,*,*,미근/NNP/지명+동/NNG/*"
    d["꽃망울"] = _compound_feature("꽃망울", ["꽃", "망울"])
    d["가고문헌"] = _compound_feature("가고문헌", ["가고", "문헌"])
    d["무궁화"] = _compound_feature("무궁화", ["무궁", "화"])
    d["피"] = "VV,*,F,피,*,*,*,*"
    # MeCabKoTest.java:60-66 (학생용 핸드폰): 학생용 analyzes as a whole
    # NNP; 핸드폰 is Compound 핸드+폰
    d["학생용"] = "NNP,*,T,학생용,*,*,*,*"
    d["핸드"] = _noun_feature("핸드")
    d["폰"] = _noun_feature("폰")
    d["핸드폰"] = _compound_feature("핸드폰", ["핸드", "폰"])
    # mecab-ko-dic analyzes 형태소 itself as a compound (형태+소) — the
    # live-tier expectations in test_mecab_live.py pin exactly this
    d["형태소"] = _compound_feature("형태소", ["형태", "소"])
    d["프로젝트"] = _noun_feature("프로젝트")
    d["없"] = "VA,*,T,없,*,*,*,*"
    # Preanalysis: the entry splits into pre-analyzed morphemes (A3),
    # like mecab-ko-dic's 은전한닢 entry the reference's
    # testPreanalysisSentence exercises
    d["은전한닢"] = "NNG,*,T,은전한닢,Preanalysis,*,*,은전/NNG/*+한/NR/*+닢/NNG/*"
    # compounds exercise the decompound path (A8) at corpus scale
    d["삼성전자"] = "NNP,*,F,삼성전자,Compound,*,*,삼성/NNG/*+전자/NNG/*"
    d["검색엔진"] = _compound_feature("검색엔진", ["검색", "엔진"])
    d["형태소분석"] = _compound_feature("형태소분석", ["형태소", "분석"])
    d["데이터처리"] = _compound_feature("데이터처리", ["데이터", "처리"])
    d["웹페이지"] = _compound_feature("웹페이지", ["웹", "페이지"])
    for w in corpus_nouns():
        d.setdefault(w, _noun_feature(w))
    for v in _VERB_STEMS:
        t = "T" if has_jongseong(v) else "F"
        d[v] = f"VV,*,{t},{v},*,*,*,*"
    return d


@lru_cache(maxsize=None)
def suffix_dict() -> dict[str, str | list[str]]:
    """surface → feature CSV (or list of CSVs for ambiguous surfaces)
    for suffixes (josa + verb endings + copula)."""
    d: dict[str, str | list[str]] = dict(JOSA)
    d.update(_ENDINGS)
    # 는 is a homograph: topic particle after nouns, adnominal ending
    # after verb/adjective stems (없는) — the Viterbi connection matrix
    # picks the reading per context
    d["는"] = [JOSA["는"], "ETM,*,F,는,*,*,*,*"]
    # copula conjugation is an Inflect entry (start VCP, end EF) like
    # mecab-ko-dic's — appendability keys on the start tag (NNG+VCP)
    d["이다"] = "VCP+EF,*,F,이다,Inflect,VCP,EF,이/VCP/*+다/EF/*"
    return d
