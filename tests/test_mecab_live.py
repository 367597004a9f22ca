"""Live-dictionary integration tier (FIXTURES.md §F3): golden token
streams from ``MeCabKoStandardTokenizerTest.java:85-230``, runnable only
when mecab-python3 + mecab-ko-dic are installed (the reference's own
tier-2 split — its unit tier runs dictionary-free, its integration tier
needs the native dictionary).

Golden format: ``term:type:pos:semanticClass:posIncr:posLen:start:end,``
"""

import pytest

mecab = pytest.importorskip("MeCab")

from mecab_ko_lucene_analyzer_spark.analysis.pos import NO_DECOMPOUND
from mecab_ko_lucene_analyzer_spark.analysis.tokenizer import get_lattice_provider, tokenize


def render(text: str, min_len: int = 3) -> str:
    out = []
    position = 0
    for p in tokenize(text, "standard", min_len, provider=get_lattice_provider()):
        sem = p.semantic_class if p.semantic_class is not None else "null"
        pos = p.pos if p.pos is not None else "null"
        out.append(
            f"{p.token_string()}:{p.pos_id.name}:{pos}:{sem}:"
            f"{p.position_incr}:{p.position_length}:{p.start_offset}:{p.end_offset},"
        )
    return "".join(out)


# (text, min_len, expected) — expected strings verbatim from
# MeCabKoStandardTokenizerTest.java
CASES = [
    ("이승기 미근동", 2,
     "이승기:NNP:NNP:인명:1:1:0:3,미근:NNP:NNP:지명:1:1:4:6,"
     "미근동:COMPOUND:null:null:0:2:4:7,동:NNG:NNG:null:1:1:6:7,"),
    ("꽃배달 꽃망울 오토바이", 2,
     "꽃:NNG:NNG:null:1:1:0:1,배달:NNG:NNG:null:1:1:1:3,"
     "꽃:NNG:NNG:null:1:1:4:5,꽃망울:COMPOUND:null:null:0:2:4:7,"
     "망울:NNG:NNG:null:1:1:5:7,오토바이:NNG:NNG:null:1:1:8:12,"),
    ("한글win", 3,
     "한글:NNG:NNG:null:1:1:0:2,win:SL:SL:null:1:1:2:5,"),
    ("형태소", 3,
     "형태:NNG:NNG:null:1:1:0:2,형태소:COMPOUND:null:null:0:2:0:3,"
     "소:NNG:NNG:null:1:1:2:3,"),
    ("형태소", NO_DECOMPOUND, "형태소:COMPOUND:NNG:null:1:2:0:3,"),
    ("걀꿀 없는 단어", 3,
     "걀꿀:UNKNOWN:UNKNOWN:null:1:1:0:2,없는:EOJEOL:VA+ETM:null:1:1:3:5,"
     "없/VA:VA:VA:null:0:1:3:4,단어:NNG:NNG:null:1:1:6:8,"),
]


@pytest.mark.parametrize("text,min_len,expected", CASES, ids=[c[0] for c in CASES])
def test_live_mecab_golden(text, min_len, expected):
    assert render(text, min_len) == expected


def test_empty_and_symbols_produce_nothing():
    assert render("") == ""
    assert render("!@#$%^&*") == ""
