"""Golden tests ported from the reference's dictionary-independent tier:
``TokenGeneratorWithStandardPosAppenderTest.java:40-671``.

Each case feeds mocked lattice nodes (``surface\\tfeatureCSV``; leading
space on surface = whitespace) and asserts the exact ``Pos.toString()``
sequences per eojeol. These define byte-identity for the analysis chain.
"""

import pytest

from mecab_ko_lucene_analyzer_spark.analysis import (
    NO_DECOMPOUND,
    StandardPosAppender,
    TokenGenerator,
    TokenizerOption,
    parse_mock_nodes,
)


def run(nodes, min_len=NO_DECOMPOUND, option=None):
    gen = TokenGenerator(
        StandardPosAppender(option or TokenizerOption()), min_len, parse_mock_nodes(nodes)
    )
    out = []
    while (tokens := gen.next_eojeol_tokens()) is not None:
        out.append("[" + ", ".join(repr(t) for t in tokens) + "]")
    return out


def test_basic_hangul_sentence():
    nodes = [
        "진달래\tNNG,*,F,진달래,*,*,*,*",
        " 꽃\tNNG,*,T,꽃,*,*,*,*",
        "이\tJKS,*,F,이,*,*,*,*",
        " 피\tVV,*,F,피,*,*,*,*",
        "었\tEP,*,T,었,*,*,*,*",
        "습니다\tEF,F,습니다,*,*,*,*",
        ".\t SF,*,*,*,*,*,*,*",
    ]
    assert run(nodes) == [
        "[진달래/NNG/null/1/1/0/3]",
        "[꽃이/EOJEOL/null/1/1/4/6, 꽃/NNG/null/0/1/4/5]",
        "[피었습니다/EOJEOL/null/1/1/7/12, 피/VV/null/0/1/7/8]",
    ]


def test_no_using_va_vv_original_form():
    nodes = [
        "진달래\tNNG,*,F,진달래,*,*,*,*",
        " 꽃\tNNG,*,T,꽃,*,*,*,*",
        "이\tJKS,*,F,이,*,*,*,*",
        " 피\tVV,*,F,피,*,*,*,*",
        "었\tEP,*,T,었,*,*,*,*",
        "습니다\tEF,F,습니다,*,*,*,*",
        ".\t SF,*,*,*,*,*,*,*",
    ]
    opt = TokenizerOption(use_adjective_and_verb_original_form=False)
    assert run(nodes, option=opt) == [
        "[진달래/NNG/null/1/1/0/3]",
        "[꽃이/EOJEOL/null/1/1/4/6, 꽃/NNG/null/0/1/4/5]",
        "[피었습니다/EOJEOL/null/1/1/7/12]",
    ]


def test_decompound():
    nodes = ["삼성전자\tNNP,*,F,삼성전자,Compound,*,*,삼성/NNG/*+전자/NNG/*"]
    assert run(nodes, min_len=1) == [
        "[삼성/NNG/null/1/1/0/2, 삼성전자/COMPOUND/null/0/2/0/4, 전자/NNG/null/1/1/2/4]",
    ]


def test_complex_decompound():
    nodes = ["아질산나트륨\tNNG,*,T,아질산나트륨,Compound,*,*,아/NNG/*+질산/NNG/*+나트륨/NNG/*"]
    assert run(nodes, min_len=1) == [
        "[아/NNG/null/1/1/0/1, 아질산나트륨/COMPOUND/null/0/3/0/6, "
        "아질산/COMPOUND/null/0/2/0/3, 질산/NNG/null/1/1/1/3, "
        "질산나트륨/COMPOUND/null/0/2/1/6, 나트륨/NNG/null/1/1/3/6]",
    ]


def test_complex_decompound1():
    nodes = ["새절역\tNNP,지명,T,새절역,Compound,*,*,새/MM/~명사+절/NNG/*+역/NNG/*"]
    assert run(nodes, min_len=1) == [
        "[새/MM/~명사/1/1/0/1, 새절역/COMPOUND/null/0/3/0/3, "
        "새절/COMPOUND/null/0/2/0/2, 절/NNG/null/1/1/1/2, 역/NNG/null/1/1/2/3]",
    ]


def test_complex_with_number_decompound():
    nodes = ["을지로3가역\tNNG,*,T,을지로3가역,Compound,*,*,을지로/NNP/*+3/SN/*+가/NNG/*+역/NNG/*"]
    assert run(nodes, min_len=1) == [
        "[을지로/NNP/null/1/1/0/3, 을지로3가역/COMPOUND/null/0/4/0/6, "
        "을지로3/COMPOUND/null/0/2/0/4, 3/SN/null/1/1/3/4, "
        "3가/COMPOUND/null/0/2/3/5, 가/NNG/null/1/1/4/5, "
        "역/NNG/null/1/1/5/6]",
    ]


def test_no_decompound():
    nodes = ["삼성전자\tNNP,*,F,삼성전자,Compound,*,*,삼성/NNG/*+전자/NNG/*"]
    assert run(nodes, min_len=NO_DECOMPOUND) == ["[삼성전자/COMPOUND/null/1/2/0/4]"]


def test_compound_noun_min_length4():
    nodes = ["무궁화\tNNG,*,F,무궁화,Compound,*,*,무궁/NNG/*+화/NNG/*"]
    assert run(nodes, min_len=4) == ["[무궁화/COMPOUND/null/1/2/0/3]"]

    nodes = ["삼성전자\tNNP,*,F,삼성전자,Compound,*,*,삼성/NNG/*+전자/NNG/*"]
    assert run(nodes, min_len=4) == [
        "[삼성/NNG/null/1/1/0/2, 삼성전자/COMPOUND/null/0/2/0/4, 전자/NNG/null/1/1/2/4]",
    ]


def test_sentence_with_decompound_all():
    nodes = [
        "삼성전자\tNNP,*,F,삼성전자,Compound,*,*,삼성/NNG/*+전자/NNG/*",
        "는\tJX,*,T,는,*,*,*,*",
        " 대표\tNNG,*,F,대표,*,*,*,*",
        "적\tXSN,*,T,적,*,*,*,*",
        "인\tVCP+ETM,*,T,인,Inflect,VCP,ETM,이/VCP/*+ㄴ/ETM/*",
        " 복합\tNNG,*,T,복합,*,*,*,*",
        "명사\tNNG,*,F,명사,*,*,*,*",
        "이\tVCP,*,F,이,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(nodes, min_len=1) == [
        "[삼성/NNG/null/1/1/0/2, 삼성전자는/EOJEOL/null/0/2/0/5, "
        "삼성전자/COMPOUND/null/0/2/0/4, 전자/NNG/null/1/1/2/4]",
        "[대표/NNG/null/1/1/6/8]",
        "[적인/EOJEOL/null/1/1/8/10, 적/XSN/null/0/1/8/9]",
        "[복합/NNG/null/1/1/11/13]",
        "[명사이다/EOJEOL/null/1/1/13/17, 명사/NNG/null/0/1/13/15]",
    ]


def test_sentence_with_decompound_complex_compound_noun():
    nodes = [
        "아질산나트륨\tNNG,*,T,아질산나트륨,Compound,*,*,아/NNG/*+질산/NNG/*+나트륨/NNG/*",
        "이란\tJX,*,T,이란,*,*,*,*",
        "무엇\tNP,*,T,무엇,*,*,*,*",
        "인가요\tVCP+EF,*,F,인가요,Inflect,VCP,EF,이/VCP/*+ㄴ가요/EF/*",
        "?\tSF,*,*,*,*,*,*,*",
    ]
    assert run(nodes, min_len=1) == [
        "[아/NNG/null/1/1/0/1, 아질산나트륨이란/EOJEOL/null/0/3/0/8, "
        "아질산나트륨/COMPOUND/null/0/3/0/6, 아질산/COMPOUND/null/0/2/0/3, "
        "질산/NNG/null/1/1/1/3, 질산나트륨/COMPOUND/null/0/2/1/6, "
        "나트륨/NNG/null/1/1/3/6]",
        "[무엇인가요/EOJEOL/null/1/1/8/13, 무엇/NP/null/0/1/8/10]",
    ]


def test_sentence_with_compound_noun_min_length4():
    nodes = [
        "나\tNP,*,F,나,*,*,*,*",
        "의\tJKG,*,F,의,*,*,*,*",
        "무궁화\tNNG,*,F,무궁화,Compound,*,*,무궁/NNG/*+화/NNG/*",
        "꽃\tNNG,*,T,꽃,*,*,*,*",
        "을\tJKO,*,T,을,*,*,*,*",
        "보\tVV,*,F,보,*,*,*,*",
        "아라\tEF,*,F,아라,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[나의/EOJEOL/null/1/1/0/2, 나/NP/null/0/1/0/1]",
        "[무궁화/COMPOUND/null/1/2/2/5]",
        "[꽃을/EOJEOL/null/1/1/5/7, 꽃/NNG/null/0/1/5/6]",
        "[보아라/EOJEOL/null/1/1/7/10, 보/VV/null/0/1/7/8]",
    ]


def test_sentence_with_english_and_symbols():
    nodes = [
        "영어\tNNG,*,F,영어,*,*,*,*",
        "(\tSSO,*,*,*,*,*,*,*",
        "english\tSL,*,*,*,*,*,*,*",
        ")\tSSC,*,*,*,*,*,*,*",
        "를\tJKO,*,T,를,*,*,*,*",
        "study\tSL,*,*,*,*,*,*,*",
        "하\tXSV,*,F,하,*,*,*,*",
        "는\tETM,*,T,는,*,*,*,*",
        "것\tNNB,*,T,것,*,*,*,*",
        "은\tJX,*,T,은,*,*,*,*",
        "어렵\tVA,*,T,어렵,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(nodes, min_len=2) == [
        "[영어/NNG/null/1/1/0/2]",
        "[english/SL/null/1/1/3/10]",
        "[를/J/null/1/1/11/12]",
        "[study/SL/null/1/1/12/17]",
        "[하는/EOJEOL/null/1/1/17/19]",
        "[것은/EOJEOL/null/1/1/19/21, 것/NNB/null/0/1/19/20]",
        "[어렵다/EOJEOL/null/1/1/21/24, 어렵/VA/null/0/1/21/23]",
    ]


def test_preanalysis():
    nodes = [
        "은전한닢\tNNG+NR+NNG,*,T,은전한닢,Preanalysis,NNG,NR,은전/NNG/*+한/NR/*+닢/NNG/*",
    ]
    assert run(nodes, min_len=4) == [
        "[은전/NNG/null/1/1/0/2]",
        "[한/NR/null/1/1/2/3]",
        "[닢/NNG/null/1/1/3/4]",
    ]


def test_preanalysis_sentence():
    nodes = [
        "은전한닢\tNNG+NR+NNG,*,T,은전한닢,Preanalysis,NNG,NR,은전/NNG/*+한/NR/*+닢/NNG/*",
        "은\tJX,*,T,은,*,*,*,*",
        "오픈\tNNG,*,T,오픈,*,*,*,*",
        "소스\tNNG,*,F,소스,*,*,*,*",
        "이\tVCP,*,F,이,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[은전/NNG/null/1/1/0/2]",
        "[한/NR/null/1/1/2/3]",
        "[닢은/EOJEOL/null/1/1/3/5, 닢/NNG/null/0/1/3/4]",
        "[오픈/NNG/null/1/1/5/7]",
        "[소스이다/EOJEOL/null/1/1/7/11, 소스/NNG/null/0/1/7/9]",
    ]


def test_unknown_surface():
    nodes = [
        "걀꿀\tUNKNOWN,*,*,*,*,*,*,*",
        " 없\tVA,*,T,없,*,*,*,*",
        "는\tETM,*,T,는,*,*,*,*",
        " 단어\tNNG,*,F,단어,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[걀꿀/UNKNOWN/null/1/1/0/2]",
        "[없는/EOJEOL/null/1/1/3/5, 없/VA/null/0/1/3/4]",
        "[단어/NNG/null/1/1/6/8]",
    ]


def test_symbol_only_sentence():
    nodes = ["!@#$%^&*()\tSY,*,*,*,*,*,*"]
    assert run(nodes, min_len=3) == []


def test_xsn():
    nodes = [
        "의대\tNNG,*,F,의대,*,*,*,*",
        "생\tXSN,*,T,생,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[의대/NNG/null/1/1/0/2]",
        "[생/XSN/null/1/1/2/3]",
    ]


def test_sentence_with_xsn():
    nodes = [
        "공대\tNNG,*,F,공대,*,*,*,*",
        "생\tXSN,*,T,생,*,*,*,*",
        "은\tJX,*,T,은,*,*,*,*",
        " 바쁘\tVA,*,F,바쁘,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[공대/NNG/null/1/1/0/2]",
        "[생은/EOJEOL/null/1/1/2/4, 생/XSN/null/0/1/2/3]",
        "[바쁘다/EOJEOL/null/1/1/5/8, 바쁘/VA/null/0/1/5/7]",
    ]


def test_independent_xpn():
    nodes = [
        "왕\tXPN,*,T,왕,*,*,*,*",
        "게임\tNNG,*,T,게임,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[왕/XPN/null/1/1/0/1, 왕게임/COMPOUND/null/0/2/0/3, 게임/NNG/null/1/1/1/3]",
    ]


def test_xpn():
    nodes = [
        "비\tXPN,*,F,비,*,*,*,*",
        "정상\tNNG,*,T,정상,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == ["[비정상/NNG/null/1/1/0/3]"]


def test_xpn1():
    nodes = [
        "너\tNP,*,F,너,*,*,*,*",
        "는\tJX,*,T,는,*,*,*,*",
        "비\tXPN,*,F,비,*,*,*,*",
        "정상\tNNG,*,T,정상,*,*,*,*",
        "이\tVCP,*,F,이,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[너는/EOJEOL/null/1/1/0/2, 너/NP/null/0/1/0/1]",
        "[비정상이다/EOJEOL/null/1/1/2/7, 비정상/NNG/null/0/1/2/5]",
    ]


def test_inflect1():
    nodes = [
        "그것\tNP,*,T,그것,*,*,*,*",
        "은\tJX,*,T,은,*,*,*,*",
        "어려운\tVA+ETM,*,T,어려운,Inflect,VA,ETM,어렵/VA/*+ᆫ/ETM/*",
        "문제\tNNG,*,F,문제,*,*,*,*",
        "다\tVCP+EF,*,F,다,Inflect,VCP,EF,이/VCP/*+다/EF/*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[그것은/EOJEOL/null/1/1/0/3, 그것/NP/null/0/1/0/2]",
        "[어려운/INFLECT/null/1/1/3/6, 어렵/VA/null/0/1/3/5]",
        "[문제다/EOJEOL/null/1/1/6/9, 문제/NNG/null/0/1/6/8]",
    ]


def test_inflect2():
    nodes = [
        "그것\tNP,*,T,그것,*,*,*,*",
        "은\tJX,*,T,은,*,*,*,*",
        "어려워\tVA+EF,*,F,어려워,Inflect,VA,EF,어렵/VA/*+어/EF/*",
        "란\tETM,*,T,란,*,*,*,*",
        "문제\tNNG,*,F,문제,*,*,*,*",
        "다\tVCP+EF,*,F,다,Inflect,VCP,EF,이/VCP/*+다/EF/*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[그것은/EOJEOL/null/1/1/0/3, 그것/NP/null/0/1/0/2]",
        "[어려워란/EOJEOL/null/1/1/3/7, 어렵/VA/null/0/1/3/5]",
        "[문제다/EOJEOL/null/1/1/7/10, 문제/NNG/null/0/1/7/9]",
    ]


def test_inflect3():
    nodes = [
        "오빤\tNNG+VCP+JX,*,T,오빤,Inflect,NNG,JX,오빠/NNG/*+이/VCP/*+ㄴ/JX/*",
        "강남\tNNP,지명,T,강남,*,*,*,*",
        "스타일\tNNG,*,T,스타일,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[오빤/INFLECT/null/1/1/0/2, 오빠/NNG/null/0/1/0/2]",
        "[강남/NNP/지명/1/1/2/4]",
        "[스타일/NNG/null/1/1/4/7]",
    ]


def test_semantic_class():
    nodes = [
        "남희석\tNNP,인명,T,남희석,*,*,*,*",
        "은\tJX,*,T,은,*,*,*,*",
        " 충남\tNNP,지명,T,충남,*,*,*,*",
        "사람\tNNG,*,T,사람,*,*,*,*",
        "이\tVCP,*,F,이,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(nodes, min_len=4) == [
        "[남희석은/EOJEOL/null/1/1/0/4, 남희석/NNP/인명/0/1/0/3]",
        "[충남/NNP/지명/1/1/5/7]",
        "[사람이다/EOJEOL/null/1/1/7/11, 사람/NNG/null/0/1/7/9]",
    ]
