"""Golden tests ported from
``TokenGeneratorWithKeywordSearchPosAppenderTest.java:40-231`` and
``TokenGeneratorWithSimilarityMeasurePosAppenderTest.java:40-295``."""

from mecab_ko_lucene_analyzer_spark.analysis import (
    NO_DECOMPOUND,
    KeywordSearchPosAppender,
    SimilarityMeasurePosAppender,
    TokenGenerator,
    TokenizerOption,
    parse_mock_nodes,
)


def run(appender_cls, nodes, min_len=NO_DECOMPOUND):
    gen = TokenGenerator(appender_cls(TokenizerOption()), min_len, parse_mock_nodes(nodes))
    out = []
    while (tokens := gen.next_eojeol_tokens()) is not None:
        out.append("[" + ", ".join(repr(t) for t in tokens) + "]")
    return out


# ---- KeywordSearchPosAppender ------------------------------------------


def test_keyword_basic_hangul_sentence():
    nodes = [
        "파란\tVA+ETM,*,T,파란,Inflect,VA,ETM,파랗/VA/*+ᆫ/ETM/*",
        "진달래\tNNG,*,F,진달래,*,*,*,*",
        " 꽃\tNNG,*,T,꽃,*,*,*,*",
        "이\tJKS,*,F,이,*,*,*,*",
        " 피\tVV,*,F,피,*,*,*,*",
        "었\tEP,*,T,었,*,*,*,*",
        "습니다\tEF,F,습니다,*,*,*,*",
        ".\t SF,*,*,*,*,*,*,*",
    ]
    assert run(KeywordSearchPosAppender, nodes) == [
        "[파란/INFLECT/null/1/1/0/2]",
        "[진달래/NNG/null/1/1/2/5]",
        "[꽃/NNG/null/1/1/6/7]",
        "[피었습니다/EOJEOL/null/1/1/9/14]",
    ]


def test_keyword_basic_hangul_sentence1():
    nodes = [
        "훈민정음\tNNP,*,T,훈민정음,Compound,*,*,훈민/NNG/*+정음/NNG/*",
        "은\tJX,*,T,은,*,*,*,*",
        "경건\tXR,*,T,경건,*,*,*,*",
        "한\tXSA+ETM,*,T,한,Inflect,XSA,ETM,하/XSA/*+ᆫ/ETM/*",
        "글자\tNNG,*,F,글자,Compound,*,*,글/NNG/*자/NNG/*",
        "이\tVCP,*,F,이,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(KeywordSearchPosAppender, nodes) == [
        "[훈민정음/COMPOUND/null/1/2/0/4]",
        "[경건/XR/null/1/1/5/7]",
        "[글자/COMPOUND/null/1/1/8/10]",
    ]


def test_keyword_sentence_with_compound():
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
    assert run(KeywordSearchPosAppender, nodes) == [
        "[삼성전자/COMPOUND/null/1/2/0/4]",
        "[대표적/EOJEOL/null/1/1/6/9]",
        "[복합/NNG/null/1/1/11/13]",
        "[명사/NNG/null/1/1/13/15]",
    ]


def test_keyword_sentence_with_english_and_symbols():
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
    assert run(KeywordSearchPosAppender, nodes) == [
        "[영어/NNG/null/1/1/0/2]",
        "[english/SL/null/1/1/3/10]",
        "[study/SL/null/1/1/12/17]",
        "[것/NNB/null/1/1/19/20]",
        "[어렵다/EOJEOL/null/1/1/21/24]",
    ]


def test_keyword_sentence_with_english_and_numbers_and_symbols():
    nodes = [
        "아이폰\tNNP,*,T,아이폰,*,*,*,*",
        "5\tSN,*,*,*,*,*,*,*",
        "s\tSL,*,*,*,*,*,*,*",
        "를\tJKO,*,T,를,*,*,*,*",
        "32\tSN,*,*,*,*,*,*,*",
        "GB\tSL,*,*,*,*,*,*,*",
        "로\tJKB,*,F,로,*,*,*,*",
        "구입\tNNG,*,T,구입,*,*,*,*",
        "했\tXSV+EP,*,T,했,Inflect,XSV,EP,하/XSV/*+았/EP/*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
        "elasticsearch\tSL,*,*,*,*,*,*,*",
        "1\tSN,*,*,*,*,*,*,*",
        ".\tSY,*,*,*,*,*,*,*",
        "4\tSN,*,*,*,*,*,*,*",
        ".\tSY,*,*,*,*,*,*,*",
        "3\tSN,*,*,*,*,*,*,*",
        "릴리스\tNNG,*,F,릴리스,*,*,*,*",
        "되\tVV,*,F,되,*,*,*,*",
        "었\tEP,*,T,었,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(KeywordSearchPosAppender, nodes) == [
        "[아이폰/NNP/null/1/1/0/3]",
        "[5/SN/null/1/1/3/4]",
        "[s/SL/null/1/1/4/5]",
        "[32/SN/null/1/1/6/8]",
        "[GB/SL/null/1/1/8/10]",
        "[구입/NNG/null/1/1/11/13]",
        "[elasticsearch/SL/null/1/1/16/29]",
        "[1/SN/null/1/1/29/30]",
        "[4/SN/null/1/1/31/32]",
        "[3/SN/null/1/1/33/34]",
        "[릴리스/NNG/null/1/1/34/37]",
        "[되었다/EOJEOL/null/1/1/37/40]",
    ]


# ---- SimilarityMeasurePosAppender ---------------------------------------


def test_similarity_basic_hangul_sentence():
    nodes = [
        "진달래\tNNG,*,F,진달래,*,*,*,*",
        " 꽃\tNNG,*,T,꽃,*,*,*,*",
        "이\tJKS,*,F,이,*,*,*,*",
        " 피\tVV,*,F,피,*,*,*,*",
        "었\tEP,*,T,었,*,*,*,*",
        "습니다\tEF,F,습니다,*,*,*,*",
        ".\t SF,*,*,*,*,*,*,*",
    ]
    assert run(SimilarityMeasurePosAppender, nodes) == [
        "[진달래/NNG/null/1/1/0/3]",
        "[꽃/NNG/null/1/1/4/5]",
    ]


def test_similarity_sentence_with_compound():
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
    assert run(SimilarityMeasurePosAppender, nodes) == [
        "[삼성전자/COMPOUND/null/1/2/0/4]",
        "[대표적/EOJEOL/null/1/1/6/9]",
        "[복합/NNG/null/1/1/11/13]",
        "[명사/NNG/null/1/1/13/15]",
    ]


def test_similarity_sentence_with_english_and_symbols():
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
    assert run(SimilarityMeasurePosAppender, nodes) == [
        "[영어/NNG/null/1/1/0/2]",
        "[english/SL/null/1/1/3/10]",
        "[study/SL/null/1/1/12/17]",
    ]


def test_similarity_sentence_with_english_and_numbers_and_symbols():
    nodes = [
        "아이폰\tNNP,*,T,아이폰,*,*,*,*",
        "5\tSN,*,*,*,*,*,*,*",
        "s\tSL,*,*,*,*,*,*,*",
        "를\tJKO,*,T,를,*,*,*,*",
        "32\tSN,*,*,*,*,*,*,*",
        "GB\tSL,*,*,*,*,*,*,*",
        "로\tJKB,*,F,로,*,*,*,*",
        "구입\tNNG,*,T,구입,*,*,*,*",
        "했\tXSV+EP,*,T,했,Inflect,XSV,EP,하/XSV/*+았/EP/*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
        "elasticsearch\tSL,*,*,*,*,*,*,*",
        "1\tSN,*,*,*,*,*,*,*",
        ".\tSY,*,*,*,*,*,*,*",
        "4\tSN,*,*,*,*,*,*,*",
        ".\tSY,*,*,*,*,*,*,*",
        "3\tSN,*,*,*,*,*,*,*",
        "릴리스\tNNG,*,F,릴리스,*,*,*,*",
        "되\tVV,*,F,되,*,*,*,*",
        "었\tEP,*,T,었,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(SimilarityMeasurePosAppender, nodes) == [
        "[아이폰/NNP/null/1/1/0/3]",
        "[5s/EOJEOL/null/1/1/3/5]",
        "[32GB/EOJEOL/null/1/1/6/10]",
        "[구입/NNG/null/1/1/11/13]",
        "[elasticsearch1.4.3/EOJEOL/null/1/1/16/34]",
        "[릴리스/NNG/null/1/1/34/37]",
    ]


def test_similarity_long_sentence():
    nodes = [
        "이\tMM,~명사,F,이,*,*,*,*",
        "위원장\tNNG,*,T,위원장,Compound,*,*,위원/NNG/*+장/NNG/*",
        "은\tJX,*,T,은,*,*,*,*",
        '"\tSY,*,*,*,*,*,*,*',
        "세계\tNNG,*,F,세계,*,*,*,*",
        "반도핑\tNNP,*,T,반도핑,*,*,*,*",
        "기구\tNNG,*,F,기구,*,*,*,*",
        "(\tSSO,*,*,*,*,*,*,*",
        "WADA\tSL,*,*,*,*,*,*,*",
        ")\tSSC,*,*,*,*,*,*,*",
        "의\tJKG,*,F,의,*,*,*,*",
        "1\tSN,*,*,*,*,*,*,*",
        "호\tNNBC,*,F,호,*,*,*,*",
        "금지\tNNG,*,F,금지,*,*,*,*",
        "약물\tNNG,*,T,약물,*,*,*,*",
        "이\tVCP,*,F,이,*,*,*,*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
        "근육\tNNG,*,T,근육,*,*,*,*",
        "을\tJKO,*,T,을,*,*,*,*",
        "강화\tNNG,*,F,강화,*,*,*,*",
        "시키\tXSV,*,F,시키,*,*,*,*",
        "는\tETM,*,T,는,*,*,*,*",
        "효과\tNNG,*,F,효과,*,*,*,*",
        "가\tJKS,*,F,가,*,*,*,*",
        "있\tVA,*,T,있,*,*,*,*",
        "어\tEC,*,F,어,*,*,*,*",
        "순간\tNNG,*,T,순간,*,*,*,*",
        "적\tXSN,*,T,적,*,*,*,*",
        "으로\tJKB,*,F,으로,*,*,*,*",
        "폭발\tNNG,*,T,폭발,*,*,*,*",
        "적\tXSN,*,T,적,*,*,*,*",
        "인\tVCP+ETM,*,T,인,Inflect,VCP,ETM,이/VCP/*+ᆫ/ETM/*",
        "힘\tNNG,*,T,힘,*,*,*,*",
        "을\tJKO,*,T,을,*,*,*,*",
        "필요\tNNG,*,F,필요,*,*,*,*",
        "로\tJKB,*,F,로,*,*,*,*",
        "하\tVV,*,F,하,*,*,*,*",
        "는\tETM,*,T,는,*,*,*,*",
        "육상\tNNG,*,T,육상,*,*,*,*",
        ",\tSC,*,*,*,*,*,*,*",
        "수영\tNNG,*,T,수영,*,*,*,*",
        ",\tSC,*,*,*,*,*,*,*",
        "사이클\tNNG,*,T,사이클,*,*,*,*",
        "종목\tNNG,*,T,종목,*,*,*,*",
        "에서\tJKB,*,F,에서,*,*,*,*",
        "많이\tMAG,성분부사/정도부사,F,많이,*,*,*,*",
        "이용\tNNG,*,T,이용,*,*,*,*",
        "하\tXSV,*,F,하,*,*,*,*",
        "다\tEC,*,F,다,*,*,*,*",
        "적발\tNNG,*,T,적발,*,*,*,*",
        "된다\tXSV+EC,*,F,된다,Inflect,XSV,EC,되/XSV/*+ᆫ다/EC/*",
        '"\tSY,*,*,*,*,*,*,*',
        "고\tJKQ,*,F,고,*,*,*,*",
        "했\tVV+EP,*,T,했,Inflect,VV,EP,하/VV/*+았/EP/*",
        "다\tEF,*,F,다,*,*,*,*",
        ".\tSF,*,*,*,*,*,*,*",
    ]
    assert run(SimilarityMeasurePosAppender, nodes) == [
        "[위원장/COMPOUND/null/1/2/1/4]",
        "[세계/NNG/null/1/1/6/8]",
        "[반도핑/NNP/null/1/1/8/11]",
        "[기구/NNG/null/1/1/11/13]",
        "[WADA/SL/null/1/1/14/18]",
        "[1/SN/null/1/1/20/21]",
        "[호/NNBC/null/1/1/21/22]",
        "[금지/NNG/null/1/1/22/24]",
        "[약물/NNG/null/1/1/24/26]",
        "[근육/NNG/null/1/1/29/31]",
        "[강화/NNG/null/1/1/32/34]",
        "[효과/NNG/null/1/1/37/39]",
        "[순간적/EOJEOL/null/1/1/42/45]",
        "[폭발적/EOJEOL/null/1/1/47/50]",
        "[힘/NNG/null/1/1/51/52]",
        "[필요/NNG/null/1/1/53/55]",
        "[육상/NNG/null/1/1/58/60]",
        "[수영/NNG/null/1/1/61/63]",
        "[사이클/NNG/null/1/1/64/67]",
        "[종목/NNG/null/1/1/67/69]",
        "[이용/NNG/null/1/1/73/75]",
        "[적발/NNG/null/1/1/77/79]",
    ]
