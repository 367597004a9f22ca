"""Product-name chain tests (A11–A23).

The reference ships no tests for this chain; the verifiable spec is its
documented rules — PTN_NUMBER shapes, number+unit extraction with
synonyms and comma-stripped variants, model-name merging with sub-entry
(extra-term) emission, the 숫자x숫자 dimensional rule and its documented
examples (``ProductNameParsingRule.java:694-716``), space-dict splits,
compound expansion at index time, stopwords, and the extractor's
connection grammar.
"""

import pytest

from mecab_ko_lucene_analyzer_spark.analysis.dictionary import (
    SetDictionary,
    SynonymDictionary,
)
from mecab_ko_lucene_analyzer_spark.analysis.product import (
    KoreanWordExtractor,
    ProductAnalyzerOption,
    ProductDictionarySet,
    ProductNameAnalyzer,
    TagProbDictionary,
)
from mecab_ko_lucene_analyzer_spark.analysis.product.types import (
    FULL_STRING,
    MODEL_NAME,
    PTN_NUMBER,
    UNIT,
)


@pytest.fixture(scope="module")
def dicts():
    return ProductDictionarySet(
        tag_prob=TagProbDictionary.from_words(
            {
                "삼성": ("N", -8.0),
                "전자": ("N", -8.0),
                "노트북": ("N", -8.0),
                "가방": ("N", -8.0),
                "모니터": ("N", -8.0),
                "삼성전자": ("N", -6.0),
                "대한": ("N", -8.0),
                "민국": ("N", -8.0),
                "대한민국": ("N", -5.0),
            }
        ),
        unit=SetDictionary(["gb", "mm", "cm", "인치", "kg", "v"]),
        unit_synonym=SynonymDictionary({"gb": ["기가"]}),
        synonym=SynonymDictionary({"노트북": ["laptop", "랩탑"]}),
        stop=SetDictionary(["세일"]),
        space={"노트북가방": ["노트북", "가방"]},
        compound={"삼성전자": ["삼성", "전자"]},
    )


def analyze(dicts, text, **kw):
    return ProductNameAnalyzer(dicts, ProductAnalyzerOption(**kw)).analyze(text)


def terms(tokens):
    return [t["term"] for t in tokens]


# ---- PTN_NUMBER (``:64-87``) ---------------------------------------------


@pytest.mark.parametrize(
    "s,ok",
    [
        ("1000", True),
        ("1,000", True),
        ("1,000.5", True),
        ("1,000:10.5", True),
        ("12.5", True),
        ("1,00", False),
        ("1,0000", False),
        # quirk preserved: the reference pattern's [0-9]{0,3} matches
        # empty, so a leading group may be bare (",100" accepted)
        (",100", True),
        ("1..5", False),
    ],
)
def test_ptn_number(s, ok):
    assert bool(PTN_NUMBER.match(s)) == ok


# ---- extractor (A13–A15) ---------------------------------------------------


def test_extractor_exact_and_splits(dicts):
    ex = KoreanWordExtractor(dicts.tag_prob)

    def words(text):
        return [text[s.start : s.start + s.length] for s in ex.extract(text)]

    assert words("대한민국") == ["대한민국"]  # exact-match fast path
    assert words("대한민국은") == ["대한민국", "은"]  # noun + josa
    assert words("노트북가방") == ["노트북", "가방"]
    assert words("걀꿀") == ["걀꿀"]  # UNK whole


def test_extractor_josa_harmony(dicts):
    ex = KoreanWordExtractor(dicts.tag_prob)
    # 는 after final-consonant (북) violates harmony → whole UNK
    segs = ex.extract("노트북는")
    assert [s.tag.value for s in segs] == ["UNK"]
    # 은 after final-consonant is fine
    segs = ex.extract("가방은")
    assert [s.tag.value for s in segs] == ["N", "J"]


# ---- units (A17) -------------------------------------------------------------


def test_number_trans_unit_with_synonym_and_stripped_variant(dicts):
    toks = analyze(dicts, "1,024gb")
    assert toks[0]["term"] == "1,024gb"
    assert toks[0]["type"] == UNIT
    assert "1,024기가" in toks[0]["synonyms"]
    assert "1024gb" in [e["term"] for e in toks[0]["extra_terms"]]


def test_unit_index_mode_emits_variants_at_same_position(dicts):
    toks = analyze(dicts, "1,024gb", use_for_query=False)
    ts = terms(toks)
    assert {"1,024gb", "1024gb", "1,024", "1024"} <= set(ts)
    assert len({t["position"] for t in toks}) == 1


# ---- dimensional vs model name (documented examples :694-716) ---------------


def test_dimensional_number_x_number(dicts):
    assert terms(analyze(dicts, "모니터 100x200cm")) == ["모니터", "100", "200cm"]
    assert terms(analyze(dicts, "모니터 100cmx200cm")) == ["모니터", "100cm", "200cm"]


def test_model_name_with_connector(dicts):
    toks = analyze(dicts, "SL-M2029")
    assert toks[0]["term"] == "SL-M2029"
    assert toks[0]["type"] == MODEL_NAME
    assert {"SL", "2029"} <= {e["term"] for e in toks[0]["extra_terms"]}


def test_model_priority_over_trailing_alpha(dicts):
    toks = analyze(dicts, "1024mmcc")
    assert toks[0]["type"] == MODEL_NAME  # unit 'mm' NOT extracted


def test_standalone_long_number_is_model_name(dicts):
    toks = analyze(dicts, "제품 12345", use_for_query=False)
    tok = next(t for t in toks if t["term"] == "12345")
    assert tok["type"] == MODEL_NAME


def test_plus_does_not_merge_model(dicts):
    ts = terms(analyze(dicts, "SL-M2029+USB"))
    assert "SL-M2029" in ts and "USB" in ts
    assert "SL-M2029+USB" not in ts


# ---- dictionaries ------------------------------------------------------------


def test_space_dictionary_force_split(dicts):
    assert terms(analyze(dicts, "노트북가방")) == ["노트북", "가방"]


def test_compound_expansion_index_only(dicts):
    idx = terms(analyze(dicts, "삼성전자", use_for_query=False))
    assert idx == ["삼성전자", "삼성", "전자"]
    q = analyze(dicts, "삼성전자")
    assert q[0]["term"] == "삼성전자"


def test_stopword_dropped_and_kept(dicts):
    assert "세일" not in terms(analyze(dicts, "노트북 세일"))
    kept = analyze(dicts, "노트북 세일", use_stopword=False)
    assert "세일" in terms(kept)


def test_synonym_attachment_query_mode(dicts):
    toks = analyze(dicts, "노트북")
    assert toks[0]["synonyms"] == ["laptop", "랩탑"]


def test_full_string_query_only(dicts):
    toks = analyze(dicts, "노트북 가방", use_full_string=True)
    assert toks[0]["type"] == FULL_STRING
    idx = analyze(dicts, "노트북 가방", use_for_query=False, use_full_string=True)
    assert all(t["type"] != FULL_STRING for t in idx)


def test_uppercase_option(dicts):
    toks = analyze(dicts, "sl-m2029", to_uppercase=True)
    assert toks[0]["term"] == "SL-M2029"


def test_long_name_window_cut_prefers_symbol_boundary():
    """Names longer than tabular_size must cut at a symbol boundary,
    not a hard mid-word cut (the pp-shift in _cut_length was a no-op,
    leaving the boundary branch dead — dictionary words straddling the
    20-char cut were destroyed into UNK fragments)."""
    from mecab_ko_lucene_analyzer_spark.analysis.product import (
        TagProbDictionary,
    )
    from mecab_ko_lucene_analyzer_spark.analysis.product.extractor import (
        KoreanWordExtractor,
        PosTag,
    )

    d = TagProbDictionary.from_words(
        {"가나다라마바": ("N", -8.0), "사아자차카타": ("N", -8.0)}
    )
    ex = KoreanWordExtractor(d, tabular_size=8)
    text = "가나다라마바-사아자차카타-가나다라마바"
    segs = ex.extract(text)
    words = [
        text[s.start : s.start + s.length]
        for s in segs
        if s.tag_prob.tag == PosTag.N
    ]
    assert words == ["가나다라마바", "사아자차카타", "가나다라마바"]
    assert all(s.tag_prob.tag != PosTag.UNK for s in segs)
