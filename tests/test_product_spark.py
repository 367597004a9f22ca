"""Product-name chain on Spark: the analyzer as a mapInPandas token
table with closure-shipped dictionaries (≙ broadcast + hot reload)."""

import pytest

from mecab_ko_lucene_analyzer_spark.analysis.dictionary import (
    SetDictionary,
    SynonymDictionary,
)
from mecab_ko_lucene_analyzer_spark.analysis.product import (
    ProductAnalyzerOption,
    ProductDictionarySet,
    TagProbDictionary,
)
from mecab_ko_lucene_analyzer_spark.functions.udfs import product_tokens_table


@pytest.fixture(scope="module")
def dicts():
    return ProductDictionarySet(
        tag_prob=TagProbDictionary.from_words(
            {"삼성": ("N", -8.0), "노트북": ("N", -8.0), "가방": ("N", -8.0)}
        ),
        unit=SetDictionary(["gb", "인치"]),
        unit_synonym=SynonymDictionary({"gb": ["기가"]}),
        synonym=SynonymDictionary({"노트북": ["laptop"]}),
        space={"노트북가방": ["노트북", "가방"]},
    )


def test_product_tokens_on_spark(spark, dicts):
    docs = spark.createDataFrame(
        [
            (0, "삼성 노트북 SL-M2029 1,024gb"),
            (1, "노트북가방 13인치"),
        ],
        "doc_id long, text string",
    )
    rows = product_tokens_table(docs, dicts).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["term"], r["position"]))
    terms0 = [t for t, _ in by_doc[0]]
    # model name + its parts, unit + comma-stripped/plain variants
    assert "SL-M2029" in terms0 and "SL" in terms0 and "2029" in terms0
    assert {"1,024gb", "1024gb", "1,024", "1024"} <= set(terms0)
    # same-position emission for variants
    pos = dict(by_doc[0])
    assert pos["1,024gb"] == pos["1024gb"]
    # space dictionary split, unit detection
    terms1 = [t for t, _ in by_doc[1]]
    assert terms1[:2] == ["노트북", "가방"] and "13인치" in terms1
    # dictionary synonyms are QUERY-side in the product chain
    # (``ProductNameAnalysisFilter.java:248`` gates applySynonym on
    # useForQuery); index mode emits only rule-attached synonyms
    assert "laptop" not in terms1
