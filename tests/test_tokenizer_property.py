"""Tokenizer invariants over arbitrary text (FIXTURES.md §5 property
tests): offsets within the document and non-decreasing, positions
monotone, increments in {0,1}, eojeol grouping never drops offsets."""

from hypothesis import given, settings
from hypothesis import strategies as st

from mecab_ko_lucene_analyzer_spark.analysis.tokenizer import token_records, tokenize

_ALPHABET = st.sampled_from(
    list("가나다라마바사아자차카타파하은는이가을를 의 abcXYZ059.,!?()-+/&\t\n")
    + ["검색", "엔진", "삼성전자", "노트북", "한다", "했다", "🙂"]
)
texts = st.lists(_ALPHABET, min_size=0, max_size=60).map("".join)


@settings(max_examples=300, deadline=None)
@given(texts, st.sampled_from(["standard", "keyword", "similarity"]))
def test_token_stream_invariants(text, mode):
    lowered = text.lower()
    n = len(lowered)
    recs = token_records(text, mode)
    prev_start = 0
    prev_position = -1
    for r in recs:
        assert 0 <= r["start_offset"] <= r["end_offset"] <= n
        # the emitted term matches its offsets unless it is a derived
        # form (VV/VA tag suffix, XPN merges, decomposed parts share
        # surface chars) — at minimum non-empty and in-bounds
        assert r["end_offset"] > r["start_offset"] or r["term"] == ""
        # positions are a running sum of {0,1} increments
        assert r["position"] in (prev_position, prev_position + 1)
        prev_position = r["position"]
        # start offsets never go backwards across position advances
        if r["position"] > prev_position:
            assert r["start_offset"] >= prev_start
        prev_start = max(prev_start, r["start_offset"])


@settings(max_examples=150, deadline=None)
@given(texts)
def test_tokenize_deterministic(text):
    a = [repr(p) for p in tokenize(text)]
    b = [repr(p) for p in tokenize(text)]
    assert a == b
