"""Integration tier (FIXTURES.md §F3 analog): full ``tokenize()`` golden
outputs under the pinned dictionary segmenter, locking the fallback
provider's behavior; plus the documented offset-semantics caveat
(code points vs Java's UTF-16 units, SURVEY §1.5)."""

import pytest

from mecab_ko_lucene_analyzer_spark.analysis.tokenizer import (
    DictionaryLatticeProvider,
    token_records,
    tokenize,
)


def tok_strings(text, **kw):
    return [repr(p) for p in tokenize(text, **kw)]


def test_golden_standard_sentence():
    # 검색엔진 is a Compound dict entry → decompound + EOJEOL emission
    assert tok_strings("검색엔진은 한국어 문서를 처리한다.") == [
        "검색/NNG/null/1/1/0/2",
        "검색엔진은/EOJEOL/null/0/2/0/5",
        "검색엔진/COMPOUND/null/0/2/0/4",
        "엔진/NNG/null/1/1/2/4",
        "한국어/NNG/null/1/1/6/9",
        "문서를/EOJEOL/null/1/1/10/13",
        "문서/NNG/null/0/1/10/12",
        "처리/NNG/null/1/1/14/16",
        # 한다 is a contracted conjugation (하+ㄴ다, surface not in the
        # dict). The Viterbi lattice parses it as unknown stem + known
        # ending (한/UNKNOWN + 다/EF) — the path real unknown verbs take;
        # round 1's greedy matcher left the whole eojeol opaque.
        "한/UNKNOWN/null/1/1/16/17",
        "다/E/null/1/1/17/18",
    ]


def test_golden_mixed_alpha_number():
    assert tok_strings("spark 3 데이터") == [
        "spark/SL/null/1/1/0/5",
        "3/SN/null/1/1/6/7",
        "데이터/NNG/null/1/1/8/11",
    ]


def test_golden_unknown_run():
    # unknown hangul stays one UNKNOWN token (nominal assumption)
    out = tok_strings("걀꿀뷁")
    assert out == ["걀꿀뷁/UNKNOWN/null/1/1/0/3"]


def test_lowercasing_applies():
    # S1: tokenizer lowercases before the lattice (Java toLowerCase)
    recs = token_records("SPARK 검색")
    assert recs[0]["term"] == "spark"


def test_josa_split_with_positions():
    recs = token_records("검색은 데이터다.")
    terms = [(r["term"], r["position"]) for r in recs]
    # eojeol token shares position with its content token
    assert ("검색은", 0) in terms and ("검색", 0) in terms


def test_offset_semantics_code_points():
    """Offsets are Python code-point indices. Java's char offsets are
    UTF-16 units; they coincide for BMP (all Korean) text — asserted —
    and diverge for astral chars, where the code-point convention is
    the documented behavior."""
    recs = token_records("검색 엔진")
    by_term = {r["term"]: r for r in recs}
    assert (by_term["검색"]["start_offset"], by_term["검색"]["end_offset"]) == (0, 2)
    assert (by_term["엔진"]["start_offset"], by_term["엔진"]["end_offset"]) == (3, 5)
    # astral char (surrogate pair in UTF-16) before a token: code-point
    # offsets count it as ONE char
    recs = token_records("\U0001F600 검색")
    srch = next(r for r in recs if r["term"] == "검색")
    assert srch["start_offset"] == 2  # would be 3 in UTF-16 units


def test_custom_provider_dictionaries():
    provider = DictionaryLatticeProvider(
        stems={"커스텀": "NNG,*,T,커스텀,*,*,*,*"},
        suffixes={"은": "JX,*,T,은,*,*,*,*"},
    )
    out = [repr(p) for p in tokenize("커스텀은", provider=provider)]
    assert out == ["커스텀은/EOJEOL/null/1/1/0/4", "커스텀/NNG/null/0/1/0/3"]


def test_chunk_cache_is_provider_scoped():
    """Two providers with different dictionaries in one process must not
    serve each other's cached chunk streams (the module-level caches are
    keyed on a per-instance cache_token — dictionary recompile /
    hot-reload creates a new provider and thus a fresh namespace)."""
    from mecab_ko_lucene_analyzer_spark.analysis.tokenizer import (
        index_token_stream,
    )

    p1 = DictionaryLatticeProvider(
        stems={"커스텀": "NNG,*,T,커스텀,*,*,*,*"},
        suffixes={"은": "JX,*,T,은,*,*,*,*"},
    )
    # p1 splits 커스텀은 → prime both caches with p1's result
    assert [p.surface for p in tokenize("커스텀은", provider=p1)][1] == "커스텀"
    t1, _ = index_token_stream("커스텀은", provider=p1)
    # p2 knows the WHOLE eojeol as one noun — a cache hit from p1 would
    # return the split stream instead
    p2 = DictionaryLatticeProvider(
        stems={"커스텀은": "NNG,*,T,커스텀은,*,*,*,*"}, suffixes={}
    )
    toks2 = tokenize("커스텀은", provider=p2)
    assert [p.surface for p in toks2] == ["커스텀은"]
    t2, _ = index_token_stream("커스텀은", provider=p2)
    assert t1 != t2 and t2 == ["커스텀은"]
    # and p1's cache entry is still intact (no cross-eviction)
    assert [p.surface for p in tokenize("커스텀은", provider=p1)][1] == "커스텀"


def test_custom_provider_cache_token_assigned_not_id():
    """A cache-capable provider without a cache_token gets a
    process-unique one ASSIGNED on first use (id() recycles after GC
    and could alias a dead provider's cached streams); unsettable
    providers draw fresh tokens each call — caching disabled, never
    stale."""
    from mecab_ko_lucene_analyzer_spark.analysis.tokenizer import (
        _provider_cache_token,
        get_lattice_provider,
    )

    class P:
        supports_chunk_cache = True

    p = P()
    t1 = _provider_cache_token(p)
    assert p.cache_token == t1
    assert _provider_cache_token(p) == t1  # stable once assigned
    assert _provider_cache_token(P()) != t1  # distinct per provider

    class Frozen:
        __slots__ = ("supports_chunk_cache",)

    f = Frozen()
    # unsettable → None: caching disabled outright. (A fresh token per
    # call would WRITE unreachable entries, repeatedly filling and
    # bulk-clearing the shared cache — wiping other providers' warm
    # entries.)
    assert _provider_cache_token(f) is None
    assert _provider_cache_token(f) is None
    # the bundled provider keeps its constructor-assigned token
    prov = get_lattice_provider()
    assert _provider_cache_token(prov) == prov.cache_token


def test_unsettable_provider_never_writes_shared_caches():
    """A slots/frozen chunk-cache-capable provider must not leave any
    entries in the shared chunk/stream caches (nor read stale ones) —
    it falls back to the uncached parse path."""
    from mecab_ko_lucene_analyzer_spark.analysis import tokenizer as tok_mod
    from mecab_ko_lucene_analyzer_spark.analysis.tokenizer import (
        index_token_stream,
    )

    base = DictionaryLatticeProvider(
        stems={"커스텀": "NNG,*,T,커스텀,*,*,*,*"},
        suffixes={"은": "JX,*,T,은,*,*,*,*"},
    )

    class Frozen:
        __slots__ = ()
        supports_chunk_cache = True

        def parse(self, text):
            return base.parse(text)

    f = Frozen()
    before_chunk = dict(tok_mod._CHUNK_CACHE)
    before_stream = dict(tok_mod._INDEX_STREAM_CACHE)
    toks = tokenize("커스텀은", provider=f)
    assert [p.surface for p in toks][1] == "커스텀"
    terms, _ = index_token_stream("커스텀은", provider=f)
    assert terms  # the fallback path still tokenizes correctly
    assert tok_mod._CHUNK_CACHE == before_chunk
    assert tok_mod._INDEX_STREAM_CACHE == before_stream
