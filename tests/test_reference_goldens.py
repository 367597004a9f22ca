"""Reference-replica goldens: the fallback Viterbi chain reproduces the
token streams that ``MeCabKoStandardTokenizerTest.java:85-204`` asserts
against live mecab-ko-dic, token-for-token across every asserted field
(term, type, pos tag, semantic class, posIncr, posLen, offsets).

The reference's expectations are its published ground truth for the
whole chain (lattice → appender → compound decomposition → EOJEOL/
INFLECT emission). The mini-dictionary carries the same analyses for
the covered vocabulary (e.g. 형태소 = Compound 형태+소, 미근동 = NNP
Compound 미근/지명+동), so a match here evidences tier-2 fidelity
without the native dictionary: same input → same stream, not just the
same downstream machinery (which the mocked-lattice tier already
locks). The env-gated live tier (test_mecab_live.py) asserts the same
strings against real mecab when present.
"""

from mecab_ko_lucene_analyzer_spark.analysis.tokenizer import token_records

NO_DECOMPOUND = 9999


def stream(text, mlen=3):
    """token_records rendered in the reference's tokenizerToString field
    order: term:type:pos:semanticClass:posIncr:posLen:start:end."""
    recs = token_records(text, compound_noun_min_length=mlen)
    out = []
    prev_pos = 0
    first = True
    for r in recs:
        incr = r["position"] - prev_pos if not first else 1 + r["position"]
        # token_records carries absolute positions; the reference prints
        # increments. Recompute exactly as Lucene does.
        out.append(
            f"{r['term']}:{r['type']}:{r['pos'] or 'null'}:{r['semantic_class'] or 'null'}:"
            f"{incr}:{r['pos_len']}:{r['start_offset']}:{r['end_offset']}"
        )
        prev_pos = r["position"]
        first = False
    return ",".join(out) + ("," if out else "")


def test_empty_query():  # MeCabKoStandardTokenizerTest.java:86
    assert stream("") == ""


def test_empty_morphemes():  # :94 — symbol-only input emits nothing
    assert stream("!@#$%^&*") == ""


def test_semantic_class_sentence():  # :104
    assert stream("이승기 미근동", 2) == (
        "이승기:NNP:NNP:인명:1:1:0:3,미근:NNP:NNP:지명:1:1:4:6,"
        "미근동:COMPOUND:null:null:0:2:4:7,동:NNG:NNG:null:1:1:6:7,"
    )


def test_short_sentence():  # :115
    assert stream("꽃배달 꽃망울 오토바이", 2) == (
        "꽃:NNG:NNG:null:1:1:0:1,배달:NNG:NNG:null:1:1:1:3,"
        "꽃:NNG:NNG:null:1:1:4:5,꽃망울:COMPOUND:null:null:0:2:4:7,"
        "망울:NNG:NNG:null:1:1:5:7,오토바이:NNG:NNG:null:1:1:8:12,"
    )


def test_short_sentence_inflect():  # :126 — EOJEOL + original-form 피/VV
    assert stream("소설 무궁화꽃이 피었습니다.") == (
        "소설:NNG:NNG:null:1:1:0:2,무궁:NNG:NNG:null:1:1:3:5,"
        "무궁화:COMPOUND:null:null:0:2:3:6,화:NNG:NNG:null:1:1:5:6,"
        "꽃이:EOJEOL:NNG+JKS:null:1:1:6:8,꽃:NNG:NNG:null:0:1:6:7,"
        "피었습니다:EOJEOL:VV+EP+EF:null:1:1:9:14,피/VV:VV:VV:null:0:1:9:10,"
    )


def test_han_english():  # :160
    assert stream("한글win") == "한글:NNG:NNG:null:1:1:0:2,win:SL:SL:null:1:1:2:5,"


def test_danawa_simple_sentence():
    """MeCabKoTest.java:60-66 — the danawa-layer tokenizer test's
    published stream (comment golden): whole-word NNP beside a
    decomposed compound at compoundNounMinLength=3."""
    assert stream("학생용 핸드폰", 3) == (
        "학생용:NNP:NNP:null:1:1:0:3,핸드:NNG:NNG:null:1:1:4:6,"
        "핸드폰:COMPOUND:null:null:0:2:4:7,폰:NNG:NNG:null:1:1:6:7,"
    )


def test_decompound():  # :171
    assert stream("형태소") == (
        "형태:NNG:NNG:null:1:1:0:2,형태소:COMPOUND:null:null:0:2:0:3,"
        "소:NNG:NNG:null:1:1:2:3,"
    )
    assert stream("가고문헌") == (
        "가고:NNG:NNG:null:1:1:0:2,가고문헌:COMPOUND:null:null:0:2:0:4,"
        "문헌:NNG:NNG:null:1:1:2:4,"
    )


def test_no_decompound():  # :191
    assert stream("형태소", NO_DECOMPOUND) == "형태소:COMPOUND:NNG:null:1:2:0:3,"
    assert stream("가고문헌", NO_DECOMPOUND) == "가고문헌:COMPOUND:NNG:null:1:2:0:4,"


def test_preanalysis_sentence():  # :207 — Preanalysis split + copula Inflect
    assert stream("은전한닢 프로젝트는 오픈소스이다.") == (
        "은전:NNG:NNG:null:1:1:0:2,한:NR:NR:null:1:1:2:3,닢:NNG:NNG:null:1:1:3:4,"
        "프로젝트는:EOJEOL:NNG+JX:null:1:1:5:10,프로젝트:NNG:NNG:null:0:1:5:9,"
        "오픈:NNG:NNG:null:1:1:11:13,소스이다:EOJEOL:NNG+VCP+EF:null:1:1:13:17,"
        "소스:NNG:NNG:null:0:1:13:15,"
    )


def test_unknown_surface():  # :221 — 는 homograph resolved to ETM after VA
    assert stream("걀꿀 없는 단어") == (
        "걀꿀:UNKNOWN:UNKNOWN:null:1:1:0:2,없는:EOJEOL:VA+ETM:null:1:1:3:5,"
        "없/VA:VA:VA:null:0:1:3:4,단어:NNG:NNG:null:1:1:6:8,"
    )
