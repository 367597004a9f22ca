"""Batch-3 curation/LM operators: Gopher rule flags, bigram LM
scoring, per-doc tf-idf keywords, phrase (did-you-mean) suggester."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from mecab_ko_lucene_analyzer_spark.functions.curation import (
    GOPHER_STOPWORDS,
    bigram_logprob,
    gopher_rules,
)
from mecab_ko_lucene_analyzer_spark.functions.text import tfidf_keywords
from mecab_ko_lucene_analyzer_spark.index.build import InvertedIndex
from mecab_ko_lucene_analyzer_spark.query.expand import phrase_suggest


# ------------------------------------------------------------- gopher


def _gdocs(spark):
    ok = "the data pipeline and cluster have that scan with " + " ".join(
        f"word{i}" for i in range(45)
    )  # 55 words, has >= 2 stopwords, all alpha
    short = "the of tiny"
    symbols = (
        "the of "
        + " ".join(f"w{i}" for i in range(50))
        + " "
        + " ".join("#tag" for _ in range(9))
    )  # 61 words, 9 symbol words -> ratio 0.147 > 0.1
    bullets = "\n".join("• item " + " ".join(f"x{i}" for i in range(10)) for _ in range(5))
    return spark.createDataFrame(
        [(0, ok), (1, short), (2, symbols), (3, bullets)],
        "doc_id long, text string",
    )


def test_gopher_pass_and_named_flags(spark):
    rows = {r["doc_id"]: r for r in gopher_rules(_gdocs(spark)).collect()}
    assert rows[0]["gopher_pass"] is True
    # short doc: word count is the killer, stopword rule is fine
    assert rows[1]["rule_word_count"] is False
    assert rows[1]["gopher_pass"] is False
    # symbol doc: symbol ratio kills it, word count passes
    assert rows[2]["rule_word_count"] is True
    assert rows[2]["rule_symbol_ratio"] is False
    # bullet doc: 100% bullet lines > 90%
    assert rows[3]["rule_bullet_ratio"] is False


def test_gopher_korean_battery_keeps_korean_docs(spark):
    """The default battery is English — a pure-Korean doc fails the
    alpha/stopword rules (the ADVICE silent-corpus-drop bug). With the
    Korean letter class + stopwords it passes; stopwords=[] disables
    the stopword rule entirely."""
    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        GOPHER_LETTERS_UNICODE,
        GOPHER_STOPWORDS_KO,
    )

    # ≥3-char words so the (unparameterized, paper-faithful)
    # mean-word-length rule [3,10] also passes
    ko_words = ["데이터", "처리하기", "분석하는", "문서들의", "검색엔진", "시스템"]
    ko_text = " ".join(
        ["수", "것", *(ko_words[i % len(ko_words)] for i in range(58))]
    )
    docs = spark.createDataFrame(
        [(0, ko_text)], "doc_id long, text string"
    )
    en = gopher_rules(docs).first()
    assert en["rule_alpha_ratio"] is False
    assert en["rule_stopwords"] is False
    assert en["gopher_pass"] is False
    ko = gopher_rules(
        docs,
        letter_pattern=GOPHER_LETTERS_UNICODE,
        stopwords=GOPHER_STOPWORDS_KO,
    ).first()
    assert ko["rule_alpha_ratio"] is True
    assert ko["rule_stopwords"] is True
    assert ko["gopher_pass"] is True
    # empty stopword list = rule off (vacuous pass), not auto-fail
    anylang = gopher_rules(
        docs, letter_pattern=GOPHER_LETTERS_UNICODE, stopwords=[]
    ).first()
    assert anylang["rule_stopwords"] is True


def test_gopher_stopword_rule_needs_two_distinct(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(["the"] * 60)), (1, "the of " + " ".join(f"w{i}" for i in range(58)))],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert rows[0]["rule_stopwords"] is False  # one distinct stopword only
    assert rows[1]["rule_stopwords"] is True
    assert set(GOPHER_STOPWORDS) >= {"the", "of"}


# ------------------------------------------------------------- bigram


def test_bigram_logprob_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    # corpus bigrams: doc0 "a b","b a","a b" + doc1 "a b","b c"
    #   → c(ab)=3, c(ba)=1, c(bc)=1
    # unigrams: a=3, b=3, c=2 → V=3
    # P(b|a) = (c_ab+1)/(c_a+V); c_ab = 3, c_a = 3 → 4/6
    # P(a|b) = (c_ba+1)/(c_b+V); c_ba = 1 → 2/6
    # P(c|b) = (c_bc+1)/(c_b+V); c_bc = 1 → 2/6
    lp_ab, lp_ba, lp_bc = math.log(4 / 6), math.log(2 / 6), math.log(2 / 6)
    assert out[0]["n_bigrams"] == 3
    assert out[0]["avg_logprob"] == pytest.approx(
        round((lp_ab + lp_ba + lp_ab) / 3, 6), abs=1e-9
    )
    assert out[1]["n_bigrams"] == 2
    assert out[1]["avg_logprob"] == pytest.approx(
        round((lp_ab + lp_bc) / 2, 6), abs=1e-9
    )
    assert 2 not in out  # single-token doc emits no row


def test_bigram_penalizes_unseen_transitions(spark):
    # same unigrams, scrambled order → every transition unseen-ish
    docs = spark.createDataFrame(
        [(i, "x y " * 20) for i in range(4)]
        + [(9, "y x " * 20)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob(docs).collect()}
    # doc 9's dominant bigram yx is rare relative to xy
    assert out[9] < out[0]


# -------------------------------------------------------------- tfidf


def test_tfidf_keywords_topk_and_ties(spark):
    postings = spark.createDataFrame(
        [
            ("rare", 1, 3), ("common", 1, 5), ("mid", 1, 3),
            ("common", 2, 1), ("mid", 2, 2),
        ],
        "term string, doc_id long, tf long",
    )
    stats = spark.createDataFrame(
        [("rare", 1), ("mid", 2), ("common", 2)], "term string, df long"
    )
    out = tfidf_keywords(postings, stats, n_docs=2, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    d1 = sorted(by_doc[1])
    # doc1: rare 3·ln2=2.079 > mid 3·ln1=0? n_docs=2: idf(rare)=ln(2/1), idf(mid)=ln(2/2)=0, idf(common)=0
    assert d1[0][1] == "rare"
    assert d1[0][2] == pytest.approx(3 * math.log(2.0))
    # tie at 0 between common and mid → term asc picks 'common'
    assert d1[1][1] == "common"
    assert len(by_doc[1]) == 2  # k cap


# ------------------------------------------------------ phrase_suggest


def _sindex(spark):
    term_stats = spark.createDataFrame(
        [("spark", 50), ("query", 40), ("table", 30), ("stable", 10), ("sort", 20)],
        "term string, df long",
    )
    postings = spark.createDataFrame([], "term string, doc_id long, tf long")
    doc_stats = spark.createDataFrame([], "doc_id long, doc_len long")
    corpus = spark.createDataFrame([(100, 10.0)], "n_docs long, avgdl double")
    return InvertedIndex(postings, term_stats, doc_stats, corpus)


def test_phrase_suggest_corrects_typos_keeps_vocab(spark):
    out = phrase_suggest(
        _sindex(spark), ["spark", "qurey", "tabel"], max_edits=2
    ).collect()
    assert [r["suggestion"] for r in out] == ["spark", "query", "table"]
    assert out[0]["dist"] == 0  # in-vocab keeps itself
    # plain Levenshtein (no transposition op): both typos are 2 edits
    assert out[1]["dist"] == 2 and out[2]["dist"] == 2
    assert [r["pos"] for r in out] == [0, 1, 2]


def test_phrase_suggest_df_breaks_distance_ties(spark):
    # 'tible' is dist-1 from 'table'(30); 'stable' is dist 2 → table wins
    out = phrase_suggest(_sindex(spark), ["tible"]).collect()
    assert out[0]["suggestion"] == "table"


def test_phrase_suggest_no_candidate_falls_back(spark):
    out = phrase_suggest(_sindex(spark), ["zzzzzzzzzz"]).collect()
    assert out[0]["suggestion"] == "zzzzzzzzzz"
    assert out[0]["dist"] is None and out[0]["df"] is None


# ------------------------------------------------- curate pipeline stages


def test_curate_gopher_and_lm_stages(spark):
    """jobs/curate.py composes the Gopher battery and the bigram-LM
    floor: a passing doc survives both, a word-count failure dies at
    the battery, a too-short doc dies at the LM cut."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str((Path("jobs")).resolve().parent / "jobs"))
    from curate import curate

    good = "the data pipeline and cluster have that scan with " + " ".join(
        f"w{i}" for i in range(45)
    )
    rows = [
        (0, good, "en"),
        (1, "the of too short", "en"),  # fails gopher word count
        (2, "solo", "en"),  # <2 tokens: unscorable by the LM
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    counts: dict = {}
    out = curate(
        docs,
        dedup="exact",
        gopher=True,
        gopher_lang="en",
        gopher_counts=counts,
        min_bigram_logprob=-20.0,
    )
    assert [r["doc_id"] for r in out.collect()] == [0]
    # per-rule kill counters (r5 verdict ask #5): docs 1 and 2 both
    # fail the word-count rule; the summary dict carries every rule
    assert counts["rule_word_count"] == 2
    assert counts["gopher_pass"] == 2  # total killed
    # LM floor alone: doc 1 survives (no gopher), doc 2 still dies
    out2 = curate(docs, dedup="exact", min_bigram_logprob=-20.0)
    assert sorted(r["doc_id"] for r in out2.collect()) == [0, 1]
    # --gopher without an explicit language must ERROR, not silently
    # apply the English battery (it drops every pure-Korean doc)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gopher_lang"):
        curate(docs, dedup="exact", gopher=True).collect()


# ---------------------------------------------------------------- DSIR


def test_dsir_logratio_prefers_target_like_docs(spark):
    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        dsir_logratio,
    )

    raw = spark.createDataFrame(
        [
            (0, "wiki article about physics and math"),
            (1, "buy cheap pills online now discount"),
            (2, "wiki article about biology and math"),
            (3, "click here buy now cheap discount offer"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [
            (100, "wiki article about chemistry and math"),
            (101, "wiki article about history and physics"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dsir_logratio(raw, target, dim=512).collect()}
    assert set(out) == {0, 1, 2, 3}
    # wiki-like docs outscore spam under the target LM
    assert out[0]["logratio"] > out[1]["logratio"]
    assert out[2]["logratio"] > out[3]["logratio"]
    # n_feats = unigrams + bigrams = 6 + 5 = 11 for 6-word docs
    assert out[0]["n_feats"] == 11


def test_dsir_logratio_hand_computed_single_word(spark):
    import math

    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        dsir_logratio,
    )
    from mecab_ko_lucene_analyzer_spark.functions.hashing import md5_h64

    raw = spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "alpha")], "doc_id long, text string")
    dim = 64
    out = {
        r["doc_id"]: r["logratio"]
        for r in dsir_logratio(raw, target, dim=dim).collect()
    }
    # raw totals: 2 features; target totals: 1 feature
    # alpha: ct=1, cr=1 → ln(2/(1+64)) − ln(2/(2+64))
    # beta:  ct=0, cr=1 → ln(1/65) − ln(2/66)
    want_alpha = math.log(2 / 65) - math.log(2 / 66)
    want_beta = math.log(1 / 65) - math.log(2 / 66)
    # hash collision between 'alpha' and 'beta' buckets would break the
    # hand computation — assert they differ first
    b = {
        r["t"]: r["b"]
        for r in spark.createDataFrame(
            [("alpha",), ("beta",)], "t string"
        )
        .select("t", (md5_h64(F.col("t")) % dim).alias("b"))
        .collect()
    }
    assert b["alpha"] != b["beta"]
    assert out[0] == pytest.approx(want_alpha, abs=1e-12)
    assert out[1] == pytest.approx(want_beta, abs=1e-12)


def test_dsir_gumbel_topk_deterministic_and_weight_sensitive(spark):
    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        dsir_gumbel_topk,
    )

    scores = spark.createDataFrame(
        [(i, 0.0 if i < 50 else 10.0) for i in range(60)],
        "doc_id long, logratio double",
    )
    a = dsir_gumbel_topk(scores, k=10, seed=1).collect()
    b = dsir_gumbel_topk(scores, k=10, seed=1).collect()
    assert [(r["doc_id"], r["sample_key"]) for r in a] == [
        (r["doc_id"], r["sample_key"]) for r in b
    ]  # retry-stable
    # +10 nats importance dominates Gumbel noise almost surely: the
    # sample is (nearly) all heavy docs
    heavy = sum(1 for r in a if r["doc_id"] >= 50)
    assert heavy == 10
    # different seed → different perturbation (keys change)
    c = dsir_gumbel_topk(scores, k=10, seed=2).collect()
    assert [r["sample_key"] for r in a] != [r["sample_key"] for r in c]


def test_curate_dsir_stage(spark):
    """curate(dsir_target=..., dsir_keep=k) keeps exactly k docs, and
    the heavy-importance (target-like) docs win."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str((Path("jobs")).resolve().parent / "jobs"))
    from curate import curate

    raw = spark.createDataFrame(
        [
            (0, "wiki article physics math science", "en"),
            (1, "buy cheap pills online now", "en"),
            (2, "wiki article biology math science", "en"),
            (3, "click buy now cheap offer", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    target = spark.createDataFrame(
        [(9, "wiki article chemistry math science", "en")],
        "doc_id long, text string, lang string",
    )
    out = curate(
        raw, dedup="exact", dsir_target=target, dsir_keep=2, dsir_dim=512
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    assert len(kept) == 2
    assert set(kept) <= {0, 2}  # the wiki-like docs dominate


# ------------------------------------------------------------ naive bayes


def test_nb_quality_scores_hand_model(spark):
    """Hand-replay of the multinomial-NB log-odds on a 4-doc corpus:
    positives say 'good', negatives say 'spam'; an unlabeled doc mixing
    both scores between them; unseen buckets take the OOV weight."""
    import math

    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        nb_quality_scores,
    )
    from mecab_ko_lucene_analyzer_spark.functions.hashing import md5_h64

    DIM = 64
    docs = spark.createDataFrame(
        [
            (0, "good text here"),
            (1, "good stuff here"),
            (2, "spam junk"),
            (3, "good spam mix"),  # unlabeled — scored by the model only
        ],
        "doc_id long, text string",
    )
    labels = spark.createDataFrame(
        [(0, True), (1, True), (2, False)], "doc_id long, label boolean"
    )
    out = {
        r["doc_id"]: r
        for r in nb_quality_scores(docs, labels, dim=DIM).collect()
    }
    # replay: features = unigrams + bigrams, bucket = md5h64 % DIM
    import pyspark.sql.functions as F

    def feats(s):
        ws = s.split()
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    bucket_of = {}
    allf = sorted({f for _, s in [(0, "good text here"), (1, "good stuff here"), (2, "spam junk"), (3, "good spam mix")] for f in feats(s)})
    rows = spark.createDataFrame([(f,) for f in allf], "f string").select(
        "f", (md5_h64(F.col("f")) % DIM).alias("b")
    ).collect()
    bucket_of = {r["f"]: r["b"] for r in rows}
    texts = {0: "good text here", 1: "good stuff here", 2: "spam junk", 3: "good spam mix"}
    cp, cn = {}, {}
    for d, lab in [(0, True), (1, True), (2, False)]:
        for f in feats(texts[d]):
            (cp if lab else cn)[bucket_of[f]] = (cp if lab else cn).get(bucket_of[f], 0) + 1
    tp, tn = sum(cp.values()), sum(cn.values())
    bias = math.log(2) - math.log(1)

    def w(b):
        return math.log((cp.get(b, 0) + 1) / (tp + DIM)) - math.log(
            (cn.get(b, 0) + 1) / (tn + DIM)
        )

    for d in range(4):
        fs = feats(texts[d])
        want = bias + sum(w(bucket_of[f]) for f in fs)
        assert out[d]["n_feats"] == len(fs)
        assert out[d]["nb_score"] == pytest.approx(want, abs=1e-9), d
    assert out[0]["nb_score"] > 0 > out[2]["nb_score"]
    assert out[2]["nb_score"] < out[3]["nb_score"] < out[0]["nb_score"]


def test_nb_quality_requires_both_classes(spark):
    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        nb_quality_scores,
    )

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "c d")], "doc_id long, text string"
    )
    one_class = spark.createDataFrame(
        [(0, True), (1, True)], "doc_id long, label boolean"
    )
    with pytest.raises(ValueError, match="BOTH classes"):
        nb_quality_scores(docs, one_class)
    with pytest.raises(ValueError, match="alpha"):
        nb_quality_scores(docs, one_class, alpha=0.0)
