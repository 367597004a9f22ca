"""Unit tests for the curation operators (repetition stats, domain
stats, PII redaction) — edge cases the sf-table oracles can't reach:
empty/single-token docs, all-duplicate docs, PII at string boundaries,
placeholder non-interference between redaction passes."""

from __future__ import annotations

import pytest

from mecab_ko_lucene_analyzer_spark.functions.curation import (
    domain_stats,
    pii_redact,
    repetition_filter,
    repetition_stats,
    scrub_pii,
    span_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def rep(spark):
    df = _docs(
        spark,
        [
            (0, "a b a b c", "s0"),  # dup tokens + one dup bigram
            (1, "x", "s0"),  # single token: no grams
            (2, "", "s0"),  # empty: all stats 0.0
            (3, "z z z z", "s1"),  # fully repeated
            (4, "u v w", "s1"),  # all distinct
        ],
    )
    return {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}


def test_repetition_dup_fractions(rep):
    # "a b a b c": 5 tokens, 3 distinct -> 0.4; grams [ab, ba, ab, bc]:
    # 4 grams, 3 distinct -> 0.25; top token count 2/5
    assert rep[0] == {
        "doc_id": 0,
        "n_tokens": 5,
        "dup_token_frac": 0.4,
        "dup_bigram_frac": 0.25,
        "top_token_frac": 0.4,
    }


def test_repetition_degenerate_docs(rep):
    # single token: one run of 1, no bigrams
    assert rep[1]["dup_token_frac"] == 0.0
    assert rep[1]["dup_bigram_frac"] == 0.0
    assert rep[1]["top_token_frac"] == 1.0
    # empty text: split('', ' ') -> [''] filtered to [] -> all zeros,
    # never NULL and never a divide-by-zero
    assert rep[2] == {
        "doc_id": 2,
        "n_tokens": 0,
        "dup_token_frac": 0.0,
        "dup_bigram_frac": 0.0,
        "top_token_frac": 0.0,
    }


def test_repetition_extremes(rep):
    assert rep[3]["dup_token_frac"] == 0.75
    assert rep[3]["dup_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert rep[3]["top_token_frac"] == 1.0
    assert rep[4]["dup_token_frac"] == 0.0
    assert rep[4]["top_token_frac"] == pytest.approx(1 / 3, abs=1e-6)


def test_domain_stats(spark):
    df = _docs(
        spark,
        [
            (0, "a b", "long.example"),
            (1, "c" * 200, "long.example"),
            (2, "d e f", "short.example"),
        ],
    )
    rows = {r["domain"]: r.asDict() for r in domain_stats(df).collect()}
    assert rows["long.example"]["n_docs"] == 2
    assert rows["long.example"]["total_chars"] == 203
    assert rows["long.example"]["avg_chars"] == 101.5
    assert rows["long.example"]["avg_tokens"] == 1.5
    assert rows["long.example"]["n_short"] == 1  # "a b" only
    assert rows["short.example"]["n_docs"] == 1
    assert rows["short.example"]["n_short"] == 1


def test_domain_stats_mega_host_partial_aggregation(spark):
    """Round-5 skew guard: a planted mega-host (50k docs on one
    domain, crossing many input partitions) is handled by MAP-SIDE
    partial aggregation — the shuffle carries one row per (partition,
    domain), so a single host can never exceed a partition. Pinned:
    exact values under skew + the partial_ HashAggregate pair in the
    plan (one Exchange only)."""
    import re as _re

    import pyspark.sql.functions as F

    n_mega, n_rest = 50_000, 500
    df = (
        spark.range(n_mega + n_rest, numPartitions=16)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc text nr "), F.col("id")).alias("text"),
            F.when(F.col("id") < n_mega, F.lit("mega.example"))
            .otherwise(
                F.concat(F.lit("h"), (F.col("id") % 97).cast("string"))
            )
            .alias("source"),
        )
    )
    out = domain_stats(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    nodes = _re.findall(r"\(\d+\) ([A-Za-z][A-Za-z0-9_]*)", plan)
    assert nodes.count("Exchange") == 1
    assert "partial_count" in plan  # map-side combine before the shuffle
    rows = {r["domain"]: r.asDict() for r in out.collect()}
    assert rows["mega.example"]["n_docs"] == n_mega
    assert len(rows) == 1 + 97


def test_cap_per_host_exact_and_deterministic(spark):
    """cap_per_host keeps exactly the cap smallest (hash, id) docs of
    each over-cap host, everything from under-cap hosts, and the SAME
    set under precut on/off and different partitionings."""
    import pyspark.sql.functions as F

    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        cap_per_host,
    )
    from mecab_ko_lucene_analyzer_spark.functions.hashing import md5_h64

    n = 300
    docs = spark.range(n, numPartitions=7).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://h"),
            # host 0 gets half the corpus (over cap); 9 others small
            F.when(F.col("id") % 2 == 0, F.lit("0"))
            .otherwise((F.col("id") % 9 + 1).cast("string")),
            F.lit(".example/p"),
            F.col("id").cast("string"),
        ).alias("url"),
        F.lit("text body").alias("text"),
    )
    cap = 10
    kept = cap_per_host(docs, cap)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    # reference: rank by the same hash law in-driver
    rows = docs.select(
        "doc_id",
        F.regexp_extract("url", r"https://(h\d+)\.", 1).alias("host"),
        md5_h64(
            F.concat(F.lit("hostcap-42-"), F.col("doc_id").cast("string"))
        ).alias("h"),
    ).collect()
    byhost: dict = {}
    for r in rows:
        byhost.setdefault(r["host"], []).append((r["h"], r["doc_id"]))
    want = []
    for hst, lst in byhost.items():
        lst.sort()
        keep = lst if len(lst) <= cap else lst[:cap]
        want += [d for _, d in keep]
    assert ids == sorted(want)
    # per-host counts: over-cap host trimmed to cap, others intact
    counts = {
        r["host"]: r["c"]
        for r in kept.select(
            F.regexp_extract("url", r"https://(h\d+)\.", 1).alias("host")
        )
        .groupBy("host")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert counts["h0"] == cap
    assert all(v <= cap for v in counts.values())
    # precut off and a different partitioning select the SAME ids
    ids2 = sorted(
        r["doc_id"]
        for r in cap_per_host(docs.repartition(3), cap, precut=False)
        .select("doc_id")
        .collect()
    )
    assert ids2 == ids
    # columns unchanged
    assert kept.columns == docs.columns


def test_cap_per_host_under_cap_is_identity_and_validates(spark):
    import pyspark.sql.functions as F

    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        cap_per_host,
    )

    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://h"), (F.col("id") % 10).cast("string"), F.lit(".x/p")
        ).alias("url"),
    )
    assert cap_per_host(docs, 5).count() == 20  # 2 docs/host, all kept
    with pytest.raises(ValueError, match="cap"):
        cap_per_host(docs, 0)


def test_cap_per_host_corpus_bulk_never_shuffles(spark):
    """Plan pin: the under-cap bulk of the corpus passes through on a
    broadcast anti join — the window/semi-join machinery only ever
    sees the over-cap slice. No CartesianProduct, no row-at-a-time
    Python; the over-host relation reaches its joins via broadcast."""
    import re as _re

    import pyspark.sql.functions as F

    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        cap_per_host,
    )

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://h"), (F.col("id") % 5).cast("string"), F.lit(".x/p"),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    out = cap_per_host(docs, 10)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    nodes = _re.findall(r"\(\d+\) ([A-Za-z][A-Za-z0-9_]*)", plan)
    assert "CartesianProduct" not in nodes
    assert "BatchEvalPython" not in nodes
    assert nodes.count("BroadcastExchange") >= 2  # anti + semi host joins
    """domain_stats accepts a host EXPRESSION over the (url, warc_ts,
    html, text, lang) corpus shape — the CC-scale usage."""
    from mecab_ko_lucene_analyzer_spark.functions.curation import host_of
    from mecab_ko_lucene_analyzer_spark.sources import synthesize_webpages

    pages = synthesize_webpages(spark, 40, partitions=2)
    rows = domain_stats(pages, domain=host_of("url")).collect()
    # synthetic urls are one host per page -> 40 singleton domains
    assert len(rows) == 40
    assert all(r["n_docs"] == 1 for r in rows)
    assert all(r["domain"].startswith("example-") for r in rows)
    assert all(r["domain"].endswith(".kr") for r in rows)


def test_pii_counts_and_redaction(spark):
    df = _docs(
        spark,
        [
            (0, "mail a.user+tag@sub.example.co and b@c.io today", "s"),
            (1, "call 010-1234-5678 or 02-123-4567 now", "s"),
            (2, "hosts 10.0.0.1 and 192.168.200.254", "s"),
            (3, "clean text only", "s"),
            (4, "x@y.com 1.2.3.4 010-1111-2222", "s"),  # all three
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert (rows[0]["n_emails"], rows[0]["n_phones"], rows[0]["n_ips"]) == (2, 0, 0)
    assert rows[0]["redacted"] == "mail [EMAIL] and [EMAIL] today"
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ips"]) == (0, 2, 0)
    assert rows[1]["redacted"] == "call [PHONE] or [PHONE] now"
    assert rows[2]["redacted"] == "hosts [IP] and [IP]"
    assert rows[3]["redacted"] == "clean text only"
    assert (rows[4]["n_emails"], rows[4]["n_phones"], rows[4]["n_ips"]) == (1, 1, 1)
    assert rows[4]["redacted"] == "[EMAIL] [IP] [PHONE]"


def test_pii_boundaries_and_non_interference(spark):
    df = _docs(
        spark,
        [
            # PII at the very start and end of the string (\b at edges)
            (0, "a@b.co", "s"),
            (1, "10.0.0.1", "s"),
            # a phone-shaped run INSIDE a longer digit run must not
            # match (\b guards), and an email containing digits+dots in
            # the local part must not leak an IP match after redaction
            (2, "9010-1234-56789 and 1.2.3.4x", "s"),
            (3, "v1.2.3.4@example.org", "s"),
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert rows[0]["redacted"] == "[EMAIL]"
    assert rows[1]["redacted"] == "[IP]"
    assert (rows[2]["n_phones"], rows[2]["n_ips"]) == (0, 0)
    assert rows[2]["redacted"] == "9010-1234-56789 and 1.2.3.4x"
    # email pass runs first and consumes the whole address; the IP pass
    # then sees only the placeholder
    assert rows[3]["n_emails"] == 1
    assert rows[3]["redacted"] == "[EMAIL]"


def test_pii_counts_equal_replacements_on_overlap(spark):
    """Each count is taken on the text state its replacement sees, so
    counts always equal placeholders emitted — even when an earlier
    pass consumes part of a later pass's would-be match."""
    df = _docs(spark, [(0, "server 10.0.0.12-345-6789 up", "s")])
    row = pii_redact(df).collect()[0]
    # the IP pass consumes 10.0.0.12; the leftover '-345-6789' is not a
    # phone, and n_phones agrees (raw-text counting would claim 1
    # phone while redacting none)
    assert (row["n_emails"], row["n_phones"], row["n_ips"]) == (0, 0, 1)
    assert row["redacted"] == "server [IP]-345-6789 up"


def test_repetition_filter_keeps_columns(spark):
    df = _docs(
        spark,
        [
            (0, "a a a a a a b", "s"),  # dup_token_frac 5/7 ~ 0.714
            (1, "q w e r t y u", "s"),  # all distinct
        ],
    )
    kept = repetition_filter(df, max_dup_token_frac=0.5).collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert set(kept[0].asDict()) == {"doc_id", "text", "source"}
    # no threshold -> pass-through
    assert repetition_filter(df).count() == 2


def test_scrub_pii_inplace(spark):
    df = _docs(spark, [(0, "mail a@b.co now", "s")])
    row = scrub_pii(df).collect()[0]
    assert row["text"] == "mail [EMAIL] now"
    assert set(row.asDict()) == {"doc_id", "text", "source"}


def test_span_dedup(spark):
    # window=2 spans: doc0 [ab, cd, e]; doc1 [ab, xy] (ab duplicates
    # doc0's); doc2 [ab, cd, e] (fully duplicated); doc3 empty
    df = _docs(
        spark,
        [
            (0, "a b c d e", "s"),
            (1, "a b x y", "s"),
            (2, "a b c d e", "s"),
            (3, "", "s"),
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in span_dedup(df, window=2).collect()}
    assert rows[0] == {
        "doc_id": 0,
        "clean_text": "a b c d e",
        "n_spans_kept": 3,
        "n_spans_removed": 0,
    }
    assert rows[1] == {
        "doc_id": 1,
        "clean_text": "x y",
        "n_spans_kept": 1,
        "n_spans_removed": 1,
    }
    # full duplicate loses everything but keeps its row
    assert rows[2]["clean_text"] == ""
    assert rows[2]["n_spans_removed"] == 3
    assert rows[3] == {
        "doc_id": 3,
        "clean_text": "",
        "n_spans_kept": 0,
        "n_spans_removed": 0,
    }


def test_curate_post_dedup_stages(spark):
    """The curate job's optional stages compose: span dedup rewrites
    text and drops fully-boilerplate docs, the repetition threshold
    drops loopy docs, and the scrub redacts what remains."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str((Path("jobs")).resolve().parent / "jobs"))
    from curate import curate

    rows = [
        # unique 12-token doc with an email to scrub
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "mail a@b.co", "en"),
        # shares doc 0's first 10-token span, plus its own unique tail
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "unique tail here", "en"),
        # pure repetition: survives span dedup (unique span), dies at
        # the repetition threshold
        (2, "loop loop loop loop loop loop loop loop loop once", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    curated = curate(
        docs,
        dedup="exact",
        span_window=10,
        max_dup_token_frac=0.5,
        scrub=True,
    )
    assert curated.columns == docs.columns  # "same columns", same order
    out = {r["doc_id"]: r["text"] for r in curated.collect()}
    assert set(out) == {0, 1}
    assert out[0].endswith("mail [EMAIL]")
    # doc 1 lost its duplicated leading span, kept its unique tail
    assert out[1] == "unique tail here"
    # decontamination stage: an eval doc sharing doc 1's tail 3-gram
    # knocks doc 1 out of the curated set
    ev = spark.createDataFrame(
        [(999, "the unique tail here phrase", "en")],
        "doc_id long, text string, lang string",
    )
    kept = {
        r["doc_id"]
        for r in curate(
            docs, dedup="exact", eval_docs=ev, decontam_n=3
        ).collect()
    }
    assert 1 not in kept and 0 in kept


def test_curate_normalize_makes_recrawls_exact_dupes(spark):
    """With --normalize, an NFD re-crawl of an NFC page becomes a
    byte-identical duplicate and the exact stage collapses the pair;
    without it both survive (the motivating under-merge)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str((Path("jobs")).resolve().parent / "jobs"))
    from curate import curate

    rows = [
        (0, "café menu", "en"),          # composed
        (1, "café menu", "en"),         # decomposed re-crawl
        (2, "unrelated page text", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    plain = {r["doc_id"] for r in curate(docs, dedup="exact").collect()}
    assert plain == {0, 1, 2}
    normed = {
        r["doc_id"]
        for r in curate(docs, dedup="exact", normalize=True).collect()
    }
    assert normed == {0, 2}


def test_curate_span_stage_keeps_originally_empty_docs(spark):
    """Docs with no tokens at all pass through the span stage (nothing
    was removed from them); only docs emptied BY the dedup drop."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str((Path("jobs")).resolve().parent / "jobs"))
    from curate import curate

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
        (2, "", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = {r["doc_id"] for r in curate(docs, dedup="exact", span_window=10).collect()}
    # doc 1 dies at exact dedup; doc 2 (zero tokens, zero spans
    # removed) must SURVIVE the span stage
    assert kept == {0, 2}


def test_curate_decontaminates_before_scrub(spark):
    """Scrubbing rewrites training text; decontamination must run on
    the pre-scrub text or eval overlaps containing PII-shaped strings
    escape the filter."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str((Path("jobs")).resolve().parent / "jobs"))
    from curate import curate

    overlap = "write john@example.com before the deadline"
    docs = spark.createDataFrame(
        [(0, "please " + overlap + " thanks", "en"),
         (1, "totally unrelated content here", "en")],
        "doc_id long, text string, lang string",
    )
    ev = spark.createDataFrame(
        [(99, "for help " + overlap, "en")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in curate(
            docs, dedup="exact", eval_docs=ev, decontam_n=3, scrub=True
        ).collect()
    }
    # doc 0 shares 3-grams crossing the email token -> dropped even
    # though scrub would have rewritten that token; survivor is scrubbed
    assert set(out) == {1}


def test_span_dedup_global_invariants(spark):
    """Randomized invariants over a small token alphabet (guarantees
    span collisions): (a) every distinct span string survives EXACTLY
    once across the whole output corpus; (b) each doc's surviving spans
    are a subsequence of its original span list; (c) kept+removed
    equals the doc's span count."""
    import random

    rng = random.Random(414)
    W = 3
    rows = [
        (i, " ".join(rng.choice("abc") for _ in range(rng.randrange(0, 12))), "s")
        for i in range(40)
    ]
    df = _docs(spark, rows)
    out = {r["doc_id"]: r.asDict() for r in span_dedup(df, window=W).collect()}

    def spans_of(text):
        toks = [t for t in text.split(" ") if t]
        return [" ".join(toks[i : i + W]) for i in range(0, len(toks), W)]

    seen = set()
    for doc_id, text, _src in rows:
        orig = spans_of(text)
        kept = spans_of(out[doc_id]["clean_text"])
        assert out[doc_id]["n_spans_kept"] + out[doc_id]["n_spans_removed"] == len(orig)
        # (b) subsequence of the original span sequence
        it = iter(orig)
        assert all(any(s == o for o in it) for s in kept), (doc_id, orig, kept)
        # (a) global uniqueness — doc_ids ascend, so first-occurrence
        # ordering matches iteration order here
        for s in kept:
            assert s not in seen, f"span {s!r} survived twice"
            seen.add(s)
    # every distinct span in the corpus must appear in the output once
    all_spans = {s for _i, t, _s in rows for s in spans_of(t)}
    assert seen == all_spans


def test_contamination_and_decontaminate(spark):
    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        contamination,
        decontaminate,
    )

    ev = _docs(spark, [(100, "alpha beta gamma delta epsilon", "e")])
    tr = _docs(
        spark,
        [
            # shares the eval doc's 3-grams "alpha beta gamma",
            # "beta gamma delta" -> 2 matches
            (0, "x alpha beta gamma delta y", "t"),
            # shares exactly one 3-gram
            (1, "alpha beta gamma unrelated words here", "t"),
            # clean
            (2, "totally different content every token", "t"),
            # too short to form a 3-gram
            (3, "alpha beta", "t"),
        ],
    )
    hits = {
        r["doc_id"]: r["n_matched"]
        for r in contamination(tr, ev, n=3).collect()
    }
    assert hits == {0: 2, 1: 1}
    # min_common raises the bar
    hits2 = {
        r["doc_id"]: r["n_matched"]
        for r in contamination(tr, ev, n=3, min_common=2).collect()
    }
    assert hits2 == {0: 2}
    kept = {r["doc_id"] for r in decontaminate(tr, ev, n=3).collect()}
    assert kept == {2, 3}
    # duplicated shingle inside a training doc counts once (distinct)
    tr_dup = _docs(
        spark, [(0, "alpha beta gamma z alpha beta gamma", "t")]
    )
    hits3 = contamination(tr_dup, ev, n=3).collect()
    assert [(r["doc_id"], r["n_matched"]) for r in hits3] == [(0, 1)]


def test_pack_manifest(spark):
    from mecab_ko_lucene_analyzer_spark.functions.curation import pack_manifest

    rows = [
        (0, "a b c", "s"),          # 3 tokens, start 0
        (1, "", "s"),               # empty: NULL seq ids, start 3
        (2, " ".join(["t"] * 6), "s"),  # straddles the seq-4 boundary
        (3, "x", "s"),
    ]
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in pack_manifest(df, seq_len=4, num_partitions=2).collect()
    }
    assert out[0] == {
        "doc_id": 0, "n_tokens": 3, "token_start": 0,
        "seq_first": 0, "seq_last": 0,
    }
    assert out[1] == {
        "doc_id": 1, "n_tokens": 0, "token_start": 3,
        "seq_first": None, "seq_last": None,
    }
    # doc 2 occupies tokens 3..8 -> sequences 0..2 (straddles two
    # boundaries of the 4-token grid)
    assert out[2] == {
        "doc_id": 2, "n_tokens": 6, "token_start": 3,
        "seq_first": 0, "seq_last": 2,
    }
    assert out[3]["token_start"] == 9
    # offsets are a pure function of doc_id order — partition-count
    # invariant by construction
    alt = {
        r["doc_id"]: r["token_start"]
        for r in pack_manifest(df, seq_len=4, num_partitions=7).collect()
    }
    assert alt == {k: v["token_start"] for k, v in out.items()}
    with pytest.raises(ValueError, match="seq_len"):
        pack_manifest(df, seq_len=0)


def test_unigram_logprob(spark):
    import math

    from mecab_ko_lucene_analyzer_spark.functions.curation import unigram_logprob

    # corpus: "a" x6, "b" x3, "z" x1 -> total 10; with min_count=3 the
    # vocab is {a: ln(0.6), b: ln(0.3)} and z scores the OOV floor
    rows = [
        (0, "a a a b", "s"),
        (1, "a a a b b z", "s"),
        (2, "", "s"),  # no tokens -> no row
    ]
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in unigram_logprob(df, min_count=3).collect()
    }
    assert set(out) == {0, 1}
    la, lb, oov = math.log(0.6), math.log(0.3), -math.log(10)
    assert out[0]["n_tokens"] == 4
    assert out[0]["avg_logprob"] == pytest.approx(
        (3 * la + lb) / 4, abs=1e-6
    )
    assert out[1]["avg_logprob"] == pytest.approx(
        (3 * la + 2 * lb + oov) / 6, abs=1e-6
    )
    # the common-token doc scores higher (less surprising) than the
    # one carrying an OOV — the filter's discriminating direction
    assert out[0]["avg_logprob"] > out[1]["avg_logprob"]


def test_unigram_logprob_empty_corpus(spark):
    from mecab_ko_lucene_analyzer_spark.functions.curation import unigram_logprob

    df = _docs(spark, [(0, "", "s")])
    assert unigram_logprob(df).count() == 0


def test_normalize_text(spark):
    import unicodedata

    from mecab_ko_lucene_analyzer_spark.functions.curation import normalize_text

    nfd = "café Å straße"  # decomposed marks + sharp-s
    rows = [(0, nfd, "s"), (1, "plain ascii", "s"), (2, None, "s")]
    df = _docs(spark, rows)
    out = {r["doc_id"]: r["text"] for r in normalize_text(df).collect()}
    assert out[0] == unicodedata.normalize("NFC", nfd)
    assert "́" not in out[0] and "café" in out[0]
    assert out[1] == "plain ascii"  # identity on ASCII
    assert out[2] is None  # NULL passes through
    # other columns untouched, schema/order preserved
    cols = normalize_text(df).columns
    assert cols == ["doc_id", "text", "source"]


def test_span_dedup_within_doc_repeat(spark):
    # the same span repeated INSIDE one doc: first occurrence survives,
    # later ones drop, and reassembly preserves span order
    df = _docs(spark, [(0, "p q r s p q", "s")])
    row = span_dedup(df, window=2).collect()[0]
    assert row["clean_text"] == "p q r s"
    assert row["n_spans_kept"] == 2
    assert row["n_spans_removed"] == 1


def test_canonical_url_rules(spark):
    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        canonicalize_urls,
    )

    cases = [
        (0, "HTTP://Example.COM:80/Path/To?utm_source=x&b=2&a=1#frag"),
        (1, "https://example.com:443/"),
        (2, "https://example.com/"),
        (3, "https://example.com"),
        (4, "  https://a.b/c?z=1&y=2&utm_campaign&fbclid=xyz "),
        (5, "ftp://Files.Example.com:21/x"),  # non-http port kept
        (6, "not a url"),  # passthrough, never NULLed
        (7, "https://example.com:8080/p?a=1"),  # non-default port kept
        (8, "https://example.com/p?"),
        (9, "https://example.com:443/x"),  # default port, real path
        (10, None),
        # a '?' INSIDE the fragment must not resurrect a query string
        # once the fragment is dropped
        (11, "https://example.com/p#frag?t=1"),
        (12, "https://example.com/p?a=1#frag?t=2"),
    ]
    df = spark.createDataFrame(cases, "doc_id int, url string")
    got = {r.doc_id: r.canon_url for r in canonicalize_urls(df).collect()}
    assert got[0] == "http://example.com/Path/To?a=1&b=2"  # path case kept
    assert got[1] == "https://example.com"
    assert got[2] == "https://example.com"
    assert got[3] == "https://example.com"  # the three forms merge
    assert got[4] == "https://a.b/c?y=2&z=1"  # trimmed, tracking dropped
    assert got[5] == "ftp://files.example.com:21/x"
    assert got[6] == "not a url"
    assert got[7] == "https://example.com:8080/p?a=1"
    assert got[8] == "https://example.com/p"
    assert got[9] == "https://example.com/x"
    assert got[10] is None
    assert got[11] == "https://example.com/p"
    assert got[12] == "https://example.com/p?a=1"


def test_canonical_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — a key-prep function
    must be a projection or repeated pipeline stages would re-key."""
    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        canonical_url,
        canonicalize_urls,
    )

    urls = [
        (i, u)
        for i, u in enumerate(
            [
                "HTTP://A.COM:80/p?utm_source=1&b=2&a=1#f",
                "https://b.org:443/",
                "junk",
                "https://c.net/p?z=9&y=8",
            ]
        )
    ]
    df = canonicalize_urls(spark.createDataFrame(urls, "doc_id int, url string"))
    twice = df.withColumn("again", canonical_url("canon_url"))
    for r in twice.collect():
        assert r.again == r.canon_url, r


def test_cap_per_host_matches_brute_force_reference(spark):
    """Randomized (seeded) check of cap_per_host against a pure-Python
    replay of the md5-rank law: 5 corpus shapes × caps, each compared
    id-for-id. The hash is hashlib-replicable, so the reference shares
    no code with the implementation."""
    import hashlib
    import random

    import pyspark.sql.functions as F

    from mecab_ko_lucene_analyzer_spark.functions.curation import (
        cap_per_host,
    )

    def h(doc_id, seed=42):
        s = f"hostcap-{seed}-{doc_id}"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rng = random.Random(2026)
    for trial in range(5):
        n = rng.randint(20, 120)
        n_hosts = rng.randint(1, 6)
        cap = rng.randint(1, 8)
        assignment = {i: rng.randrange(n_hosts) for i in range(n)}
        docs = spark.createDataFrame(
            [
                (i, f"https://t{assignment[i]}.x/p{i}")
                for i in range(n)
            ],
            "doc_id long, url string",
        ).repartition(rng.randint(1, 5))
        got = sorted(
            r["doc_id"]
            for r in cap_per_host(docs, cap).select("doc_id").collect()
        )
        byhost: dict = {}
        for i in range(n):
            byhost.setdefault(assignment[i], []).append((h(i), i))
        want = sorted(
            i
            for lst in byhost.values()
            for _, i in sorted(lst)[:cap]
        )
        assert got == want, (trial, n, n_hosts, cap)
