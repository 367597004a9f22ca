"""Training-data operator library tests: dedup (minhash/simhash find
planted duplicates), ANN (LSH/IVF recover a planted twin), multimodal
plumbing determinism."""

import pytest

import pyspark.sql.functions as F

from mecab_ko_lucene_analyzer_spark.functions.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)
from mecab_ko_lucene_analyzer_spark.functions.multimodal import (
    attach_media,
    extract_features,
    sample_frames,
)
from mecab_ko_lucene_analyzer_spark.functions.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [
        (0, base.strip(), "en", "s", 1),
        (1, base.strip(), "en", "s", 1),  # exact duplicate of 0
        (2, (base + "EXTRA WORD").strip(), "en", "s", 1),  # near dup of 0
        (3, "completely different text about something else entirely unrelated ok", "en", "s", 1),
        (4, " ".join(f"tok{i} filler{i%7}" for i in range(60)), "en", "s", 1),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).cache()


def test_exact_duplicates_finds_planted_pair(docs):
    rows = exact_duplicates(docs).collect()
    assert len(rows) == 1
    assert rows[0]["dup_count"] == 2 and rows[0]["canonical_doc_id"] == 0


def test_ngram_jaccard_and_minhash_agree_on_planted_dups(docs):
    exact_pairs = {
        (r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, 5).collect()
    }
    assert (0, 1) in exact_pairs and (0, 2) in exact_pairs
    lsh_pairs = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    assert (0, 1) in lsh_pairs  # identical docs always collide
    assert (0, 2) in lsh_pairs  # near dup shares most shingles
    assert (0, 3) not in lsh_pairs and (1, 3) not in lsh_pairs


def test_simhash_identical_and_distinct(docs):
    rows = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[3]
    cands = {(r["doc_a"], r["doc_b"]) for r in simhash_candidates(docs).collect()}
    assert (0, 1) in cands


def test_simhash_max_hamming_is_exact_verification(docs):
    """max_hamming turns block-bucket candidates into exactly the
    brute-force hamming-ball pairs (for d <= 3 the 4x15-bit pigeonhole
    guarantees recall, so candidates ∩ hamming-filter = ground truth),
    with no duplicate rows from multi-block collisions."""
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(sh)
    for d in (0, 3):
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(sh[a] ^ sh[b]).count("1") <= d
        }
        got = [
            (r["doc_a"], r["doc_b"])
            for r in simhash_candidates(docs, max_hamming=d).collect()
        ]
        assert len(got) == len(set(got))  # distinct output
        assert set(got) == want, d


@pytest.fixture(scope="module")
def emb(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(50):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(16)], 0))
    rows.append((50, list(rows[5][1]), 0))  # planted twin of vec 5
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()


def _queries(emb):
    return emb.filter(F.col("vec_id") == 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )


def test_cosine_topk_finds_twin(emb):
    rows = cosine_topk(emb, _queries(emb), k=3).collect()
    assert rows[0]["vec_id"] == 50 and rows[0]["cosine"] == pytest.approx(1.0)


def test_lsh_topk_finds_twin(emb):
    rows = lsh_bucket_topk(emb, _queries(emb), dim=16, k=3).collect()
    # the twin shares every hyperplane sign → same bucket, top hit
    assert rows and rows[0]["vec_id"] == 50 and rows[0]["cosine"] == pytest.approx(1.0)


def test_ivf_topk_finds_twin(emb):
    rows = ivf_topk(emb, _queries(emb), k=3, n_centroids=5, n_probe=2).collect()
    assert rows and rows[0]["vec_id"] == 50 and rows[0]["cosine"] == pytest.approx(1.0)


def test_multimodal_features_deterministic(docs):
    media = attach_media(docs)
    f1 = {r["doc_id"]: (r["checksum"], r["feature"]) for r in extract_features(media).collect()}
    f2 = {r["doc_id"]: (r["checksum"], r["feature"]) for r in extract_features(media).collect()}
    assert f1 == f2
    assert f1[0] == f1[1]  # identical payloads → identical features
    assert f1[0] != f1[3]
    frames = sample_frames(media, every_n_bytes=32, max_frames=4).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) and len(v) <= 4 for v in per_doc.values())


def test_jaccard_expansion_matches_self_join(docs):
    """The bucket-expansion formulation must equal the direct shingle
    self-join (the DuckDB oracle's formulation) row for row."""
    from mecab_ko_lucene_analyzer_spark.functions.dedup import (
        ngram_jaccard_pairs,
        shingles,
    )

    got = sorted(
        (r["doc_a"], r["doc_b"], r["common_shingles"])
        for r in ngram_jaccard_pairs(docs, min_common=1).collect()
    )
    sh = docs.select("doc_id", F.explode(shingles("text", 3)).alias("shingle"))
    a, b = sh.alias("a"), sh.alias("b")
    ref = sorted(
        (r["doc_a"], r["doc_b"], r["n"])
        for r in a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == ref
    assert len(got) > 0  # planted dups actually pair


def test_bmp_decode_roundtrip():
    from mecab_ko_lucene_analyzer_spark.functions.multimodal import (
        decode_bmp,
        synthesize_bmp,
    )

    payload = synthesize_bmp(17, 9, seed=3)
    meta = decode_bmp(payload)
    assert meta == {"width": 17, "height": 9, "bpp": 24}
    assert decode_bmp(b"NOTABMP" * 20) is None


def test_wav_decode_roundtrip():
    from mecab_ko_lucene_analyzer_spark.functions.multimodal import (
        decode_wav,
        synthesize_wav,
    )

    payload = synthesize_wav(n_samples=8000, sample_rate=16000, channels=2)
    meta = decode_wav(payload)
    assert meta == {"sample_rate": 16000, "channels": 2, "duration_ms": 500}
    assert decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 64) is None


def test_probe_media_real_decode(spark):
    """The REAL decode path end-to-end through Spark: BMP and WAV
    payloads produce measured metadata; unknown containers stay NULL
    (the honest stub boundary)."""
    from mecab_ko_lucene_analyzer_spark.functions.multimodal import (
        probe_media,
        synthesize_bmp,
        synthesize_wav,
    )

    rows = [
        (0, synthesize_bmp(32, 8, seed=1)),
        (1, synthesize_wav(1600, sample_rate=8000)),
        (2, b"\xff\xd8\xff\xe0 not decodable without a jpeg codec"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r.asDict() for r in probe_media(media).collect()}
    assert out[0]["format"] == "bmp" and out[0]["width"] == 32 and out[0]["height"] == 8
    assert out[1]["format"] == "wav" and out[1]["duration_ms"] == 200
    assert out[1]["sample_rate"] == 8000 and out[1]["width"] is None
    assert out[2]["format"] == "unknown" and out[2]["width"] is None


def test_dedup_clusters_components(spark):
    from mecab_ko_lucene_analyzer_spark.functions.dedup import dedup_clusters

    # two components: a 10-chain (worst case for plain propagation —
    # pointer doubling must collapse it within max_iter) and a triangle
    chain = [(i, i + 1) for i in range(100, 110)]
    tri = [(1, 2), (2, 3), (1, 3)]
    pairs = spark.createDataFrame(chain + tri, "doc_a long, doc_b long")
    out = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs, max_iter=6).collect()}
    assert {out[v] for v in range(100, 111)} == {100}
    assert {out[v] for v in (1, 2, 3)} == {1}
    assert len(out) == 14  # every member labeled exactly once


def test_dedup_clusters_empty(spark):
    from mecab_ko_lucene_analyzer_spark.functions.dedup import dedup_clusters

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup_clusters(pairs).count() == 0


def test_stratified_sample_deterministic_and_stratified(spark):
    from mecab_ko_lucene_analyzer_spark.functions.text import stratified_sample

    rows = [(i, f"text {i}", "ko" if i % 2 else "en") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = stratified_sample(docs, {"ko": 1.0, "en": 0.2})
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(r.doc_id for r in kept.repartition(7).collect())
    assert ids1 == ids2  # partitioning-independent (pure function of id)
    ko = sum(1 for i in ids1 if i % 2)
    en = len(ids1) - ko
    assert ko == 1000  # fraction 1.0 keeps every ko row
    assert 300 <= en + 1000 <= 1400 and 100 <= en <= 300  # ~20% of 1000
    # unlisted strata fall to default_fraction=0
    none_kept = stratified_sample(docs, {"zz": 1.0})
    assert none_kept.count() == 0


def test_dedup_clusters_random_graphs_property(spark):
    """Property: dedup_clusters equals a union-find ground truth on
    random graphs (catches pointer-doubling/propagation bugs that a
    fixed fixture would miss)."""
    import random

    from mecab_ko_lucene_analyzer_spark.functions.dedup import dedup_clusters

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # ground truth: union-find with min-root canonicalization
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e}
        want = {v: find(v) for v in sorted(touched)}
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
        assert got == want, f"trial {trial}: {got} != {want}"


def test_clustering_pointer_doubling_round_bound(spark):
    """A 1000-member CHAIN (worst-case diameter for plain label
    propagation: 999 rounds) must converge in ≤ log2(diameter) + 2
    rounds under pointer doubling — asserted via the convergence
    counter, not just the output."""
    import math

    from mecab_ko_lucene_analyzer_spark.functions.dedup import dedup_clusters

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "doc_a long, doc_b long"
    )
    rounds: list = []
    labels = dedup_clusters(edges, rounds_out=rounds)
    got = labels.groupBy("cluster_id").count().collect()
    assert len(got) == 1
    assert got[0]["cluster_id"] == 0 and got[0]["count"] == 1000
    assert rounds[0] <= math.ceil(math.log2(999)) + 2, rounds


def test_curate_skewed_mega_duplicate_group(spark):
    """Web-crawl skew shape end-to-end: ONE text duplicated 1,000 times
    (a boilerplate page) plus a near-dup pair plus distinct fillers.
    The window-based exact stage must reduce the mega group to its min
    doc_id BEFORE the minhash stage (identical docs would otherwise
    degenerate every LSH bucket quadratically), and the near-dup
    cluster keeps only its canonical member."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path("jobs").resolve().parent / "jobs"))
    from curate import curate

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [(i, base.strip(), "ko") for i in range(1000)]           # mega group
    rows.append((1000, (base + "EXTRA WORD").strip(), "ko"))        # near dup of 0
    rows += [
        (1001 + j, " ".join(f"tok{j}x{i} fill{(i * 7 + j) % 23}" for i in range(40)), "en")
        for j in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = {r.doc_id for r in curate(docs, dedup="minhash").collect()}
    # 999 exact dupes dropped by the window; near-dup 1000 clustered
    # with canonical 0 and dropped; the 5 distinct fillers survive
    assert kept == {0} | {1001 + j for j in range(5)}


def test_curate_exact_stage_never_broadcasts_corpus(spark):
    """The exact-dedup stage must be a window + filter — ONE hash
    shuffle, no broadcast of any corpus-derived relation (a duplicate-
    groups table is unbounded at crawl scale)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path("jobs").resolve().parent / "jobs"))
    from curate import curate

    docs = spark.createDataFrame(
        [(i, f"text {i % 3}", "ko") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    plan = curate(docs, dedup="exact")._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" not in plan, plan
    kept = {r.doc_id for r in curate(docs, dedup="exact").collect()}
    assert kept == {0, 1, 2}  # min doc_id per identical-text group


def test_hash_impl_backends_equivalent_candidates(docs):
    """hash_impl='xxhash64' (production) and 'md5' (oracle parity) are
    different hash families — signatures differ — but BOTH must surface
    the planted exact+near dup pairs and neither may fabricate the
    unrelated pair."""
    from mecab_ko_lucene_analyzer_spark.functions.dedup import minhash_signatures

    for impl in ("md5", "xxhash64"):
        lsh = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(docs, hash_impl=impl).collect()
        }
        assert (0, 1) in lsh and (0, 2) in lsh, impl
        assert (0, 3) not in lsh and (1, 3) not in lsh, impl
        sim = {
            (r["doc_a"], r["doc_b"])
            for r in simhash_candidates(docs, hash_impl=impl).collect()
        }
        assert (0, 1) in sim and (0, 2) in sim, impl
    # genuinely distinct families, not an aliased default
    s_md5 = minhash_signatures(docs, hash_impl="md5").filter("doc_id = 0").first()["sig"]
    s_xx = minhash_signatures(docs, hash_impl="xxhash64").filter("doc_id = 0").first()["sig"]
    assert s_md5 != s_xx


def test_degenerate_docs_through_hashed_shingles(spark):
    """Real web text has empty / one-token / two-token documents: they
    must produce NO shingles, NO signatures, and NO candidate pairs —
    not errors, not a shared degenerate bucket (the skew bomb)."""
    from mecab_ko_lucene_analyzer_spark.functions.dedup import (
        minhash_signatures,
        shingle_hashes,
        token_hashes,
    )

    docs = spark.createDataFrame(
        [(0, ""), (1, "one"), (2, "two tokens"), (3, "   "),
         (4, "exactly three tokens"), (5, "exactly three tokens")],
        "doc_id long, text string",
    )
    rows = docs.select(
        "doc_id", token_hashes("text").alias("th")
    ).select("doc_id", shingle_hashes(F.col("th")).alias("h")).collect()
    by_id = {r["doc_id"]: r["h"] for r in rows}
    assert by_id[0] == [] and by_id[1] == [] and by_id[2] == [] and by_id[3] == []
    assert len(by_id[4]) == 1 and by_id[4] == by_id[5]  # identical docs hash equal
    sigs = minhash_signatures(docs).collect()
    assert {r["doc_id"] for r in sigs} == {4, 5}  # short docs dropped
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert pairs == {(4, 5)}
    jac = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, 1).collect()}
    assert jac == {(4, 5)}


def test_arrow_shingle_fold_equals_catalyst(spark):
    """The numpy shingle fold (_shingle_fold_flat, production path for
    jaccard + minhash) must reproduce the Catalyst zip_with form
    (shingle_hashes) hash-for-hash — including NULL text, short docs,
    and repeated shingles — since the DuckDB oracles replicate the
    Catalyst arithmetic."""
    import random

    from mecab_ko_lucene_analyzer_spark.functions.dedup import (
        _token_hash_arrays,
        shingle_hashes,
        token_hashes,
    )

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = [(0, None), (1, ""), (2, "one"), (3, "a b")]
    rows += [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(4, 40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        r["doc_id"]: list(r["h"] or [])
        for r in docs.select(
            "doc_id", token_hashes("text").alias("th")
        ).select("doc_id", shingle_hashes(F.col("th")).alias("h")).collect()
    }

    def emit(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from mecab_ko_lucene_analyzer_spark.functions.dedup import (
            _shingle_fold_flat,
        )

        for batch in batches:
            if batch.num_rows == 0:
                continue
            out = _shingle_fold_flat(batch, 3)
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            got: dict[int, list[int]] = {int(i): [] for i in ids}
            if out is not None:
                doc_rep, s, _ = out
                for di, sh in zip(doc_rep, s):
                    got[int(ids[di])].append(int(sh))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(sorted(got), type=pa.int64()),
                    pa.array([got[k] for k in sorted(got)],
                             type=pa.list_(pa.int64())),
                ],
                ["doc_id", "h"],
            )

    arrow = {
        r["doc_id"]: list(r["h"])
        for r in _token_hash_arrays(docs, "text", "md5")
        .mapInArrow(emit, "doc_id bigint, h array<bigint>")
        .collect()
    }
    assert arrow == want


def test_simhash_degenerate_docs_pin_fold_semantics(spark):
    """The vectorized Arrow simhash must keep the original fold form's
    degenerate behavior exactly: empty token array → every majority
    test is 0 ≥ 0 → all 60 bits set; NULL text → NULL fold condition →
    otherwise(0) on every bit → simhash 0. Normal docs hash by
    majority as usual (identical docs equal)."""
    from mecab_ko_lucene_analyzer_spark.functions.dedup import (
        SIMHASH_BITS,
        simhash,
    )

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "hello"), (4, "hello"),
         (5, "a b c d")],
        "doc_id long, text string",
    )
    by_id = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    all_ones = (1 << SIMHASH_BITS) - 1
    assert by_id[0] == 0
    assert by_id[1] == all_ones and by_id[2] == all_ones
    assert by_id[3] == by_id[4]
    assert 0 < by_id[3] < all_ones and 0 < by_id[5] < all_ones


def test_hash_impl_unknown_rejected(docs):
    with pytest.raises(ValueError, match="hash_impl"):
        minhash_lsh_pairs(docs, hash_impl="sha1")


def test_curate_pipeline(spark, tmp_path):
    """End-to-end curation job: exact dupes drop, near-dup clusters keep
    the canonical member, sampling filters deterministically."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path("jobs").resolve().parent / "jobs"))
    from curate import curate, parse_fractions

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [
        (0, base.strip(), "ko"),
        (1, base.strip(), "ko"),                       # exact dup of 0
        (2, (base + "EXTRA WORD").strip(), "ko"),      # near dup of 0
        (3, "completely different text entirely unrelated ok fine", "en"),
        (4, " ".join(f"tok{i} filler{i%7}" for i in range(60)), "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = {r.doc_id for r in curate(docs, dedup="jaccard", min_common=5).collect()}
    assert kept == {0, 3, 4}  # 1 exact-dropped, 2 cluster-dropped
    # simhash mode: verified hamming<=3 pairs — doc 2 differs from doc 0
    # by one appended token, so their simhashes sit inside the ball
    kept_sh = {r.doc_id for r in curate(docs, dedup="simhash").collect()}
    assert 0 in kept_sh and 1 not in kept_sh
    assert kept_sh <= {0, 2, 3, 4}
    assert parse_fractions("ko=1.0, en=0.5") == {"ko": 1.0, "en": 0.5}
    sampled = curate(docs, dedup="exact", fractions={"ko": 1.0}, default_fraction=0.0)
    got = {r.doc_id for r in sampled.collect()}
    assert got == {0, 2}  # all surviving ko rows, zero en rows


def test_curate_null_and_empty_text_docs_all_survive(spark):
    """NULL/empty-text docs are not a duplicate group: every one must
    survive the exact stage (the salted window key gives each a
    singleton partition — no md5(NULL) skew bomb, no arbitrary single
    survivor), while real duplicate groups still collapse to min
    doc_id. Also pins hash_impl passthrough on the jaccard path."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path("jobs").resolve().parent / "jobs"))
    from curate import curate

    rows = [
        (0, "same text here", "ko"),
        (1, "same text here", "ko"),      # exact dup of 0 → dropped
        (2, None, "ko"),                  # all survive
        (3, None, "en"),
        (4, "", "ko"),
        (5, "", "en"),
        (6, "unique text six", "ko"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = {r.doc_id for r in curate(docs, dedup="exact").collect()}
    assert kept == {0, 2, 3, 4, 5, 6}
    # jaccard path accepts the hash_impl flag (xxhash64 production
    # backend) and keeps the same survivors on this corpus
    kept_j = {
        r.doc_id
        for r in curate(docs, dedup="jaccard", hash_impl="xxhash64").collect()
    }
    assert kept_j == {0, 2, 3, 4, 5, 6}


# --------------------------------------------------------------------------
# weighted_sample / chunk_documents / percolate (session 15)
# --------------------------------------------------------------------------


def test_weighted_sample_clamps_and_is_deterministic(spark):
    from mecab_ko_lucene_analyzer_spark.functions.text import weighted_sample
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate([2.0, 1.0, 0.5, 0.0, -1.0] * 40)],
        "doc_id long, w double",
    )
    kept = weighted_sample(docs, F.col("w"))
    ids = {r["doc_id"] for r in kept.collect()}
    # weight >= 1 always kept; <= 0 never
    assert all(i in ids for i in range(0, 200, 5))       # w=2.0
    assert all(i in ids for i in range(1, 200, 5))       # w=1.0
    assert all(i not in ids for i in range(3, 200, 5))   # w=0.0
    assert all(i not in ids for i in range(4, 200, 5))   # w=-1.0
    # w=0.5 keeps roughly half, deterministically
    half = [i for i in ids if i % 5 == 2]
    assert 5 <= len(half) <= 35
    again = {r["doc_id"] for r in weighted_sample(docs, F.col("w")).collect()}
    assert again == ids
    # a different seed selects a different 0.5-subset
    other = {
        r["doc_id"]
        for r in weighted_sample(docs, F.col("w"), seed=7).collect()
    }
    assert {i for i in other if i % 5 in (0, 1)} == {
        i for i in ids if i % 5 in (0, 1)
    }
    assert other != ids


def test_chunk_documents_windows_and_edges(spark):
    from mecab_ko_lucene_analyzer_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),  # 7 tokens
            (2, "x y"),            # shorter than one window
            (3, ""),               # empty: no chunks
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, max_tokens=4, stride=3).collect()
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in rows
    }
    # doc1 starts at 0,3,6: windows abcd, defg, g
    assert got[(1, 0)] == (4, "a b c d")
    assert got[(1, 1)] == (4, "d e f g")
    assert got[(1, 2)] == (1, "g")
    assert got[(2, 0)] == (2, "x y")
    assert not [k for k in got if k[0] == 3]
    # disjoint packing default: stride == max_tokens
    dj = chunk_documents(docs, max_tokens=3).collect()
    dj1 = sorted(
        (r["chunk_id"], r["chunk_text"]) for r in dj if r["doc_id"] == 1
    )
    assert dj1 == [(0, "a b c"), (1, "d e f"), (2, "g")]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, 4, 0)


def test_percolate_modes(spark):
    from mecab_ko_lucene_analyzer_spark.query.percolate import percolate
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [
            (1, "spark query fast"),
            (2, "spark only here"),
            (3, "query spark query"),  # dup tokens count once
        ],
        "doc_id long, text string",
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != F.lit(""))
        ).alias("term"),
    )
    qdf = spark.createDataFrame(
        [
            (0, ["spark", "query"]),
            (1, ["spark", "spark"]),  # repeated stored term: distinct size
            (2, ["absent"]),
            (3, []),                  # empty stored query never matches
        ],
        "query_id long, terms array<string>",
    )
    conj = {
        (r["doc_id"], r["query_id"]): r["n_matched"]
        for r in percolate(toks, qdf).collect()
    }
    assert conj == {(1, 0): 2, (3, 0): 2, (1, 1): 1, (2, 1): 1, (3, 1): 1}
    # disjunctive msm=1: any shared term matches
    msm = {
        (r["doc_id"], r["query_id"])
        for r in percolate(toks, qdf, min_should_match=1).collect()
    }
    assert (2, 0) in msm  # doc2 has 'spark' but not 'query'
    assert not [q for d, q in msm if q in (2, 3)]


def test_curate_host_cap_stage(spark):
    """--host-cap through the curate pipeline: the quota applies before
    dedup, urls drive the host key, and the under-cap hosts are
    untouched."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path("jobs").resolve().parent / "jobs"))
    from curate import curate

    rows = [
        (i, f"unique text number {i} " + " ".join(f"w{i}x{j}" for j in range(10)),
         "ko", f"https://{'mega' if i < 30 else 'tiny'}.x/p{i}")
        for i in range(36)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, url string"
    )
    out = curate(docs, dedup="exact", host_cap=8).collect()
    hosts = {}
    for r in out:
        h = "mega" if r.doc_id < 30 else "tiny"
        hosts[h] = hosts.get(h, 0) + 1
    assert hosts["mega"] == 8  # 30 docs capped to 8
    assert hosts["tiny"] == 6  # under cap: all kept
