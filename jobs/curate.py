"""spark-submit job: training-corpus curation pipeline.

    spark-submit --py-files mecab_ko_lucene_analyzer_spark.zip \
        jobs/curate.py --input /path/documents_parquet \
        --output /path/curated \
        --dedup minhash --sample "ko=1.0,en=0.5" --default-fraction 0.1

One pass over a ``documents``-shaped table ``(doc_id, text, lang, ...)``:

1. **exact dedup** — drop byte-identical re-crawls, keep the min doc_id.
2. **near-dup dedup** (``--dedup minhash``) — MinHash-LSH candidate
   pairs → connected components → keep each cluster's canonical
   (min doc_id) member. ``--dedup exact`` skips this stage;
   ``--dedup jaccard`` uses the exact shingle baseline (small corpora).
3. **stratified sample** — deterministic per-language mixing; the keep
   decision is a pure hash of doc_id, so reruns and retries select the
   same corpus.

Every stage is a Catalyst plan (no Python in the row path); the output
is written through the table-format seam (parquet path or Iceberg
catalog identifier).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_fractions(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        if not part.strip():
            continue
        k, v = part.split("=")
        out[k.strip()] = float(v)
    return out


def footer_row_count(path: str) -> int | None:
    """Row count from parquet footers (driver-side metadata, no Spark
    job). Returns None for non-local / non-parquet inputs (catalog
    identifiers, object stores) — callers log '?' rather than paying a
    full re-scan for a log line."""
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return None
    if not os.path.isdir(path):
        return None
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def curate(
    docs,
    dedup: str = "minhash",
    fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    min_common: int = 5,
    hash_impl: str = "xxhash64",
    span_window: int | None = None,
    max_dup_token_frac: float | None = None,
    max_dup_bigram_frac: float | None = None,
    max_top_token_frac: float | None = None,
    blocklist: list[str] | None = None,
    max_blocked_frac: float = 0.0,
    gopher: bool = False,
    gopher_lang: str | None = None,
    gopher_counts: dict | None = None,
    min_bigram_logprob: float | None = None,
    dsir_target=None,
    dsir_keep: int = 0,
    dsir_dim: int = 4096,
    dsir_seed: int = 0,
    scrub: bool = False,
    eval_docs=None,
    decontam_n: int = 8,
    normalize: bool = False,
    host_ranks=None,
    min_host_rank: float = 0.0,
    host_cap: int | None = None,
):
    """documents DataFrame → curated DataFrame (same columns).

    Optional post-dedup stages (all off by default): C4-style span
    dedup (``span_window``: text rewritten from surviving spans, docs
    emptied entirely are dropped), Gopher repetition thresholds
    (``max_dup_token_frac`` / ``max_top_token_frac``), the full Gopher
    rule battery (``gopher``: zero-shuffle flag battery, keep
    ``gopher_pass`` docs only; ``gopher_lang`` picks the letter class
    and stopword list — ``en`` is Rae et al.'s English battery, ``ko``
    swaps in the Unicode letter class + Korean function words, ``any``
    uses the Unicode letter class and disables the stopword rule; the
    English default applied to a pure-Korean slice drops EVERY doc via
    the alpha/stopword rules, so pick deliberately), the bigram-LM
    perplexity cut
    (``min_bigram_logprob``: docs scoring below the threshold — or too
    short to score — are dropped), PII scrubbing (``scrub``), and
    benchmark decontamination (``eval_docs``: drop docs sharing
    ``decontam_n``-gram shingles with the eval set), and DSIR
    importance resampling (``dsir_target`` + ``dsir_keep``:
    Gumbel-top-k over hashed-ngram LM log-ratios toward the target
    domain).

    ``host_ranks`` (a ``jobs/webgraph.py`` ``host_ranks`` table,
    ``(node, rank)``) drops docs whose url host ranks below
    ``min_host_rank`` — the centrality-weighted spam-host cut. Docs
    without a url host or whose host is absent from the graph are
    KEPT (absence of link evidence is not negative evidence).

    ``host_cap`` keeps at most that many docs per url host
    (deterministic md5-rank selection, ``cap_per_host``) — applied
    before the shingle stages so a mega-host cannot dominate them."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from mecab_ko_lucene_analyzer_spark.functions.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_candidates,
    )
    from mecab_ko_lucene_analyzer_spark.functions.text import stratified_sample

    # 0. Unicode NFC canonicalization FIRST, so every downstream
    #    hash-keyed stage (exact dedup, shingles, fingerprints) sees
    #    composed/decomposed re-crawls as the identical bytes they are.
    if normalize:
        from mecab_ko_lucene_analyzer_spark.functions.curation import (
            normalize_text,
        )

        docs = normalize_text(docs)
    # 0b. host-rank quality cut FIRST among the drop stages: it is the
    #     cheapest (one join against a |hosts|-sized relation) and
    #     shrinks everything downstream. Left join + keep-on-null: a
    #     doc is dropped only on positive evidence of a low-rank host.
    if host_ranks is not None:
        from mecab_ko_lucene_analyzer_spark.functions.curation import host_of

        r = host_ranks.select(
            F.col("node").alias("_rank_host"), F.col("rank").alias("_host_rank")
        )
        docs = (
            docs.join(r, host_of("url") == F.col("_rank_host"), "left")
            .filter(
                F.col("_host_rank").isNull()
                | (F.col("_host_rank") >= F.lit(min_host_rank))
            )
            .drop("_rank_host", "_host_rank")
        )
    # 0c. per-host quota (C4's "no host dominates"): trims over-cap
    #     hosts to their host_cap deterministic keepers BEFORE the
    #     expensive shingle stages — the mega-host's boilerplate is
    #     exactly what MinHash would otherwise grind through.
    if host_cap is not None:
        from mecab_ko_lucene_analyzer_spark.functions.curation import (
            cap_per_host,
        )

        docs = cap_per_host(docs, int(host_cap))
    # 1. exact: keep each identical-text group's min-doc_id member.
    #    min(doc_id) OVER (PARTITION BY md5(text)) + filter — ONE hash
    #    shuffle, no second relation, nothing broadcast (a duplicate-
    #    groups table is a constant fraction of a web corpus, so any
    #    broadcast of it is unbounded at crawl scale). Skew note: a
    #    window partition is one text's duplicate set; even a
    #    boilerplate page duplicated a few million times fits a task,
    #    and there is no corpus-wide hot key by construction (md5).
    #    NULL/empty text is NOT a duplicate group: md5(NULL) would land
    #    every null-text doc in ONE window partition (a skew bomb) and
    #    collapse them to a single arbitrary survivor. Salting the
    #    partition key with doc_id for textless rows gives each its own
    #    singleton partition — every one survives (the old left-anti
    #    semantics: a null join key never matches) and no hot key forms.
    has_text = F.col("text").isNotNull() & (F.length("text") > 0)
    docs = (
        docs.withColumn(
            "_canon",
            F.min("doc_id").over(
                Window.partitionBy(
                    F.md5("text"),
                    F.when(has_text, F.lit(0)).otherwise(F.col("doc_id")),
                )
            ),
        )
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon")
    )
    # 2. near-dup clusters → keep canonical member per cluster
    if dedup in ("minhash", "jaccard", "simhash"):
        # production default is xxhash64 (one JVM hash per shingle; the
        # md5 family exists for oracle parity and costs ~2x per token)
        if dedup == "minhash":
            pairs = minhash_lsh_pairs(docs, hash_impl=hash_impl)
        elif dedup == "jaccard":
            pairs = ngram_jaccard_pairs(
                docs, min_common=min_common, hash_impl=hash_impl
            )
        else:
            # VERIFIED simhash pairs: bucket candidates post-filtered
            # to true hamming distance <= 3 (bit_count over the riding
            # payload; no corpus re-join)
            pairs = simhash_candidates(
                docs, hash_impl=hash_impl, max_hamming=3
            )
        members = dedup_clusters(pairs)
        drop = members.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
        docs = docs.join(drop, "doc_id", "left_anti")
    # 3. C4-style span dedup: rewrite each doc from its surviving
    #    spans; docs whose text was entirely boilerplate drop out.
    if span_window:
        from mecab_ko_lucene_analyzer_spark.functions.curation import span_dedup

        # keep docs emptied only because they never HAD spans (empty /
        # whitespace-only text) — "emptied entirely" means emptied BY
        # the dedup, i.e. everything it had was removed
        clean = span_dedup(docs, window=span_window).filter(
            (F.col("n_spans_kept") > 0) | (F.col("n_spans_removed") == 0)
        )
        cols = docs.columns  # keep the input column order ("same columns")
        docs = (
            docs.drop("text")
            .join(
                clean.select("doc_id", F.col("clean_text").alias("text")),
                "doc_id",
            )
            .select(*cols)
        )
    # 4. Gopher repetition thresholds + PII scrub: zero-shuffle map
    #    stages that pipeline into the write.
    if (
        max_dup_token_frac is not None
        or max_dup_bigram_frac is not None
        or max_top_token_frac is not None
    ):
        from mecab_ko_lucene_analyzer_spark.functions.curation import (
            repetition_filter,
        )

        docs = repetition_filter(
            docs,
            max_dup_token_frac=max_dup_token_frac,
            max_dup_bigram_frac=max_dup_bigram_frac,
            max_top_token_frac=max_top_token_frac,
        )
    # 4a1. Gopher rule battery: zero-shuffle named-flag predicate —
    #      the published filter most LLM corpora start from.
    if gopher:
        from mecab_ko_lucene_analyzer_spark.functions.curation import (
            GOPHER_LETTERS_UNICODE,
            GOPHER_STOPWORDS_KO,
            gopher_rules,
        )

        if gopher_lang is None:
            # r5 advisory: the silent English default dropped every
            # Korean document — the battery's language must be an
            # explicit decision
            raise ValueError(
                "gopher=True requires an explicit gopher_lang: 'ko' "
                "(Unicode letters + Korean stopwords), 'en' (Rae et "
                "al.'s English battery — drops pure-Korean docs), or "
                "'any' (Unicode letters, stopword rule off)"
            )
        if gopher_lang == "en":
            gopher_kw = {}
        elif gopher_lang == "ko":
            gopher_kw = {
                "letter_pattern": GOPHER_LETTERS_UNICODE,
                "stopwords": GOPHER_STOPWORDS_KO,
            }
        elif gopher_lang == "any":
            gopher_kw = {
                "letter_pattern": GOPHER_LETTERS_UNICODE,
                "stopwords": [],
            }
        else:
            raise ValueError(
                f"gopher_lang must be en|ko|any, got {gopher_lang!r}"
            )
        rules = gopher_rules(docs, **gopher_kw)
        if gopher_counts is not None:
            # per-rule kill counters for the job summary (one extra
            # map-side-combined aggregate, only when the caller asks)
            flag_cols = [
                c for c in rules.columns if c.startswith("rule_")
            ] + ["gopher_pass"]
            row = rules.agg(
                *[
                    F.count(F.when(~F.col(c), 1)).alias(c)
                    for c in flag_cols
                ]
            ).first()
            gopher_counts.update(
                {c: int(row[c]) for c in flag_cols}
            )
        keep = rules.filter("gopher_pass").select("doc_id")
        docs = docs.join(keep, "doc_id", "left_semi")
    # 4a1b. bigram-LM perplexity cut: corpus-trained add-one bigram
    #       model; docs below the log-prob floor (word salad) drop, as
    #       do docs too short to score (no bigrams).
    if min_bigram_logprob is not None:
        from mecab_ko_lucene_analyzer_spark.functions.curation import (
            bigram_logprob,
        )

        keep = (
            bigram_logprob(docs)
            .filter(F.col("avg_logprob") >= F.lit(float(min_bigram_logprob)))
            .select("doc_id")
        )
        docs = docs.join(keep, "doc_id", "left_semi")
    # 4a2. C4-style word blocklist: another zero-shuffle inline
    #      predicate (token-exact, case-insensitive; frac threshold
    #      0.0 = drop on any occurrence).
    if blocklist:
        from mecab_ko_lucene_analyzer_spark.functions.curation import (
            blocklist_filter,
        )

        docs = blocklist_filter(
            docs, blocklist, max_blocked_frac=max_blocked_frac
        )
    # 4b. benchmark decontamination: drop docs sharing n-gram shingles
    #     with the eval corpus (broadcast eval side, no corpus shuffle).
    #     BEFORE the PII scrub on purpose: scrubbing rewrites training
    #     text while the eval set stays raw, so a post-scrub match
    #     would miss any overlap crossing a redacted token. The eval
    #     side also gets the same NFC normalization as the corpus —
    #     composed/decomposed mismatches would otherwise defeat the
    #     hash-keyed shingle match.
    if eval_docs is not None:
        from mecab_ko_lucene_analyzer_spark.functions.curation import decontaminate

        if normalize:
            from mecab_ko_lucene_analyzer_spark.functions.curation import (
                normalize_text,
            )

            eval_docs = normalize_text(eval_docs)
        docs = decontaminate(
            docs, eval_docs, n=decontam_n, hash_impl=hash_impl
        )
    # 4c. PII scrub last among the text transforms (nothing hash-keyed
    #     runs after it).
    if scrub:
        from mecab_ko_lucene_analyzer_spark.functions.curation import scrub_pii

        docs = scrub_pii(docs)
    # 4d. DSIR importance resampling: score every surviving doc's log
    #     importance weight against the target-domain LM and keep the
    #     Gumbel-top-k — selection ∝ importance weights, deterministic
    #     under the seed. Runs AFTER the drop stages (no point scoring
    #     docs the filters kill) and BEFORE stratified mixing (the mix
    #     fractions then apply to the domain-matched pool).
    if dsir_target is not None and dsir_keep > 0:
        from mecab_ko_lucene_analyzer_spark.functions.curation import (
            dsir_gumbel_topk,
            dsir_logratio,
        )

        keep = dsir_gumbel_topk(
            dsir_logratio(docs, dsir_target, dim=dsir_dim),
            k=dsir_keep,
            seed=dsir_seed,
        ).select("doc_id")
        docs = docs.join(keep, "doc_id", "left_semi")
    # 5. deterministic stratified mixing
    if fractions:
        docs = stratified_sample(docs, fractions, default_fraction=default_fraction)
    return docs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path or catalog table")
    ap.add_argument("--output", required=True, help="parquet path or catalog table")
    ap.add_argument(
        "--dedup",
        default="minhash",
        choices=["exact", "minhash", "jaccard", "simhash"],
    )
    ap.add_argument("--sample", default="", help='per-lang fractions, e.g. "ko=1.0,en=0.5"')
    ap.add_argument("--default-fraction", type=float, default=1.0)
    ap.add_argument("--min-common", type=int, default=5, help="jaccard threshold")
    ap.add_argument(
        "--hash-impl",
        default="xxhash64",
        choices=["md5", "xxhash64"],
        help="token-hash backend for minhash (md5 = oracle-parity, xxhash64 = fast)",
    )
    ap.add_argument(
        "--span-window",
        type=int,
        default=0,
        help="C4-style cross-doc span dedup with this token window (0 = off)",
    )
    ap.add_argument(
        "--max-dup-token-frac",
        type=float,
        default=None,
        help="drop docs whose duplicate-token fraction exceeds this",
    )
    ap.add_argument(
        "--max-dup-bigram-frac",
        type=float,
        default=None,
        help="drop docs whose duplicate-bigram fraction exceeds this",
    )
    ap.add_argument(
        "--max-top-token-frac",
        type=float,
        default=None,
        help="drop docs whose most-frequent-token share exceeds this",
    )
    ap.add_argument(
        "--blocklist-file",
        default="",
        help="path to a newline-separated word blocklist; docs whose "
        "blocked-token fraction exceeds --max-blocked-frac are dropped",
    )
    ap.add_argument("--max-blocked-frac", type=float, default=0.0)
    ap.add_argument(
        "--gopher",
        action="store_true",
        help="apply the full Gopher rule battery (word count, mean "
        "word length, symbol/bullet/ellipsis ratios, alpha ratio, "
        "stopword presence); keep only gopher_pass docs. The default "
        "battery is ENGLISH (Rae et al.) — on a Korean slice pass "
        "--gopher-lang ko or it drops every Korean doc",
    )
    ap.add_argument(
        "--gopher-lang",
        choices=("en", "ko", "any"),
        default=None,
        help="letter class + stopword list for --gopher (REQUIRED "
        "with --gopher — the old silent 'en' default dropped every "
        "Korean doc): en = Rae et al.'s English battery; ko = Unicode "
        "letters + Korean function words; any = Unicode letters, "
        "stopword rule off",
    )
    ap.add_argument(
        "--dsir-target",
        default="",
        help="target-domain documents table (parquet path or catalog "
        "table): keep the --dsir-keep docs with the highest Gumbel-"
        "perturbed DSIR log importance weight (importance resampling "
        "toward the target domain)",
    )
    ap.add_argument("--dsir-keep", type=int, default=0)
    ap.add_argument("--dsir-dim", type=int, default=4096,
                    help="hashed-ngram bucket count for the DSIR LMs")
    ap.add_argument("--dsir-seed", type=int, default=0)
    ap.add_argument(
        "--min-bigram-logprob",
        type=float,
        default=None,
        help="drop docs whose mean bigram log-prob under the corpus's "
        "own add-one LM falls below this floor (word-salad cut); "
        "docs too short to score (<2 tokens) are dropped too",
    )
    ap.add_argument(
        "--scrub-pii",
        action="store_true",
        help="redact emails / dashed phones / IPv4 in the output text",
    )
    ap.add_argument(
        "--normalize",
        action="store_true",
        help="NFC-normalize text before any hash-keyed stage",
    )
    ap.add_argument(
        "--decontam-input",
        default="",
        help="eval-set table: drop docs sharing n-gram shingles with it",
    )
    ap.add_argument(
        "--decontam-n",
        type=int,
        default=8,
        help="shingle width for decontamination (GPT-3 used 13)",
    )
    ap.add_argument(
        "--host-ranks",
        default="",
        help="host_ranks table from jobs/webgraph.py: drop docs whose "
        "url host ranks below --min-host-rank (unknown hosts kept)",
    )
    ap.add_argument("--min-host-rank", type=float, default=0.0)
    ap.add_argument(
        "--host-cap",
        type=int,
        default=0,
        help="keep at most this many docs per url host (0 = off); "
        "deterministic md5-rank selection, mega-host skew-safe",
    )
    args = ap.parse_args()
    if args.gopher and args.gopher_lang is None:
        ap.error(
            "--gopher requires --gopher-lang {en,ko,any} (the battery's "
            "language is an explicit decision: 'en' drops every "
            "pure-Korean document)"
        )

    from mecab_ko_lucene_analyzer_spark.plans import get_spark
    from mecab_ko_lucene_analyzer_spark.sources import read_table, write_table

    from pyspark.sql import Observation
    import pyspark.sql.functions as F

    spark = get_spark(app_name="curate")
    docs = read_table(spark, args.input)
    # output count rides the write action itself (Observation — exact
    # under retries, zero extra pass); input count comes from parquet
    # footers when the input is a parquet path (driver-side metadata
    # read, no job). Neither triggers a re-scan of either table.
    obs = Observation("curate_out")
    gopher_counts: dict = {}
    kept = curate(
        docs,
        dedup=args.dedup,
        fractions=parse_fractions(args.sample),
        default_fraction=args.default_fraction,
        min_common=args.min_common,
        hash_impl=args.hash_impl,
        span_window=args.span_window or None,
        max_dup_token_frac=args.max_dup_token_frac,
        max_dup_bigram_frac=args.max_dup_bigram_frac,
        max_top_token_frac=args.max_top_token_frac,
        blocklist=(
            [
                w.strip()
                for w in open(args.blocklist_file, encoding="utf-8")
                if w.strip()
            ]
            if args.blocklist_file
            else None
        ),
        max_blocked_frac=args.max_blocked_frac,
        gopher=args.gopher,
        gopher_lang=args.gopher_lang,
        gopher_counts=(gopher_counts if args.gopher else None),
        min_bigram_logprob=args.min_bigram_logprob,
        dsir_target=(
            read_table(spark, args.dsir_target) if args.dsir_target else None
        ),
        dsir_keep=args.dsir_keep,
        dsir_dim=args.dsir_dim,
        dsir_seed=args.dsir_seed,
        scrub=args.scrub_pii,
        eval_docs=(
            read_table(spark, args.decontam_input)
            if args.decontam_input
            else None
        ),
        decontam_n=args.decontam_n,
        normalize=args.normalize,
        host_ranks=(
            read_table(spark, args.host_ranks) if args.host_ranks else None
        ),
        min_host_rank=args.min_host_rank,
        host_cap=(args.host_cap or None),
    ).observe(obs, F.count(F.lit(1)).alias("n_out"))
    write_table(kept, args.output)
    n_out = obs.get["n_out"]
    n_in = footer_row_count(args.input)
    print(f"curated {n_in if n_in is not None else '?'} -> {n_out} docs "
          f"({args.dedup} dedup"
          + (f", sample {args.sample}" if args.sample else "") + ")")
    if gopher_counts:
        kills = ", ".join(
            f"{k.removeprefix('rule_')}={v}"
            for k, v in gopher_counts.items()
            if k != "gopher_pass"
        )
        print(
            f"gopher[{args.gopher_lang}] killed "
            f"{gopher_counts.get('gopher_pass', 0)} docs "
            f"(per-rule fails: {kills})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
