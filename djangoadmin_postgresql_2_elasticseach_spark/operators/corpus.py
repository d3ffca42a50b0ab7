"""Corpus-preparation operators — the document-side steps of a
training-data pipeline, composed from the engine's own primitives:

- ``chunk_documents``: split long docs into overlapping token-window
  chunks (the LLM-context-window shape). Native: sequence → posexplode →
  slice — one narrow explode, no Python, chunk count ∝ tokens/stride.
- ``scrub_pii``: mask emails / URLs / long digit runs with regexp_replace
  chains (JVM-side, inside whole-stage codegen) + per-doc match counts.
- ``clean_corpus``: the composed filter-and-dedup pass — language gate →
  quality gate → exact-dedup keep-lowest-id — one scan + one
  fingerprint shuffle, the same shapes the standalone queries use.

All three are oracle-checked (registry.py) — the SQL mirrors each
expression including evaluation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textstats import fingerprint, lang_id, quality_score
from ..plans.tuning import spread

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
NUM_RE = r"[0-9]{6,}"


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 50,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per overlapping token-window chunk:
    (id, chunk_idx, chunk_text, n_tokens).

    Stride = chunk_tokens − overlap; chunk i covers tokens
    [i·stride, i·stride + chunk_tokens). Whitespace tokenization
    (content-preserving — the analyzer chain is for matching, not for
    reconstructing text). Docs with no tokens produce no chunks.

    A chunk is emitted only when it contributes tokens beyond the
    previous chunk's overlap: starts run to ``n − overlap − 1`` (not
    ``n − 1``), else a short tail (e.g. n=45, chunk=50, overlap=10 →
    start 40) would be entirely contained in the previous chunk —
    duplicate training text as a distinct row. One chunk always exists
    for n ≤ chunk_tokens (the bound floors at 0).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = _ws_tokens(text_col)
    n = F.size(toks)
    starts = F.when(
        n > 0,
        F.sequence(
            F.lit(0), F.greatest(F.lit(0), n - overlap - 1), F.lit(stride)
        ),
    ).otherwise(F.array().cast("array<int>"))
    exploded = spread(docs.select(id_col, text_col)).select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(starts).alias("_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        (F.col("_start") / stride).cast("int").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mask emails → <EMAIL>, URLs → <URL>, ≥6-digit runs → <NUM>;
    count matches per doc. URL masking runs first so an email-looking
    userinfo inside a URL is counted once, as a URL."""
    c = F.col(text_col)
    n_urls = F.size(F.regexp_extract_all(c, F.lit(URL_RE), 0))
    after_url = F.regexp_replace(c, URL_RE, "<URL>")
    n_emails = F.size(F.regexp_extract_all(after_url, F.lit(EMAIL_RE), 0))
    after_email = F.regexp_replace(after_url, EMAIL_RE, "<EMAIL>")
    n_nums = F.size(F.regexp_extract_all(after_email, F.lit(NUM_RE), 0))
    clean = F.regexp_replace(after_email, NUM_RE, "<NUM>")
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_urls.cast("int").alias("n_urls"),
        n_emails.cast("int").alias("n_emails"),
        n_nums.cast("int").alias("n_nums"),
    )


def clean_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Composed corpus filter: keep `lang` docs with quality ≥ threshold,
    then exact-dedup keeping the lowest id per content fingerprint.

    Plan: one scan computes lang/quality/fingerprint columns SLIM —
    the text column is projected away before the dedup window, so the
    fp-keyed exchange moves (id, q, fp) triples, never document
    bodies (r10: the previous shape carried text through the window
    shuffle — corpus-body bytes on the wire for an exchange whose only
    job is picking keeper ids). The keeper pick is a rank-limit window
    (compiles to partial WindowGroupLimit: each map task forwards one
    candidate per fp before the exchange), evaluated once per doc —
    neither the groupBy-min+join-back form (scores twice) nor the
    carry-text form survives scale. Text is restored by ONE join of
    the keeper ids back into the raw scan; the keeper side is
    survivor-count-sized and AQE broadcasts it at real dup/gate rates.
    """
    keeper = clean_keeper_ids(docs, lang, min_quality, id_col, text_col)
    return docs.select(id_col, text_col).join(keeper, id_col)


def clean_keeper_ids(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The slim (id, quality_score) keeper set of clean_corpus — the
    gate form pipelines join ONCE against their own full-row frame
    (clean_corpus itself adds the text-restore join for standalone
    callers). Everything past the scan is body-free."""
    from pyspark.sql import Window

    scored = spread(docs.select(id_col, text_col)).select(
        F.col(id_col),
        lang_id(text_col).alias("lang_pred"),
        quality_score(text_col).alias("q"),
        fingerprint(text_col).alias("fp"),
    )
    kept = scored.filter(
        (F.col("lang_pred") == lang) & (F.col("q") >= min_quality)
    )
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("q").alias("quality_score"))
    )


def split_corpus(
    docs: DataFrame,
    val_pct: int = 10,
    test_pct: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash — the
    split survives re-runs, re-partitioning, and incremental appends
    (a doc's split never depends on what else is in the corpus).

    bucket = first 8 hex chars of md5(fingerprint-normalized text) mod
    100; [0, test) → test, [test, test+val) → val, rest → train.
    Hashing CONTENT (not id) keeps exact duplicates in the same split —
    no train/test leakage through dup pairs.
    """
    bucket = (
        F.conv(F.substring(fingerprint(text_col), 1, 8), 16, 10).cast("long")
        % 100
    )
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.select(
        F.col(id_col), bucket.cast("int").alias("bucket"), split.alias("split")
    )


def split_corpus_leakage_safe(
    docs: DataFrame,
    pairs: DataFrame,
    val_pct: int = 10,
    test_pct: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/val/test split that is leakage-safe across NEAR-duplicates:
    every member of a near-dup cluster (connected component of `pairs`,
    e.g. minhash_dedup_pairs output) lands in the SAME split — the
    dedup→split interaction Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better") flag: content-hash splitting
    co-places exact dups only, so a paraphrased/near-dup twin of a test
    document can still leak into train.

    Rule: singletons keep split_corpus's content-hash bucket
    byte-for-byte (the two operators agree outside clusters); cluster
    members inherit the bucket of the cluster REPRESENTATIVE's (min-id
    member's) content. If the representative's document is absent from
    `docs` (a `pairs` id with no docs row — e.g. pairs computed before a
    filter pass), the cluster deterministically falls back to the hash
    of the REP ID itself, so the whole cluster still lands in one split
    (ADVICE r5: the old behavior silently degraded each member to its
    own content bucket, breaking co-placement).

    Scale shape: the corpus is never self-joined. Bucket-from-own-text
    is a map-side projection over the scan; the override frame is
    (cluster members) ⨝ (representative texts) — both bounded by the
    dup population, tiny relative to the corpus at real dup rates, so
    AQE broadcasts the final left join. dedup_clusters is O(log n)
    star rounds on the pair graph only.
    """
    from .dedup import dedup_clusters

    clusters = dedup_clusters(pairs).select(
        F.col("doc_id").alias(id_col), F.col("cluster").alias("_rep")
    )

    def bucket_of(text: F.Column) -> F.Column:
        return (
            F.conv(F.substring(fingerprint(text), 1, 8), 16, 10).cast(
                "long"
            )
            % 100
        ).cast("int")

    rep_ids = clusters.select(F.col("_rep").alias("_rid")).distinct()
    rep_bucket = (
        docs.join(rep_ids, F.col(id_col) == F.col("_rid"))
        .select(
            F.col("_rid"), bucket_of(F.col(text_col)).alias("_rep_bucket")
        )
    )
    # rep doc missing from `docs` → deterministic id-hash bucket of the
    # rep id (shared by every member, so the cluster stays co-placed)
    rep_id_bucket = (
        F.conv(
            F.substring(F.md5(F.col("_rep").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    ).cast("int")
    overrides = clusters.join(
        rep_bucket, clusters["_rep"] == rep_bucket["_rid"], "left"
    ).select(
        id_col,
        "_rep",
        F.coalesce("_rep_bucket", rep_id_bucket).alias("_rep_bucket"),
    )

    base = docs.select(
        F.col(id_col), bucket_of(F.col(text_col)).alias("_own_bucket")
    )
    bucket = F.coalesce("_rep_bucket", "_own_bucket")
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return base.join(overrides, id_col, "left").select(
        F.col(id_col),
        F.coalesce("_rep", F.col(id_col)).alias("rep_id"),
        bucket.alias("bucket"),
        split.alias("split"),
    )


# previous invocation's materialized tf frame: the returned lazy tail
# reads it, so it can only be freed on the NEXT call (the registry's
# _PIPE_ASSEMBLY_PREV discipline; bounded at <=1 outstanding)
_TFIDF_TF_PREV: list = []


def tfidf_vectors(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed TF-IDF document vectors (the text → embedding bridge):
    term slots by md5-hash mod `dim` (feature hashing — no vocabulary
    build, no driver state), weight = tf · ln(1 + N/df), densified to a
    fixed-width array<double> that composes with the similarity
    operators (brute_force_topk / ivf_topk / embedding_neardup_*).

    Plan: explode → (doc, term) tf agg, materialized ONCE
    (localCheckpoint — the df branch and the weight branch both read
    it; left lazy, Spark re-ran the whole tokenize→explode→aggregate
    subtree for each, and exchange reuse does not fire across the
    broadcast boundary: 2 Generate nodes in the executed plan, r15
    measured ~0.74 s per duplicate evaluation at sf0.1) → broadcast
    df + N → per-slot sum → one map_from_entries per doc. No UDF.
    """
    from ..functions.text import tokenize
    from ..session import free_local_checkpoint

    toks = spread(docs.select(id_col, text_col)).select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("term")
    )
    while _TFIDF_TF_PREV:
        free_local_checkpoint(_TFIDF_TF_PREV.pop())
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    _TFIDF_TF_PREV.append(tf)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    slot = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long") % dim
    ).cast("int")
    w = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            slot.alias("slot"),
            (
                F.col("tf")
                * F.log(F.lit(1.0) + F.col("n_docs").cast("double") / F.col("df"))
            ).alias("w"),
        )
    )
    per_slot = w.groupBy(id_col, "slot").agg(F.round(F.sum("w"), 6).alias("wv"))
    return per_slot.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("slot", "wv"))).alias("_m")
    ).select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(F.element_at("_m", i.cast("int")), F.lit(0.0)),
        ).alias("tfidf"),
    )


def top_bigrams(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k token bigrams — the n-gram statistics pass of a
    language-modeling pipeline. One narrow explode + one count
    aggregation (map-side partial) + TakeOrderedAndProject; ties broken
    by the bigram string so the top-k is total-ordered.
    """
    from ..functions.text import token_bigrams, tokenize

    # tokens are PRE-PROJECTED before token_bigrams: inlining
    # tokenize() into the bigram lambda re-evaluates the full split per
    # element_at — O(tokens²) per doc (measured 7.2 s vs 0.7 s on the
    # sf0.1 corpus). The projection boundary survives CollapseProject
    # because the alias is referenced more than once.
    return (
        spread(docs.select(text_col))
        .select(tokenize(F.col(text_col)).alias("_w"))
        .select(F.explode(token_bigrams(F.col("_w"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("bigram"))
        .limit(k)
    )


def bigram_pmi(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    pmi = ln(N_uni · c(ab) / (c(a) · c(b))) over corpus token counts —
    the phrase-detection pass of an LM data pipeline.

    Plan: one token explode feeds BOTH the unigram count and (shifted by
    one) the bigram count; unigram counts are broadcast twice into the
    bigram frame (vocabulary ≪ corpus); min_count guards the PMI tail.
    """
    from ..functions.text import token_bigrams, tokenize

    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    base = spread(docs.select(text_col)).select(toks.alias("w"), n.alias("n"))
    base = base.localCheckpoint(eager=True)
    uni = (
        base.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grams = base.filter(F.col("n") >= 2).select(
        F.explode(token_bigrams(F.col("w"), as_struct=True)).alias("g")
    ).select(F.col("g.a").alias("a"), F.col("g.b").alias("b"))
    big = grams.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    total = uni.agg(F.sum("c").alias("n_uni"))
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b"))
    scored = (
        big.filter(F.col("c_ab") >= min_count)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log(
                    F.col("n_uni").cast("double")
                    * F.col("c_ab")
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.col("a"), F.col("b")).limit(k)


def repetition_stats(
    docs: DataFrame,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1 —
    the public repetition rules most LLM corpus pipelines apply):
    per-doc duplicate-line fraction and the token fraction covered by
    the single most frequent bigram, plus the keep/drop gate at the
    paper's thresholds (dup lines ≤ 0.30, top 2-gram ≤ 0.20).

    Plan: the line signal is a pure Column expression (no shuffle);
    the bigram signal is one narrow explode → (doc, bigram) count →
    per-doc max/sum — two partial-aggregated shuffles keyed by doc id,
    independent of corpus width. Output:
    (id, dup_line_frac, top_bigram_frac, keep).
    """
    from ..functions.text import token_bigrams, tokenize
    from ..functions.textstats import dup_line_fraction

    base = spread(docs.select(id_col, text_col))
    # pre-project the token array: inlining tokenize() into the bigram
    # lambda is O(tokens²) per doc (see top_bigrams)
    per_gram = (
        base.select(F.col(id_col), tokenize(text_col).alias("_w"))
        .select(
            F.col(id_col), F.explode(token_bigrams(F.col("_w"))).alias("bigram")
        )
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = per_gram.groupBy(id_col).agg(
        F.max("c").alias("_top"), F.sum("c").alias("_total")
    )
    lines = base.select(
        F.col(id_col), F.round(dup_line_fraction(text_col), 6).alias("dup_line_frac")
    )
    out = lines.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.col("dup_line_frac"),
        F.round(
            F.coalesce(F.col("_top") / F.col("_total"), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )
    return out.select(
        id_col,
        "dup_line_frac",
        "top_bigram_frac",
        (
            (F.col("dup_line_frac") <= max_dup_line_frac)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        ).alias("keep"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination by n-gram overlap — the standard
    train/test-leakage scrub (13-gram overlap is the published GPT-3 /
    Gopher convention): a training doc is contaminated when it shares
    any word n-gram with the benchmark corpus.

    Plan: shingle both sides (distinct per doc), equi-join on the
    shingle, count distinct overlapping shingles per training doc, left
    join back. The benchmark side is tiny relative to the corpus —
    its shingle set is broadcast, so the scan of the training corpus
    never shuffles. Output: (id, n_overlap, contaminated).

    ``tokens_col``: an already-tokenized array<string> column on
    ``docs`` to shingle instead of re-tokenizing ``text_col`` — lets
    CorpusPipeline share ONE materialized tokenize between this stage
    and near-dedup (the benchmark side always tokenizes itself; it is
    bounded by the benchmark's size, not the corpus).
    """
    overlap = contamination_overlap(
        docs, benchmark, n, id_col, text_col, tokens_col
    )
    return (
        docs.select(id_col)
        .join(overlap, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """The slim (id, n_overlap) frame of CONTAMINATED docs only — the
    gate form pipelines anti-join against their own full-row frame
    (decontaminate itself adds the all-docs left join so clean docs
    get an explicit n_overlap=0 row for reporting)."""
    from ..functions.text import tokenize, word_shingles_of

    # tokens pre-projected before shingling (see word_shingles_of:
    # the inline form is O(tokens²) per doc)
    if tokens_col is not None:
        d_toks = spread(docs.select(id_col, tokens_col)).select(
            F.col(id_col), F.col(tokens_col).alias("_w")
        )
    else:
        d_toks = spread(docs.select(id_col, text_col)).select(
            F.col(id_col), tokenize(text_col).alias("_w")
        )
    d = d_toks.select(
        F.col(id_col),
        F.explode(word_shingles_of(F.col("_w"), n)).alias("sh"),
    )
    b = (
        benchmark.select(tokenize(text_col).alias("_w"))
        .select(F.explode(word_shingles_of(F.col("_w"), n)).alias("sh"))
        .distinct()
    )
    return (
        d.join(F.broadcast(b), "sh")
        .groupBy(id_col)
        .agg(F.count_distinct("sh").alias("n_overlap"))
    )


def source_quota(
    docs: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source document quota: keep the k highest-quality docs per
    source — the domain-balancing step of corpus assembly (caps
    boilerplate-heavy domains from dominating the token budget).

    Window row_number PARTITIONED by source (never global — per-task
    state is one source's docs, AQE splits skewed sources), ordered by
    (quality desc, id) so the cut is total and engine-portable.
    Output: (id, source, quality_score, rnk) for kept docs.
    """
    from pyspark.sql import Window

    from ..functions.textstats import quality_score

    scored = spread(docs.select(id_col, source_col, text_col)).select(
        F.col(id_col),
        F.col(source_col),
        quality_score(text_col).alias("quality_score"),
    )
    w = Window.partitionBy(source_col).orderBy(
        F.desc("quality_score"), F.col(id_col)
    )
    return (
        scored.select(
            id_col,
            source_col,
            "quality_score",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


def sample_to_budget(
    docs: DataFrame,
    budget_tokens: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-stratum token-budget sampling — the corpus
    mixing step: keep documents per stratum (language/domain) until the
    stratum's whitespace-token budget is reached.

    Selection order is md5(id) — a content-independent deterministic
    shuffle, so the sample is stable across runs/partitioning and is
    unbiased w.r.t. document order. A doc is kept while the RUNNING
    total of tokens before it is under budget (so the budget may be
    exceeded by at most one document — the standard greedy cut).

    Plan: one window (cumulative sum) PARTITIONED by the stratum —
    per-task state is one stratum, never global; at 100 TB strata are
    the natural unit of corpus mixing so the partitioning is the one
    you already want. Output: (id, stratum, n_tokens, cum_before, kept).
    """
    from pyspark.sql import Window

    from ..functions.textstats import token_count

    scored = spread(docs.select(id_col, stratum_col, text_col)).select(
        F.col(id_col),
        F.col(stratum_col).alias("stratum"),
        token_count(text_col).cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_ord"),
    )
    w = (
        Window.partitionBy("stratum")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = scored.select(
        id_col,
        "stratum",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    return out.select(
        id_col,
        "stratum",
        "n_tokens",
        "cum_before",
        (F.col("cum_before") < budget_tokens).alias("kept"),
    )


def normalize_text(
    docs: DataFrame,
    form: str = "NFKC",
    casefold: bool = True,
    text_col: str = "text",
) -> DataFrame:
    """Unicode-normalize (and optionally casefold) the text column —
    the ingest step that removes the cross-engine case-mapping
    divergences documented in registry.py (Turkish dotted I, Greek
    final sigma, fullwidth forms, compatibility ligatures).

    Python's unicodedata is the reference implementation here, so this
    is a Pandas UDF (Arrow-batched — the one place in the text stack
    where Python is the correct tool, not a fallback); all downstream
    tokenization stays native."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _norm_fn(s):
        def f(x):
            if x is None:
                return None
            y = unicodedata.normalize(form, x)
            return y.casefold() if casefold else y

        return s.map(f)

    # set real (non-stringified) annotations — `from __future__ import
    # annotations` at module level would otherwise break pandas_udf's
    # signature inspection
    _norm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _norm = pandas_udf(_norm_fn, "string")

    return docs.withColumn(text_col, _norm(F.col(text_col)))


def corpus_stats(
    docs: DataFrame,
    strata: list[str] = ["source", "lang"],
    text_col: str = "text",
) -> DataFrame:
    """Dataset-card rollup: per stratum (source × language by default)
    doc counts, whitespace-token totals and distribution (exact p50/p90
    — `approx_percentile` is the documented 100 TB swap, same contract
    as event_value_percentiles), character totals, and each stratum's
    share of all corpus tokens — the numbers a training-mix decision
    (source_quota / sample_to_budget weights) is made from.

    One scan + one groupBy; the share divides by a 1-row grand total
    BROADCAST back onto the aggregated frame (|strata| rows — bounded
    by the source×lang domain) — no single-partition global window
    anywhere in the plan.

    Output: (*strata, n_docs, total_tokens, mean_tokens, p50_tokens,
    p90_tokens, total_chars, token_share), ordered by strata.
    """
    from ..functions.textstats import token_count

    per_doc = spread(docs.select(*strata, text_col)).select(
        *strata,
        token_count(text_col).alias("_tok"),
        F.length(text_col).alias("_chars"),
    )
    agg = per_doc.groupBy(*strata).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("total_tokens"),
        F.round(F.avg("_tok"), 6).alias("mean_tokens"),
        F.round(F.expr("percentile(_tok, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(_tok, 0.9)"), 6).alias("p90_tokens"),
        F.sum("_chars").alias("total_chars"),
    )
    grand = agg.agg(F.sum("total_tokens").alias("_grand"))
    return (
        agg.join(F.broadcast(grand))
        .withColumn(
            "token_share", F.round(F.col("total_tokens") / F.col("_grand"), 6)
        )
        .drop("_grand")
        .orderBy(*strata)
    )


def bigram_lm_logprob(
    docs: DataFrame,
    train: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff: float = 0.4,
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al., LREC 2020): score
    every document by its mean bigram log-probability under a count
    LM trained on ``train`` (default: the corpus itself), with stupid
    backoff smoothing (Brants et al., EMNLP 2007):

        p(b|a) = c(ab)/c(a)                     if c(ab) > 0
               = backoff · (c(b)+1)/(N+V)       otherwise
                 (add-one unigram so OOV tokens score finitely)

    ``avg_logprob`` is the mean ln p over the doc's bigrams — CCNet
    filters on perplexity = exp(−avg_logprob), a monotone transform, so
    thresholding this column is the same decision.

    Determinism across engines (the oracle hashes values): each ln is
    rounded to 6dp and cast to DECIMAL(20,6) BEFORE the per-doc sum, so
    the aggregation is exact integer arithmetic — order-independent,
    no float-summation divergence; the final divide/round runs on the
    exact sum. (Same ln-rounding contract as bigram_pmi.)

    Scale: unigram/bigram counts join back by key (shuffle on token /
    token-pair — the vocabulary of a 100 TB corpus does NOT broadcast);
    per-doc state is one decimal sum + count, no collected arrays. The
    LM tables are reusable artifacts — persist them once per corpus
    like the minhash/ANN indexes and amortize across scoring runs.
    """
    from ..functions.text import token_bigrams, tokenize

    train_base = spread((train if train is not None else docs).select(text_col)).select(
        tokenize(F.col(text_col)).alias("w")
    ).localCheckpoint(eager=True)
    uni = (
        train_base.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    totals = uni.agg(
        F.sum("c_uni").alias("n_tok"), F.count(F.lit(1)).alias("n_vocab")
    )
    big = (
        train_base.select(
            F.explode(token_bigrams(F.col("w"), as_struct=True)).alias("g")
        )
        .select(F.col("g.a").alias("a"), F.col("g.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    doc_bi = (
        spread(docs.select(id_col, text_col), [id_col])
        # pre-project the token array: inlining tokenize() into the
        # bigram lambda is O(tokens²) per doc (see top_bigrams)
        .select(F.col(id_col), tokenize(F.col(text_col)).alias("_w"))
        .select(
            F.col(id_col),
            F.explode(
                token_bigrams(F.col("_w"), as_struct=True)
            ).alias("g"),
        )
        .select(id_col, F.col("g.a").alias("a"), F.col("g.b").alias("b"))
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("c_uni").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c_uni").alias("c_b"))
    scored = (
        doc_bi.join(big, ["a", "b"], "left")
        .join(ua, "a", "left")
        .join(ub, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.when(
                F.col("c_ab").isNotNull() & F.col("c_a").isNotNull(),
                F.col("c_ab").cast("double") / F.col("c_a"),
            )
            .otherwise(
                F.lit(backoff)
                * (F.coalesce(F.col("c_b"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("n_tok") + F.col("n_vocab"))
            )
            .alias("p"),
        )
        .select(
            F.col(id_col),
            F.round(F.log("p"), 6).cast("decimal(20,6)").alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp").alias("_sum_lp"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round(
                F.col("_sum_lp").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_logprob"),
        )
    )


def source_mixture_weights(
    docs: DataFrame,
    alpha: float = 0.7,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-scaled source mixing weights: P(source) ∝ n_docs^α,
    normalized — the exponential-smoothing mix used by multilingual
    pretraining (mBERT's exponentially smoothed weighting; XLM-R,
    Conneau et al., ACL 2020). α < 1 up-samples small sources relative
    to their share; α = 1 is proportional sampling.

    One groupBy (|sources| rows) + a broadcast 1-row normalizer — the
    same bounded-aggregate shape as corpus_stats; pair the weights with
    sample_to_budget to materialize the mixed corpus.

    Output: (source, n_docs, raw_share, mix_weight), ordered by source.
    """
    # n^α rounded to 6dp and summed as DECIMAL: the normalizer is exact
    # integer arithmetic, so no float-summation order can nudge a weight
    # across its rounding boundary between engines (same contract as
    # bigram_lm_logprob's per-doc sum).
    powa = F.round(
        F.pow(F.col("n_docs").cast("double"), F.lit(alpha)), 6
    ).cast("decimal(30,6)")
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    ).select(source_col, "n_docs", powa.alias("_pa"))
    tot = counts.agg(
        F.sum("n_docs").alias("_n_total"), F.sum("_pa").alias("_z")
    )
    return (
        counts.join(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            F.round(F.col("n_docs") / F.col("_n_total"), 6).alias("raw_share"),
            F.round(
                F.col("_pa").cast("double") / F.col("_z").cast("double"), 6
            ).alias("mix_weight"),
        )
        .orderBy(source_col)
    )


def pack_sequences(
    docs: DataFrame,
    window_tokens: int = 512,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing: concatenate all documents (in a
    deterministic content-independent order) into one token stream and
    cut it into fixed ``window_tokens`` context windows; emit each
    document's span — which windows it lands in and at what global
    offset. This is the standard pretraining batch-assembly step
    (concatenate-and-chunk, as in GPT/LLaMA data loaders): a doc may
    straddle a window boundary, and short docs share windows instead of
    wasting pad tokens.

    Order is md5(id) (the same deterministic shuffle as
    ``sample_to_budget``) so packing is stable across runs and
    partitioning, and adjacent-document correlations are broken.

    Scale shape — NO global window over the corpus. A plain
    ``Window.orderBy`` without partitioning drags every row to one
    task; instead the cumulative offset is computed in two passes
    (the ``user_sessions_sliced`` trick applied to prefix sums):

    1. bucket docs by the first byte of the order key (256 uniform
       buckets); per-bucket cumulative sums run partitioned — bounded
       by corpus_size / 256 per task;
    2. per-bucket token totals (256 rows) get their own prefix sum on
       a tiny frame, then broadcast-join back as bucket base offsets.

    begin_offset = bucket_base + within_bucket_prefix, which equals the
    global prefix sum under (bucket, _ord, id) ordering — and because
    the bucket IS the leading hex prefix of ``_ord``, that equals
    ordering by (_ord, id) globally, which is exactly what the oracle
    computes with a single global window. Zero-token docs are dropped
    (they occupy no window).

    ``n_buckets`` rounds to a power of 16 (down, minimum 16 — the
    bucket is a hex prefix, so only 16^k bucket counts exist);
    correctness never depends on the count — only per-task slice size
    does.

    Output: (id, n_tokens, begin_offset, first_window, last_window,
    n_windows) where first/last_window = floor(begin / W) /
    floor((begin + n - 1) / W) and n_windows = last - first + 1.
    """
    return _pack_spans(docs, window_tokens, n_buckets, id_col, text_col,
                       carry_tokens=False)


def _ws_tokens(text_col: str):
    """Whitespace token array (the same split textstats.token_count
    sizes) — shared by chunk_documents and the packing operators so the
    tokenization cannot drift between them."""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")


def _pack_spans(
    docs: DataFrame,
    window_tokens: int,
    n_buckets: int,
    id_col: str,
    text_col: str,
    carry_tokens: bool,
) -> DataFrame:
    """pack_sequences core. With ``carry_tokens`` the token arrays ride
    along through the prefix-sum exchange (pack_windows consumes them
    directly — ONE scan + split of the corpus, no re-tokenize + join
    back); without it only (id, count) columns cross the shuffle."""
    from pyspark.sql import Window

    toks = spread(docs.select(id_col, text_col)).select(
        F.col(id_col),
        _ws_tokens(text_col).alias("_tk"),
        F.md5(F.col(id_col).cast("string")).alias("_ord"),
    )
    carry = ["_tk"] if carry_tokens else []
    n_hex = max(1, min(8, (n_buckets - 1).bit_length() // 4 or 1))
    scored = toks.select(
        F.col(id_col),
        F.size("_tk").cast("long").alias("n_tokens"),
        "_ord",
        F.conv(F.substring("_ord", 1, n_hex), 16, 10)
        .cast("long")
        .alias("_bucket"),
        *carry,
    ).filter(F.col("n_tokens") > 0)
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = scored.select(
        id_col,
        "n_tokens",
        "_bucket",
        F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)).alias("_cum_in"),
        *carry,
    )
    # 256-row frame: a single-partition window here is deliberate and
    # cheap (the frame is |buckets| rows regardless of corpus size)
    w_b = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    base = (
        scored.groupBy("_bucket")
        .agg(F.sum("n_tokens").alias("_btok"))
        .select(
            "_bucket",
            F.coalesce(F.sum("_btok").over(w_b), F.lit(0)).alias("_base"),
        )
    )
    packed = within.join(F.broadcast(base), "_bucket").select(
        id_col,
        "n_tokens",
        (F.col("_base") + F.col("_cum_in")).alias("begin_offset"),
        *carry,
    )
    # `div` = exact integer division on longs (no double rounding — the
    # same fix temporal.py:103 applied for offsets beyond 2^53)
    wt = int(window_tokens)
    first_w = F.expr(f"begin_offset div {wt}")
    last_w = F.expr(f"(begin_offset + n_tokens - 1) div {wt}")
    return packed.select(
        id_col,
        "n_tokens",
        "begin_offset",
        first_w.alias("first_window"),
        last_w.alias("last_window"),
        (last_w - first_w + F.lit(1).cast("long")).alias("n_windows"),
        *carry,
    )


def pack_windows(
    docs: DataFrame,
    window_tokens: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize the packed context windows ``pack_sequences`` maps —
    one row per window with its actual token text: the literal training
    sequences a GPT-style loader consumes (the final window may be
    partial).

    Composition: the packing core runs with ``carry_tokens`` so the
    token arrays ride the prefix-sum exchange (the corpus is scanned
    and whitespace-split exactly ONCE — no re-tokenize + join back);
    each doc is EXPLODED into (window, token-slice) pieces via
    F.sequence over its span (a doc emits ceil(n/W)+1 pieces at most —
    the explode is bounded and narrow), then one hash-aggregation per
    window reassembles pieces in stream order (array_sort on the unique
    begin_offset — no ties, total order). Two shuffles total: the
    packing prefix-sum exchange and the window aggregation — both on
    keys that are uniform by construction (md5 order → windows are
    equal-sized), so no skew at any scale.

    Output: (window_id, n_docs, n_tokens, text); every window except
    the last has exactly ``window_tokens`` tokens — an invariant the
    tests pin.
    """
    W = int(window_tokens)
    spans = _pack_spans(
        docs, W, 256, id_col, text_col, carry_tokens=True
    )
    pieces = (
        spans.select(
            "begin_offset",
            "n_tokens",
            "_tk",
            F.explode(
                F.sequence(F.col("first_window"), F.col("last_window"))
            ).alias("window_id"),
        )
        .select(
            "window_id",
            "begin_offset",
            # slice bounds are 1-based inclusive; piece = the part of
            # this doc's tokens that falls inside window_id
            F.slice(
                F.col("_tk"),
                F.greatest(
                    F.lit(1),
                    (F.col("window_id") * W - F.col("begin_offset") + 1).cast(
                        "int"
                    ),
                ),
                (
                    F.least(
                        F.col("n_tokens"),
                        (F.col("window_id") + 1) * W - F.col("begin_offset"),
                    )
                    - F.greatest(
                        F.lit(0), F.col("window_id") * W - F.col("begin_offset")
                    )
                ).cast("int"),
            ).alias("_piece"),
        )
    )
    return (
        pieces.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("_piece")).cast("long").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("begin_offset").alias("b"),
                                    F.col("_piece").alias("p"),
                                )
                            )
                        ),
                        lambda s: s["p"],
                    )
                ),
            ).alias("text"),
        )
        .orderBy("window_id")
    )


def quality_classifier_scores(
    docs: DataFrame,
    seed_pos: DataFrame,
    seed_neg: DataFrame,
    n_features: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style learned quality filter (the GPT-3 / PaLM corpus
    recipe: a linear classifier scores every document against a
    high-quality seed) as a hashed-feature Naive Bayes — pure DataFrame
    ops, no MLlib, so training AND scoring stay one oracle-able plan.

    Training: tokens of ``seed_pos``/``seed_neg`` hash into
    ``n_features`` buckets (the hashing trick; same md5-based hash as
    gram_hashes so the DuckDB oracle is bit-identical); per-feature
    add-one-smoothed multinomial counts give the log-likelihood ratio

        llr(f) = ln( (c_pos(f)+1)·(tot_neg+V) / ((c_neg(f)+1)·(tot_pos+V)) )

    with V = n_features. Scoring: a document's quality is the MEAN
    token llr (length-normalized, so verbosity isn't quality);
    ``llr_mean > 0`` reads "more positive-seed-like than negative".

    Determinism across engines (the oracle hashes values): each
    token's llr is one ln of a double ratio of exact integers, rounded
    to 6dp and cast DECIMAL(20,6) BEFORE the per-doc sum — the
    aggregation is exact integer arithmetic, order-independent (same
    contract as bigram_lm_logprob / bigram_pmi).

    Scale: the llr table is the FULL feature domain (spark.range —
    every token hits, no unseen-feature case) and is ``n_features``
    rows, so it broadcasts; the corpus-side plan is tokenize → hash →
    broadcast-join → partial-agg by doc — one shuffle on the doc id,
    nothing corpus-sized ever moves to the driver. Seed counting
    shuffles only (feature, count) pairs, bounded by ``n_features``
    after the map-side combine. Like the LM tables, the llr frame is a
    reusable artifact: persist it once per seed set and amortize.

    Output: (id, n_tokens, llr_mean) for EVERY input doc; token-less
    docs score 0.0.
    """
    from ..functions.text import tokenize

    nf = F.lit(n_features)

    def feat(tcol: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(tcol), 1, 8), 16, 10).cast("long")
            % n_features
        )

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            spread(df.select(text_col))
            .select(F.explode(tokenize(F.col(text_col))).alias("t"))
            .select(feat(F.col("t")).alias("f"))
            .groupBy("f")
            .agg(F.count(F.lit(1)).alias(out))
        )

    cp, cn = counts(seed_pos, "cp"), counts(seed_neg, "cn")
    spark = docs.sparkSession
    domain = spark.range(n_features).select(F.col("id").alias("f"))
    # every hashed feature lies in [0, n_features), so the seed totals
    # are sums OVER THE JOINED DOMAIN — a global window on n_features
    # rows — rather than separate aggs that would re-execute each
    # seed-count subtree (two extra seed scans)
    from pyspark.sql import Window

    w = Window.partitionBy()
    c_pos = F.coalesce(F.col("cp"), F.lit(0))
    c_neg = F.coalesce(F.col("cn"), F.lit(0))
    llr = (
        domain.join(cp, "f", "left")
        .join(cn, "f", "left")
        .select(
            "f",
            F.round(
                F.log(
                    (c_pos + 1).cast("double")
                    * (F.sum(c_neg).over(w) + nf).cast("double")
                    / (
                        (c_neg + 1).cast("double")
                        * (F.sum(c_pos).over(w) + nf).cast("double")
                    )
                ),
                6,
            )
            .cast("decimal(20,6)")
            .alias("llr"),
        )
    )
    # explode_outer keeps token-less docs as one NULL-feature row, so
    # scoring is ONE scan + one partial-agg shuffle on the doc id — no
    # second table scan and no docs-side assembly join (the NULL
    # feature finds no llr under the left join; count("f") skips it)
    return (
        spread(docs.select(id_col, text_col), [id_col])
        .select(
            F.col(id_col),
            F.explode_outer(tokenize(F.col(text_col))).alias("t"),
        )
        .select(
            id_col,
            F.when(F.col("t").isNotNull(), feat(F.col("t"))).alias("f"),
        )
        .join(F.broadcast(llr), "f", "left")
        .groupBy(id_col)
        .agg(F.count("f").alias("n_tokens"), F.sum("llr").alias("s"))
        .select(
            id_col,
            "n_tokens",
            F.coalesce(
                F.round(F.col("s").cast("double") / F.col("n_tokens"), 6),
                F.lit(0.0),
            ).alias("llr_mean"),
        )
    )


def importance_resample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    n_features: int = 1024,
    seed: int = 17,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): pick ``n`` documents from ``raw`` whose hashed-
    bigram feature distribution resembles ``target``, by Gumbel-top-k
    over per-document importance log-weights.

    Features are bigrams hashed into ``n_features`` buckets (the
    paper's hashed n-gram generative model; same md5 hash as
    quality_classifier_scores so the DuckDB oracle is bit-identical).
    With add-one smoothing over the bucket domain, each bucket's
    log-likelihood ratio is

        llr(f) = ln( (c_t(f)+1)·(tot_r+V) / ((c_r(f)+1)·(tot_t+V)) )

    and a document's importance log-weight is the SUM of llr over its
    bigram occurrences (the full log p_t(doc)/p_r(doc) under the
    unigram-over-features model — deliberately NOT length-normalized:
    resampling weighs whole documents, unlike the mean-llr quality
    score).

    Sampling without replacement is the Gumbel-top-k trick (Kool et
    al., ICML 2019; exactly the paper's resampling step): key_i =
    log w_i + g_i with g_i ~ Gumbel(0,1), take the n largest keys.
    ``g_i`` derives from a SEEDED md5 of the doc id — deterministic,
    reproducible, and portable to the oracle: u = (h+1)/(2³²+1) with
    h the first 8 md5 hex digits of "seed:doc_id", g = −ln(−ln u).

    Determinism across engines: llr is rounded to 6dp and cast
    DECIMAL(20,6) before the per-doc sum (exact integer aggregation,
    order-independent — the bigram_lm_logprob contract); the Gumbel
    key is rounded to 6dp with doc-id tiebreak.

    Output: (id, n_bigrams, log_w, sel_key), the selected ``n`` rows,
    ordered by sel_key desc then id.

    Scale: the llr table is the full n_features-row domain →
    broadcast; raw-side plan is tokenize → bigram → hash → broadcast-
    join → partial-agg by doc (ONE data-sized shuffle on the doc id);
    selection is orderBy+limit = TakeOrderedAndProject (per-partition
    top-n, no global sort). Target counting shuffles only (feature,
    count) pairs, bounded by n_features after map-side combine.

    Fit/apply split: `dsir_fit` builds the llr table (a PERSISTABLE
    n_features-row artifact — train once per target corpus, reuse
    across selection runs like the LM/minhash/ANN indexes) and
    `dsir_select` scores + Gumbel-samples against it; this function is
    their composition in one lazy plan.
    """
    # validate=False: dsir_fit covers the full hash domain by
    # construction (domain left-join), so the row-count check would
    # only re-execute the fit subtree — and would do so at PLAN-BUILD
    # time, before the caller ever runs the query. Skipping it keeps
    # the composition one fully-lazy plan.
    return dsir_select(
        raw,
        dsir_fit(raw, target, n_features=n_features, text_col=text_col),
        n=n,
        n_features=n_features,
        seed=seed,
        id_col=id_col,
        text_col=text_col,
        validate=False,
    )


def _dsir_feat(tcol: Column, n_features: int) -> Column:
    """md5-hash a bigram string into [0, n_features) — shared by fit
    and select so a persisted llr table stays valid."""
    return (
        F.conv(F.substring(F.md5(tcol), 1, 8), 16, 10).cast("long")
        % n_features
    )


def dsir_fit(
    raw: DataFrame,
    target: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """The DSIR importance model: (f, llr) over the FULL feature
    domain — add-one-smoothed log-likelihood ratio of target vs raw
    hashed-bigram distributions (see importance_resample). Persist
    this n_features-row frame once per target corpus and amortize it
    across dsir_select runs."""
    from ..functions.text import token_bigrams, tokenize

    nf = F.lit(n_features)

    def counts(df: DataFrame, out: str) -> DataFrame:
        # tokens pre-projected before token_bigrams — the inline form
        # re-evaluates tokenize() per lambda element, O(tokens²)/doc
        return (
            spread(df.select(text_col))
            .select(tokenize(F.col(text_col)).alias("_w"))
            .select(F.explode(token_bigrams(F.col("_w"))).alias("g"))
            .select(_dsir_feat(F.col("g"), n_features).alias("f"))
            .groupBy("f")
            .agg(F.count(F.lit(1)).alias(out))
        )

    ct, cr = counts(target, "ct"), counts(raw, "cr")
    spark = raw.sparkSession
    domain = spark.range(n_features).select(F.col("id").alias("f"))
    # totals as a window over the joined n_features-row domain — one
    # pass, no re-execution of the count subtrees (the
    # quality_classifier_scores pattern)
    from pyspark.sql import Window

    w = Window.partitionBy()
    c_t = F.coalesce(F.col("ct"), F.lit(0))
    c_r = F.coalesce(F.col("cr"), F.lit(0))
    return (
        domain.join(ct, "f", "left")
        .join(cr, "f", "left")
        .select(
            "f",
            F.round(
                F.log(
                    (c_t + 1).cast("double")
                    * (F.sum(c_r).over(w) + nf).cast("double")
                    / (
                        (c_r + 1).cast("double")
                        * (F.sum(c_t).over(w) + nf).cast("double")
                    )
                ),
                6,
            )
            .cast("decimal(20,6)")
            .alias("llr"),
        )
    )


def dsir_select(
    raw: DataFrame,
    llr: DataFrame,
    n: int,
    n_features: int = 1024,
    seed: int = 17,
    id_col: str = "doc_id",
    text_col: str = "text",
    validate: bool = True,
) -> DataFrame:
    """Score ``raw`` against a fitted llr table (dsir_fit — possibly
    read back from parquet) and take the Gumbel-top-``n``. One
    data-sized shuffle (partial agg on the doc id); the llr table
    broadcasts.

    ``n_features`` MUST equal the fit-time value: the hash domain is
    baked into the artifact, and a mismatch silently drops llr terms
    (NULLs under the left join). Validated against the artifact's row
    count; the artifact is localCheckpoint'd FIRST so the one
    execution feeds both the count and the broadcast join — an
    unmaterialized fit plan (bigram scans of both corpora) would
    otherwise run twice. ``validate=False`` skips both (used by
    importance_resample, whose in-process dsir_fit output is
    full-domain by construction — keeps that composition lazy)."""
    from ..functions.text import token_bigrams, tokenize

    if validate:
        # materialize once: the count below and the broadcast join in
        # the scoring plan both read the checkpointed n_features-row
        # result instead of re-running the fit/scan subtree
        llr = llr.localCheckpoint()
        n_rows = llr.count()
        if n_rows != n_features:
            raise ValueError(
                f"llr table has {n_rows} rows but n_features="
                f"{n_features}: the selector must use the SAME feature "
                "count the table was fitted with (dsir_fit covers the "
                "full hash domain)"
            )

    # explode_outer keeps bigram-less docs eligible (log_w = 0, their
    # Gumbel noise alone decides) — one scan, one partial-agg shuffle
    scored = (
        spread(raw.select(id_col, text_col), [id_col])
        .select(F.col(id_col), tokenize(F.col(text_col)).alias("_w"))
        .select(
            F.col(id_col),
            F.explode_outer(token_bigrams(F.col("_w"))).alias("g"),
        )
        .select(
            id_col,
            F.when(
                F.col("g").isNotNull(), _dsir_feat(F.col("g"), n_features)
            ).alias("f"),
        )
        .join(F.broadcast(llr), "f", "left")
        .groupBy(id_col)
        .agg(F.count("f").alias("n_bigrams"), F.sum("llr").alias("_s"))
    )
    # seeded Gumbel noise from the doc id: u in (0,1) strictly, so
    # -ln(-ln u) is finite on every row
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967297.0)
    gumbel = -F.log(-F.log(u))
    log_w = F.coalesce(F.col("_s").cast("double"), F.lit(0.0))
    return (
        scored.select(
            id_col,
            "n_bigrams",
            F.round(log_w, 6).alias("log_w"),
            F.round(log_w + gumbel, 6).alias("sel_key"),
        )
        .orderBy(F.desc("sel_key"), F.asc(id_col))
        .limit(n)
    )


def _coverage_curve(counts: DataFrame, v: int) -> DataFrame:
    """The head/rank/cumsum tail of vocab_coverage over ANY (token, n)
    frame — shared by the one-shot scan and the persisted-artifact read
    path so the two can never drift. Grand total rides a broadcast
    1-row join; head is TakeOrderedAndProject; the window runs over the
    v-row RESULT only."""
    from pyspark.sql import Window

    tot = counts.agg(F.sum("n").alias("_total"))
    head = (
        counts.join(F.broadcast(tot))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(v)
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        head.select(
            F.row_number().over(w).alias("rank"),
            "token",
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("coverage"),
            F.round(
                F.sum("n").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("_total"),
                6,
            ).alias("cum_coverage"),
        )
        .orderBy("rank")
    )


def vocab_coverage(
    docs: DataFrame,
    v: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage curve: the top-``v`` corpus tokens by
    frequency with each prefix's cumulative share of ALL token
    occurrences — the "what does a V-entry vocab buy me" number a
    tokenizer/vocab-size decision is made from (the token-frequency
    analogue of BPE merge-table sizing).

    Output: (rank, token, n, coverage, cum_coverage) ordered by rank;
    ties break on the token string so the curve is total-ordered.

    Scale: token counting is ONE groupBy(token) with map-side combine
    (the vocabulary shuffles, never the corpus); the grand total rides
    a broadcast 1-row join; the head is TakeOrderedAndProject and the
    rank/cumsum window runs over the ``v``-row RESULT — a constant-
    size frame, never the vocabulary (same bounded-window contract as
    key_skew_profile).

    Incremental form: build_token_count_index persists the (token, n)
    partials once at ingest; per-tick upkeep appends only the BATCH's
    partial counts (O(delta)) and vocab_coverage_from_index reads the
    curve without ever re-tokenizing the corpus.
    """
    from ..functions.text import tokenize

    counts = (
        spread(docs.select(text_col))
        .select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _coverage_curve(counts, v)


def _token_partials(
    docs: DataFrame, text_col: str, tokens_col: str | None = None
) -> DataFrame:
    """(token, n) partial counts of one corpus slice — the mergeable
    unit of the token-count artifact (counts are additive, so slices
    merge by SUM: the incremental_rollup mergeable-partials contract).
    ``tokens_col``: an already-materialized tokenize() column to
    explode instead of re-tokenizing the bodies (the shared-token-frame
    contract, CorpusPipeline.run_and_maintain)."""
    from ..functions.text import tokenize

    if tokens_col is not None:
        toks = spread(docs.select(tokens_col)).select(
            F.explode(F.col(tokens_col)).alias("token")
        )
    else:
        toks = spread(docs.select(text_col)).select(
            F.explode(tokenize(F.col(text_col))).alias("token")
        )
    return toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))


def build_token_count_index(
    docs: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Persist the corpus token-count table — the vocab_coverage
    artifact (the minhash-index pattern, dedup.build_minhash_index:
    tokenize once at ingest, amortize across every later audit read).
    Rows are (token, n) partials; readers merge by SUM, so upkeep can
    APPEND batch partials instead of rewriting the vocabulary."""
    _token_partials(docs, text_col).write.mode("overwrite").parquet(path)


def append_token_count_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    tokens_col: str | None = None,
) -> None:
    """Tick upkeep: append ONE batch's token partials. Cost is
    O(batch) — one explode + groupBy over the delta, no corpus rescan,
    no vocabulary rewrite. The artifact accumulates one partial row
    per (batch, token); compact_token_count_index folds them when the
    file count grows. ``tokens_col``: reuse a materialized token frame
    instead of re-tokenizing (run_and_maintain's one-pass upkeep)."""
    _token_partials(new_docs, text_col, tokens_col).write.mode(
        "append"
    ).parquet(path)

    from ..plans.tuning import invalidate_spread_cache

    invalidate_spread_cache(new_docs.sparkSession)


def compact_token_count_index(spark: SparkSession, path: str) -> None:
    """Fold accumulated per-batch partials into one row per token —
    periodic maintenance, not correctness (readers SUM anyway). Plain
    overwrite-after-read: the same single-writer contract as the
    minhash index rebuild."""
    merged = (
        spark.read.parquet(path).groupBy("token").agg(F.sum("n").alias("n"))
    )
    # parquet overwrite of the input path needs a materialized copy
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)


def vocab_coverage_from_index(
    spark: SparkSession, path: str, v: int = 1000
) -> DataFrame:
    """The vocab_coverage curve served from the persisted artifact:
    merge the stored partials (vocabulary-sized — the corpus is never
    touched) and run the SAME _coverage_curve tail as the one-shot
    scan. N appends == one-shot rebuild, exactly (counts are
    additive)."""
    counts = (
        spark.read.parquet(path).groupBy("token").agg(F.sum("n").alias("n"))
    )
    return _coverage_curve(counts, v)


def shingle_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    word n-grams that appear in no other document — low novelty flags
    boilerplate/template text that near-dup thresholds miss (the gram
    population is shared piecewise across many docs without any single
    pair being near-identical).

    Output: (id, n_shingles, n_novel, novelty) for every doc;
    shingle-less docs get novelty 1.0 (vacuously novel).

    Scale: one shingle explode (distinct per doc by construction) →
    gram document-frequency via ONE groupBy(shingle) partial agg —
    the gram vocabulary shuffles, never the corpus bodies — → join
    back on the shingle and per-doc count. The same inverted-index
    shape as decontaminate, self-referential instead of vs a
    benchmark; the gram DF table is NOT broadcast (corpus-sized gram
    domains don't fit — the equi-join shuffles both sides on the
    gram key, AQE-coalesced).

    The (id, shingle) frame is referenced twice (DF count + join
    back) with DIFFERENT shuffle payloads, so no ReusedExchange is
    possible — it is localCheckpointed once (measured 2.0→1.4 s at
    sf0.1; the bigram_pmi trade: linear storage for the exploded
    frame instead of re-running the tokenize+shingle scan).
    """
    from ..functions.text import tokenize, word_shingles_of

    sh = (
        spread(docs.select(id_col, text_col), [id_col])
        .select(F.col(id_col), tokenize(F.col(text_col)).alias("_w"))
        .select(
            F.col(id_col),
            F.explode(word_shingles_of(F.col("_w"), n)).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        sh.join(df_counts, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
    )
    return _novelty_from_shingles(docs.select(id_col), sh, id_col)


def _novelty_from_shingles(
    doc_ids: DataFrame, sh: DataFrame, id_col: str
) -> DataFrame:
    """The DF-count + join-back + per-doc tail of shingle_novelty over
    ANY (id, sh) frame — shared by the one-shot scan and the persisted
    shingle-index read path so the two can never drift."""
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        sh.join(df_counts, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
    )
    return (
        doc_ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles"),
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
            F.coalesce(
                F.round(F.col("n_novel") / F.col("n_shingles"), 6),
                F.lit(1.0),
            ).alias("novelty"),
        )
    )


def _doc_shingles(
    docs: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, sh) distinct word n-grams of one corpus slice — the
    append-only unit of the shingle index (per-doc distinct shingles
    are independent across docs, so slices just concatenate).
    ``tokens_col``: shingle an already-materialized tokenize() column
    instead of re-tokenizing the bodies (run_and_maintain)."""
    from ..functions.text import tokenize, word_shingles_of

    if tokens_col is not None:
        base = spread(docs.select(id_col, tokens_col), [id_col]).select(
            F.col(id_col), F.col(tokens_col).alias("_w")
        )
    else:
        base = spread(docs.select(id_col, text_col), [id_col]).select(
            F.col(id_col), tokenize(F.col(text_col)).alias("_w")
        )
    return base.select(
        F.col(id_col),
        F.explode(word_shingles_of(F.col("_w"), n)).alias("sh"),
    )


def build_shingle_index(
    docs: DataFrame,
    path: str,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the exploded (id, shingle) frame — the shingle_novelty
    artifact (the minhash-index pattern: shingle once at ingest,
    amortize across audit runs). Per-doc rows are independent, so tick
    upkeep is a pure APPEND of the batch's shingles — O(delta), no
    corpus re-shingle ever."""
    _doc_shingles(docs, n, id_col, text_col).write.mode(
        "overwrite"
    ).parquet(path)


def append_shingle_index(
    new_docs: DataFrame,
    path: str,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> None:
    """Tick upkeep: append ONE batch's (id, shingle) rows. ``n`` MUST
    match build time (shingle width is baked into the artifact).
    ``tokens_col``: reuse a materialized token frame instead of
    re-tokenizing (run_and_maintain's one-pass upkeep)."""
    _doc_shingles(new_docs, n, id_col, text_col, tokens_col).write.mode(
        "append"
    ).parquet(path)

    from ..plans.tuning import invalidate_spread_cache

    invalidate_spread_cache(new_docs.sparkSession)


def compact_shingle_index(spark: SparkSession, path: str) -> tuple[int, int]:
    """Fold the per-tick small files of the shingle index — periodic
    maintenance, not correctness (rows are already one per (doc,
    shingle); unlike the token-count index there is nothing to
    value-fold, only files to merge). Delegates to the atomic
    temp-dir + rename-swap rewrite in ``sources/writers.compact_parquet``
    so a crash mid-compaction never loses the index (the txlog
    ``tx_compact`` is the alternative when the index lives in a
    transactional table). Returns (files_before, files_after). Same
    single-writer contract as every index maintenance pass: don't run
    concurrently with an append tick."""
    from ..sources.writers import compact_parquet

    return compact_parquet(spark, path)


def shingle_novelty_from_index(
    spark: SparkSession,
    doc_ids: DataFrame,
    path: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """shingle_novelty served from the persisted index: gram DF and the
    join-back run over the STORED (id, sh) rows — the corpus bodies are
    never re-tokenized. ``doc_ids`` supplies the doc universe (ids with
    no indexed shingles surface as vacuously novel, same as the
    one-shot form). N appends == one-shot rebuild, exactly. Unlike the
    one-shot scan there is nothing to localCheckpoint: both references
    re-read the slim parquet index, not a tokenize plan."""
    sh = spark.read.parquet(path).select(F.col(id_col), F.col("sh"))
    return _novelty_from_shingles(doc_ids.select(id_col), sh, id_col)


def weighted_sample(
    docs: DataFrame,
    n: int,
    weight_col: str,
    seed: int = 29,
    strata: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis & Spirakis
    (IPL 2006) via the equivalent Gumbel-top-k formulation (Kool et
    al., ICML 2019): key_i = ln(w_i) + Gumbel(0,1), keep the n largest
    keys; inclusion probabilities are exactly the E-S successive-
    sampling ones. This is how a source-mixture decision
    (source_mixture_weights) MATERIALIZES into a mixed corpus: weight
    each doc by its source's mix weight (or by length, quality, …)
    and sample.

    Seeded md5 Gumbel noise per doc id — deterministic, reproducible,
    oracle-portable (the DSIR construction: u = (h+1)/(2³²+1), g =
    −ln(−ln u)). Rows with NULL or non-positive weight are EXCLUDED
    (ln undefined — the E-S contract).

    With ``strata``, the top-n is PER STRATUM (row_number over the
    stratum partition — bounded per-key state, the source_quota
    shape); without, a global TakeOrderedAndProject top-n.

    Output: (*strata?, id, weight, sel_key) ordered by sel_key desc
    within stratum (or globally), id tiebreak.
    """
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967297.0)
    gumbel = -F.log(-F.log(u))
    # NaN guard: Spark orders NaN ABOVE every number, so 'NaN > 0' is
    # true and a NaN sel_key would sort first and hijack the sample
    keyed = docs.filter(
        w.isNotNull() & ~F.isnan(w) & (w > 0)
    ).select(
        *(strata or []),
        F.col(id_col),
        w.alias("weight"),
        F.round(F.log(w) + gumbel, 6).alias("sel_key"),
    )
    if strata:
        part = Window.partitionBy(*strata).orderBy(
            F.desc("sel_key"), F.asc(id_col)
        )
        return (
            keyed.withColumn("_rn", F.row_number().over(part))
            .filter(F.col("_rn") <= n)
            .drop("_rn")
            .orderBy(*strata, F.desc("sel_key"), F.asc(id_col))
        )
    return keyed.orderBy(F.desc("sel_key"), F.asc(id_col)).limit(n)
