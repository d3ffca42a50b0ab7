"""Corpus-preparation operators: chunk boundaries, PII masking, and the
composed clean pass — semantics the homogeneous synthetic corpus cannot
discriminate (the oracle parity covers engine-equality; these pin the
behaviors)."""

from __future__ import annotations

import pytest


def test_chunk_documents_windows(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import chunk_documents

    words = [f"w{i}" for i in range(12)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "short doc"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(docs, chunk_tokens=5, overlap=2).collect()
    }
    # doc 1: stride 3 → starts 0,3,6,9 → 4 chunks
    assert [k for k in out if k[0] == 1] == [(1, 0), (1, 1), (1, 2), (1, 3)]
    assert out[(1, 0)]["chunk_text"] == "w0 w1 w2 w3 w4"
    assert out[(1, 1)]["chunk_text"] == "w3 w4 w5 w6 w7"  # 2-token overlap
    assert out[(1, 3)]["chunk_text"] == "w9 w10 w11"  # trailing partial
    assert out[(1, 3)]["n_tokens"] == 3
    # doc 2 fits one chunk; empty doc 3 emits nothing
    assert out[(2, 0)]["chunk_text"] == "short doc"
    assert not [k for k in out if k[0] == 3]
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=5, overlap=5)


def test_scrub_pii_masking(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "see https://example.com/a?b=c and card 1234567890"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[1]["clean_text"] == "mail <EMAIL> now"
    assert out[1]["n_emails"] == 1
    assert out[2]["clean_text"] == "see <URL> and card <NUM>"
    assert out[2]["n_urls"] == 1 and out[2]["n_nums"] == 1
    assert out[3]["clean_text"] == "clean text only"
    assert (out[3]["n_urls"], out[3]["n_emails"], out[3]["n_nums"]) == (0, 0, 0)


def test_clean_corpus_gates_and_dedup(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import clean_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "into the quiet forest before the rain starts to fall"
    )
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "и в не что он на я с как а то все она так его но да ты"),  # ru
            (3, "x" * 40),  # low quality: 1 word, no stopwords
            (4, good),  # exact dup of 1 → dropped (keep lowest id)
            (5, good + " extra tail words here"),  # near-dup but distinct fp
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"]: r for r in clean_corpus(docs).collect()}
    assert set(kept) == {1, 5}
    assert kept[1]["quality_score"] >= 0.6


def test_split_corpus_content_deterministic(spark):
    """Same content → same split regardless of id (dup-leakage guard);
    percentages partition the bucket space."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import split_corpus

    docs = spark.createDataFrame(
        [(1, "the same text"), (2, "THE  same   text "), (3, "different entirely")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in split_corpus(docs).collect()}
    # fingerprint normalizes case+whitespace: 1 and 2 land identically
    assert out[1]["bucket"] == out[2]["bucket"]
    assert out[1]["split"] == out[2]["split"]
    for r in out.values():
        assert 0 <= r["bucket"] < 100
        assert r["split"] in {"train", "val", "test"}
        expected = "test" if r["bucket"] < 10 else ("val" if r["bucket"] < 20 else "train")
        assert r["split"] == expected


def test_tfidf_vectors_compose_with_ann(spark):
    """Hashed TF-IDF properties: fixed width, rare terms weigh more than
    common ones, and the output feeds the ANN operator directly."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import tfidf_vectors
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import brute_force_topk

    docs = spark.createDataFrame(
        [
            (1, "common common rare"),
            (2, "common common common"),
            (3, "common unrelated words"),
        ],
        "doc_id long, text string",
    )
    vecs = {r["doc_id"]: r["tfidf"] for r in tfidf_vectors(docs, dim=32).collect()}
    assert all(len(v) == 32 for v in vecs.values())
    # 'rare' (df=1) must out-weigh a single 'common' (df=3) occurrence
    import hashlib

    def slot(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % 32

    assert vecs[1][slot("rare")] > vecs[1][slot("common")] / 2  # tf=2 for common
    emb = tfidf_vectors(docs, dim=32).withColumnRenamed("doc_id", "vec_id").withColumnRenamed("tfidf", "embedding")
    top = brute_force_topk(emb, [float(x) for x in vecs[1]], k=1).collect()
    assert top[0]["vec_id"] == 1 and top[0]["cos_sim"] == 1.0


def test_chunk_reconstruction_property(spark):
    """Dropping each chunk's overlap prefix (except the first) and
    concatenating reproduces the original token stream exactly."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import chunk_documents

    text = " ".join(f"t{i}" for i in range(137))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        chunk_documents(docs, chunk_tokens=50, overlap=10).collect(),
        key=lambda r: r["chunk_idx"],
    )
    rebuilt = chunks[0]["chunk_text"].split()
    for c in chunks[1:]:
        rebuilt.extend(c["chunk_text"].split()[10:])
    assert rebuilt == text.split()


def test_training_pipeline_end_to_end(spark):
    """The composed flow a training-data user runs: clean -> scrub ->
    chunk -> vectorize -> split; every stage feeds the next and the
    output is ready for similarity search."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        chunk_documents,
        clean_corpus,
        scrub_pii,
        split_corpus,
        tfidf_vectors,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import brute_force_topk

    good = (
        "the quick brown fox jumps over the lazy dog and then runs into "
        "the quiet forest before the rain starts to fall on the hills"
    )
    raw = spark.createDataFrame(
        [
            (1, good + " contact me at a.b@example.com for more"),
            (2, good + " contact me at a.b@example.com for more"),  # dup
            (3, "и в не что он на я с как а то все она так его но да"),
            (4, good + " but this one is a different document entirely"),
        ],
        "doc_id long, text string",
    )
    cleaned = clean_corpus(raw)
    scrubbed = scrub_pii(cleaned, text_col="text").withColumnRenamed(
        "clean_text", "text"
    )
    assert {r["doc_id"] for r in scrubbed.collect()} == {1, 4}
    assert all("@" not in r["text"] for r in scrubbed.collect())
    chunks = chunk_documents(scrubbed, chunk_tokens=12, overlap=4)
    ch = chunks.collect()
    assert ch and all(r["n_tokens"] <= 12 for r in ch)
    # vectorize chunks (chunk id = doc_id*1000 + chunk_idx), then search
    from pyspark.sql import functions as F

    chunk_docs = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    vecs = tfidf_vectors(chunk_docs, dim=32)
    emb = vecs.withColumnRenamed("doc_id", "vec_id").withColumnRenamed(
        "tfidf", "embedding"
    )
    probe = vecs.filter(F.col("doc_id") == 1000).collect()[0]["tfidf"]
    top = brute_force_topk(emb, [float(x) for x in probe], k=1).collect()
    assert top[0]["vec_id"] == 1000
    splits = split_corpus(chunk_docs)
    assert {r["split"] for r in splits.collect()} <= {"train", "val", "test"}


def test_chunk_tail_contained_in_previous_not_emitted(spark):
    """n=45, chunk=50, overlap=10: the old start grid emitted start 40,
    whose chunk [41..45] is entirely inside chunk 0 — duplicate training
    text. The start bound n-overlap-1 emits exactly one chunk."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(45)))], "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_tokens=50, overlap=10).collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 45
    # and a tail that DOES contribute new tokens is still emitted
    docs2 = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(51)))], "doc_id long, text string"
    )
    rows2 = sorted(
        chunk_documents(docs2, chunk_tokens=50, overlap=10).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["n_tokens"] for r in rows2] == [50, 11]


def test_repetition_stats_flags_repeats(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import repetition_stats

    clean = " ".join(f"word{i}" for i in range(40))
    spammy = "buy now " * 30                      # one bigram dominates
    dup_lines = "\n".join(["same line here"] * 8 + ["unique one"])
    docs = spark.createDataFrame(
        [(1, clean), (2, spammy.strip()), (3, dup_lines)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert rows[1]["keep"] and rows[1]["dup_line_frac"] == 0.0
    assert not rows[2]["keep"] and rows[2]["top_bigram_frac"] > 0.2
    assert not rows[3]["keep"] and rows[3]["dup_line_frac"] > 0.3


def test_decontaminate_flags_overlap(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import decontaminate

    bench_text = " ".join(f"b{i}" for i in range(20))
    # doc 2 embeds a full 13-gram run of the benchmark; doc 1 shares none
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"x{i}" for i in range(30))),
            (2, "prefix " + " ".join(f"b{i}" for i in range(13)) + " suffix"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame([(99, bench_text)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in decontaminate(docs, benchmark, n=13).collect()}
    assert not rows[1]["contaminated"] and rows[1]["n_overlap"] == 0
    assert rows[2]["contaminated"] and rows[2]["n_overlap"] == 1


def test_source_quota_caps_per_source(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import source_quota

    good = ("this is a reasonably long and clean document that with luck "
            "passes all of the quality gates because it has many words")
    docs = spark.createDataFrame(
        [(i, "srcA" if i < 6 else "srcB", good + f" tail{i}") for i in range(9)],
        "doc_id long, source string, text string",
    )
    out = source_quota(docs, k=2).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r["source"], []).append(r["doc_id"])
    # equal quality everywhere → id ascending wins within each source
    assert sorted(per_src["srcA"]) == [0, 1]
    assert sorted(per_src["srcB"]) == [6, 7]


def test_dedup_clusters_transitive(spark):
    """a-b and b-c pairs (without a-c) must land in ONE cluster labeled
    by the min id — the transitivity the pairwise output lacks. Two
    separate components must stay separate."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert {rows[i]["cluster"] for i in (1, 2, 3)} == {1}
    assert rows[1]["cluster_size"] == 3
    assert rows[10]["cluster"] == rows[11]["cluster"] == 10
    assert rows[10]["cluster_size"] == 2
    # a longer chain exercises multi-round propagation (diameter 5)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(20, 25)], "id_a long, id_b long"
    )
    crows = dedup_clusters(chain).collect()
    assert {r["cluster"] for r in crows} == {20}
    assert all(r["cluster_size"] == 6 for r in crows)


def test_sample_to_budget_deterministic_cut(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import sample_to_budget

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "ru", " ".join(["w"] * 10)) for i in range(10)],
        "doc_id long, lang string, text string",
    )
    out = sample_to_budget(docs, budget_tokens=25).collect()
    kept = {r["doc_id"] for r in out if r["kept"]}
    # each stratum has 5 docs x 10 tokens; budget 25 → exactly 3 kept per
    # stratum (cum_before of the 3rd is 20 < 25, of the 4th is 30)
    by_stratum = {}
    for r in out:
        if r["kept"]:
            by_stratum.setdefault(r["stratum"], 0)
            by_stratum[r["stratum"]] += 1
    assert by_stratum == {"en": 3, "ru": 3}
    # deterministic: same input → same kept set
    again = {r["doc_id"] for r in sample_to_budget(docs, budget_tokens=25).collect() if r["kept"]}
    assert again == kept


def test_assembly_pipeline_end_to_end(spark):
    """The round-2 assembly flow on top of the cleaning flow: repetition
    gate -> decontaminate vs a benchmark -> near-dup clusters pick
    keepers -> per-source quota -> token-budget sample. Every stage
    feeds the next; the surviving set is exactly the docs that pass
    every gate."""
    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        decontaminate,
        repetition_stats,
        sample_to_budget,
        source_quota,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    bench_text = " ".join(f"secret{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, "srcA", base + " one"),
            (2, "srcA", base + " two"),                       # near-dup of 1
            (3, "srcA", "spam " * 40),                        # repetition-gated
            (4, "srcB", base + " " + bench_text),             # contaminated
            (5, "srcB", " ".join(f"tok{i}" for i in range(20))),
        ],
        "doc_id long, source string, text string",
    )
    benchmark = spark.createDataFrame([(0, bench_text)], "doc_id long, text string")

    rep = repetition_stats(docs)
    kept1 = docs.join(rep.filter(F.col("keep")).select("doc_id"), "doc_id")
    assert {r["doc_id"] for r in kept1.select("doc_id").collect()} == {1, 2, 4, 5}

    cont = decontaminate(kept1, benchmark, n=13)
    kept2 = kept1.join(
        cont.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    assert {r["doc_id"] for r in kept2.select("doc_id").collect()} == {1, 2, 5}

    pairs = ngram_jaccard_pairs(kept2, threshold=0.5)
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster")).select("doc_id")
    kept3 = kept2.join(losers, "doc_id", "left_anti")
    assert {r["doc_id"] for r in kept3.select("doc_id").collect()} == {1, 5}

    quota = source_quota(kept3, k=1)
    assert quota.count() == 2  # one per source

    sampled = sample_to_budget(
        kept3.withColumn("lang", F.lit("en")), budget_tokens=21
    )
    kept_final = {r["doc_id"] for r in sampled.filter(F.col("kept")).collect()}
    # budget 21: first doc in md5(id) order fits (20/21 tokens), the
    # second starts at cum>=20 < 21 is false once the first used 20+
    assert len(kept_final) >= 1


def test_dedup_clusters_raises_on_nonconvergence(spark):
    """Insufficient max_iter must RAISE, not return a partially-
    contracted (wrong) clustering — regression for the silent
    max_iter exhaustion."""
    import pytest

    from djangoadmin_postgresql_2_elasticseach_spark.operators.dedup import dedup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="star fixed point"):
        dedup_clusters(chain, max_iter=1, local_finish_edges=0)
    # and succeeds once max_iter covers the O(log n) round bound
    rows = dedup_clusters(chain, max_iter=10, local_finish_edges=0).collect()
    assert {r["cluster"] for r in rows} == {1}
    assert all(r["cluster_size"] == 64 for r in rows)


def test_dedup_clusters_long_chain_logarithmic_rounds(spark):
    """VERDICT r3 #3 adversarial case: a 10⁴-node path graph — the
    shape where min-label propagation needs diameter (10⁴) rounds —
    must converge within the default max_iter=20 ≈ 2·log2(n)+2 rounds
    of large-star/small-star, with every node labeled by the min."""
    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.operators.dedup import dedup_clusters

    n = 10_000
    chain = spark.range(1, n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    # local_finish_edges=0 forces the pure distributed fixed point (the
    # hybrid would otherwise solve a 10⁴-edge graph driver-side)
    rows = dedup_clusters(chain, max_iter=20, local_finish_edges=0).collect()
    assert len(rows) == n
    assert {r["cluster"] for r in rows} == {1}
    assert all(r["cluster_size"] == n for r in rows)
    # and the hybrid local finish must produce the identical clustering
    hybrid = dedup_clusters(chain, max_iter=20).collect()
    assert sorted(map(tuple, hybrid)) == sorted(map(tuple, rows))


def test_minhash_index_persist_and_incremental(spark, tmp_path):
    """The persisted band index answers an incremental batch identically
    to the in-memory frame; re-running an already-appended batch adds no
    self-pairs; the hot-bucket guard filter reaches the index scan as a
    pushed filter (no shuffle of the index at query time) and the new
    batch is the broadcast side."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.dedup import (
        build_minhash_index,
        incremental_dedup_pairs,
        minhash_index_frame,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import plan_string
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    old = docs.filter("doc_id < 400")
    new = docs.filter("doc_id >= 400")
    path = str(tmp_path / "mh_index")
    build_minhash_index(old, path)
    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"doc_id", "band_idx", "band_key", "sig", "bucket_n"}

    want = sorted(
        tuple(r)
        for r in incremental_dedup_pairs(new, minhash_index_frame(old)).collect()
    )
    got_df = incremental_dedup_pairs(new, stored)
    got = sorted(tuple(r) for r in got_df.collect())
    assert got == want and len(got) > 0

    plan = plan_string(got_df)
    assert "PushedFilters" in plan and "bucket_n" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan

    # append the processed batch; re-running it must not pair docs with
    # themselves, and the original cross-batch pairs are still found
    minhash_index_frame(new).write.mode("append").partitionBy("band_idx").parquet(path)
    rerun = incremental_dedup_pairs(new, spark.read.parquet(path)).collect()
    assert all(r["new_id"] != r["old_id"] for r in rerun)
    assert {(r["new_id"], r["old_id"]) for r in rerun} >= {(a, b) for a, b, _ in want}


def test_duplicated_passages_winnowing_guarantee(spark):
    """The winnowing guarantee (Schleimer et al. 2003): two docs sharing
    a verbatim run of >= w+k-1 tokens are ALWAYS paired, regardless of
    the surrounding text; docs with no shared 8-gram are never paired;
    sub-k-token docs contribute nothing (no crash)."""
    import random

    from djangoadmin_postgresql_2_elasticseach_spark.operators.dedup import (
        duplicated_passage_pairs,
    )

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(500)]

    def prose(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    quote = " ".join(f"q{i}" for i in range(23))  # w+k-1 = 23 tokens
    rows = [
        (1, prose(80) + " " + quote + " " + prose(80)),
        (2, prose(120) + " " + quote),   # same passage, different doc
        (3, prose(200)),                 # unrelated
        (4, "tiny doc"),                 # < k tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in duplicated_passage_pairs(docs).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p and 4 not in p for p in pairs)


def test_bigram_lm_logprob_hand_computed(spark):
    """Stupid-backoff semantics on a hand-checkable corpus: train
    'a b a b' → c(a)=c(b)=2, c(ab)=2, c(ba)=1, N=4, V=2."""
    import math

    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        bigram_lm_logprob,
    )

    train = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    score = spark.createDataFrame(
        [
            (1, "a b"),      # p(b|a) = c(ab)/c(a) = 1.0 → ln = 0
            (2, "b b"),      # unseen bigram → 0.4·(c(b)+1)/(N+V) = 0.4·3/6 = 0.2
            (3, "a z"),      # unseen bigram, OOV b → 0.4·(0+1)/6
            (4, "single"),   # < 2 tokens → no bigrams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in bigram_lm_logprob(score, train=train).collect()
    }
    assert out[1]["n_bigrams"] == 1 and out[1]["avg_logprob"] == 0.0
    assert abs(out[2]["avg_logprob"] - round(math.log(0.2), 6)) < 1e-9
    assert abs(out[3]["avg_logprob"] - round(math.log(0.4 / 6), 6)) < 1e-9
    assert out[4]["n_bigrams"] == 0 and out[4]["avg_logprob"] is None
    # self-training: every bigram seen → all scores finite and ≤ 0
    self_scored = bigram_lm_logprob(train).collect()
    assert all(r["avg_logprob"] <= 0 for r in self_scored)


def test_source_mixture_temperature_semantics(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        source_mixture_weights,
    )

    rows = [(i, "s_small" if i < 10 else "s_big") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    # α=1 → proportional to raw share
    w1 = {r["source"]: r for r in source_mixture_weights(docs, alpha=1.0).collect()}
    assert w1["s_small"]["mix_weight"] == w1["s_small"]["raw_share"] == 0.1
    # α<1 → small source up-sampled relative to its share, sum stays 1
    w = {r["source"]: r for r in source_mixture_weights(docs, alpha=0.5).collect()}
    assert w["s_small"]["mix_weight"] > w["s_small"]["raw_share"]
    assert abs(sum(r["mix_weight"] for r in w.values()) - 1.0) < 1e-5
    # α=0.5 exact: sqrt(10)/(sqrt(10)+sqrt(90)) = 1/4
    assert abs(w["s_small"]["mix_weight"] - 0.25) < 1e-6


def test_pack_sequences_contiguous_stream(spark):
    """Packing invariants the oracle parity can't state directly:
    spans tile the token stream with no gaps/overlaps, window ids are
    exact integer math, zero-token docs are dropped, and the bucketed
    two-pass equals a brute-force single-order prefix sum."""
    import hashlib

    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import pack_sequences

    docs = [(i, " ".join(f"w{j}" for j in range(i % 7))) for i in range(1, 40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, window_tokens=5).collect()}

    # zero-token docs (i % 7 == 0) occupy no window and are dropped
    assert set(out) == {i for i in range(1, 40) if i % 7 != 0}

    # brute-force reference: global md5 order, running prefix
    order = sorted(out, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    offset = 0
    for i in order:
        r = out[i]
        n = i % 7
        assert r["n_tokens"] == n
        assert r["begin_offset"] == offset, (i, r)
        assert r["first_window"] == offset // 5
        assert r["last_window"] == (offset + n - 1) // 5
        assert r["n_windows"] == r["last_window"] - r["first_window"] + 1
        offset += n

    # a doc longer than the window straddles multiple windows
    long_df = spark.createDataFrame(
        [(1, " ".join(["x"] * 12))], "doc_id long, text string"
    )
    row = pack_sequences(long_df, window_tokens=5).collect()[0]
    assert (row["first_window"], row["last_window"], row["n_windows"]) == (0, 2, 3)


def test_pack_sequences_partition_invariant(spark):
    """Same result at 1 partition and 16 partitions — the two-pass
    bucket-offset scheme has no partitioning dependence."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import pack_sequences

    docs = [(i, " ".join(["t"] * (1 + i % 11))) for i in range(1, 120)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(
        map(tuple, pack_sequences(df.coalesce(1), window_tokens=16).collect())
    )
    b = sorted(
        map(tuple, pack_sequences(df.repartition(16), window_tokens=16).collect())
    )
    assert a == b


def test_pack_windows_materializes_exact_stream(spark):
    """Window texts reassemble the exact concatenated token stream in
    md5 order; every window but the last has exactly W tokens."""
    import hashlib

    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import pack_windows

    docs = [(i, " ".join(f"d{i}t{j}" for j in range(1 + i % 9))) for i in range(1, 50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    W = 7
    rows = pack_windows(df, window_tokens=W).collect()
    rows.sort(key=lambda r: r["window_id"])

    # invariant: full windows of exactly W tokens, partial tail only
    assert [r["window_id"] for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r["n_tokens"] == W, r
        assert len(r["text"].split(" ")) == W
    assert 0 < rows[-1]["n_tokens"] <= W

    # stream equality with the brute-force concatenation
    order = sorted(
        (i for i, _ in docs),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    stream = []
    for i in order:
        stream.extend(f"d{i}t{j}" for j in range(1 + i % 9))
    got = " ".join(r["text"] for r in rows).split(" ")
    assert got == stream


def test_split_leakage_safe_coplaces_near_dup_clusters(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        split_corpus,
        split_corpus_leakage_safe,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox jumped over that lazy dog"),  # near-dup of 1
            (3, "completely unrelated text about spark plans"),
            (4, "another standalone document with its own words"),
        ],
        "doc_id long, text string",
    )
    # near-dup pair graph: {1,2} one cluster; 3 and 4 singletons
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")

    safe = {
        r["doc_id"]: (r["rep_id"], r["bucket"], r["split"])
        for r in split_corpus_leakage_safe(docs, pairs).collect()
    }
    plain = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in split_corpus(docs).collect()
    }

    # cluster members share the representative's (min id = 1) bucket and
    # split, regardless of their own content hash
    assert safe[1] == (1, plain[1][0], plain[1][1])
    assert safe[2] == (1, plain[1][0], plain[1][1])
    # singletons are byte-identical to the plain content-hash split
    for d in (3, 4):
        assert safe[d] == (d, plain[d][0], plain[d][1])


def test_split_leakage_safe_rep_missing_from_docs_still_coplaces(spark):
    """ADVICE r5: a cluster whose representative (min-id member) has no
    row in `docs` must still co-place the surviving members — via the
    deterministic id-hash fallback, NOT silently degrade each member to
    its own content bucket."""
    import hashlib

    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        split_corpus_leakage_safe,
    )

    # doc 1 (the would-be representative) is ABSENT from docs
    docs = spark.createDataFrame(
        [
            (2, "a quick brown fox jumped over that lazy dog"),
            (3, "the quick brown fox jumps over the lazy dog now"),
            (4, "another standalone document with its own words"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )  # cluster {1,2,3}, rep = 1 (missing)

    out = {
        r["doc_id"]: (r["rep_id"], r["bucket"], r["split"])
        for r in split_corpus_leakage_safe(docs, pairs).collect()
    }
    expected_bucket = int(hashlib.md5(b"1").hexdigest()[:8], 16) % 100
    assert out[2] == out[3]  # co-placed
    assert out[2][0] == 1 and out[2][1] == expected_bucket
    # the singleton is untouched by the fallback
    assert out[4][0] == 4


def test_remove_duplicated_passages_first_doc_keeps(spark):
    """Exact-substring removal (Lee et al. policy): the min-id doc
    keeps a shared k-gram run, later docs lose exactly the covered
    tokens; unique text, short docs, and empty docs are untouched."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.dedup import (
        remove_duplicated_passages,
    )

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "unique one " + boiler + " tail text here body"),
            (2, "other start " + boiler + " different ending words"),
            (3, "totally unrelated content with no duplicated passages at all"),
            (4, ""),
            (5, "short doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_passages(docs, k=8).collect()}
    assert out[1]["n_removed"] == 0 and boiler in out[1]["clean_text"]
    assert out[2]["n_removed"] == 12  # the boiler run's covered tokens
    assert out[2]["clean_text"] == "other start different ending words"
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_tokens"] == 0
    assert out[5]["n_removed"] == 0


def test_quality_classifier_separates_seed_like_docs(spark):
    """NB quality scores: docs made of positive-seed vocabulary must
    score above docs made of negative-seed vocabulary; a mixed doc sits
    between; token-less docs get (0, 0.0); every input doc gets a row."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        quality_classifier_scores,
    )

    pos_seed = spark.createDataFrame(
        [(100 + i, "insightful rigorous analysis of careful experiments") for i in range(4)],
        "doc_id long, text string",
    )
    neg_seed = spark.createDataFrame(
        [(200 + i, "click here free prize winner buy now spam") for i in range(4)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "rigorous careful analysis experiments insightful"),
            (2, "free prize click spam buy winner now"),
            (3, "careful experiments free spam"),  # mixed
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in quality_classifier_scores(
            docs, pos_seed, neg_seed, n_features=256
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["llr_mean"] > 0 > out[2]["llr_mean"]
    assert out[2]["llr_mean"] < out[3]["llr_mean"] < out[1]["llr_mean"]
    assert out[4]["n_tokens"] == 0 and out[4]["llr_mean"] == 0.0
    assert out[1]["n_tokens"] == 5
