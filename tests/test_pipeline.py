"""CorpusPipeline: declarative assembly over the oracle-checked corpus
operators — spec validation, stage composition, and end-to-end parity
with the hand-composed assembly flow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.pipeline import (
    CorpusPipeline,
)


def test_spec_validation_is_strict():
    with pytest.raises(ValueError, match="unknown op"):
        CorpusPipeline([{"op": "launder"}])
    with pytest.raises(ValueError, match="unknown params"):
        CorpusPipeline([{"op": "clean", "minimum_quality": 0.5}])
    with pytest.raises(ValueError, match="missing required"):
        CorpusPipeline([{"op": "sample_budget"}])
    with pytest.raises(ValueError, match="missing 'op'"):
        CorpusPipeline([{"k": 3}])
    with pytest.raises(ValueError, match="must be last"):
        CorpusPipeline([{"op": "pack"}, {"op": "clean"}])
    with pytest.raises(ValueError, match="must be last"):
        CorpusPipeline([{"op": "chunk"}, {"op": "split"}])
    # round trip
    pipe = CorpusPipeline(
        [{"op": "clean", "min_quality": 0.3}, {"op": "split", "val_pct": 20}]
    )
    assert CorpusPipeline.from_json(pipe.to_json()).stages == pipe.stages


def test_pipeline_matches_hand_composed_assembly(spark):
    """The pipeline must reproduce test_assembly_pipeline_end_to_end's
    hand-chained result exactly: repetition gate -> decontaminate ->
    near-dedup keeps cluster minima -> per-source quota."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        decontaminate,
        repetition_stats,
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
            (2, "srcA", base + " two"),
            (3, "srcA", "spam " * 40),
            (4, "srcB", base + " " + bench_text),
            (5, "srcB", " ".join(f"tok{i}" for i in range(20))),
        ],
        "doc_id long, source string, text string",
    )
    benchmark = spark.createDataFrame(
        [(0, bench_text)], "doc_id long, text string"
    )

    pipe = CorpusPipeline(
        [
            {"op": "repetition_gate"},
            {"op": "decontaminate", "n": 13},
            {"op": "near_dedup", "method": "jaccard", "threshold": 0.5},
            {"op": "source_quota", "k": 1},
        ]
    )
    got = pipe.run(docs, benchmark=benchmark)
    assert {r["doc_id"] for r in got.collect()} == {1, 5}
    # survivors keep their full original row
    assert set(got.columns) == {"doc_id", "source", "text"}

    # hand-composed chain gives the identical survivor set
    rep = repetition_stats(docs)
    k1 = docs.join(rep.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi")
    cont = decontaminate(k1, benchmark, n=13)
    k2 = k1.join(
        cont.filter(~F.col("contaminated")).select("doc_id"), "doc_id", "left_semi"
    )
    cl = dedup_clusters(ngram_jaccard_pairs(k2, threshold=0.5))
    k3 = k2.join(
        cl.filter(F.col("doc_id") != F.col("cluster")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    k4 = k3.join(source_quota(k3, k=1).select("doc_id"), "doc_id", "left_semi")
    assert {r["doc_id"] for r in k4.collect()} == {
        r["doc_id"] for r in got.collect()
    }


def test_pipeline_pii_swap_and_split_annotation(spark):
    docs = spark.createDataFrame(
        [
            (1, "srcA", "contact me me me at bob@example.org please thanks"),
            (2, "srcA", "totally clean text with several plain words here"),
        ],
        "doc_id long, source string, text string",
    )
    pipe = CorpusPipeline([{"op": "pii_scrub"}, {"op": "split"}])
    rows = {r["doc_id"]: r for r in pipe.run(docs).collect()}
    assert "<EMAIL>" in rows[1]["text"] and "bob@" not in rows[1]["text"]
    assert rows[2]["text"].startswith("totally clean")
    assert set(rows[1].asDict()) == {"doc_id", "source", "text", "split"}
    assert all(r["split"] in ("train", "val", "test") for r in rows.values())


def test_pipeline_lm_gate_and_report(spark):
    """LM gate drops the doc whose bigrams the train corpus has never
    seen; report() returns per-stage survivor counts."""
    train = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(3)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),          # all bigrams seen → logprob ~0
            (2, "zz yy xx ww vv uu"),            # all unseen → backoff ≈ ln(0.4/35) ≈ -4.47
            (3, "one"),                           # no bigrams → passes by contract
        ],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline([{"op": "lm_quality_gate", "min_avg_logprob": -2.0}])
    got = {r["doc_id"] for r in pipe.run(docs, lm_train=train).collect()}
    assert got == {1, 3}
    rep = pipe.report(docs, lm_train=train)
    assert rep[0] == {"stage": "input", "rows": 3}
    assert rep[-1] == {"stage": "lm_quality_gate", "rows": 2}


def test_pipeline_chunk_changes_grain(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100)))],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline([{"op": "chunk", "size": 40, "stride": 20}])
    out = pipe.run(docs)
    assert "chunk_idx" in out.columns
    assert out.count() > 1


def test_pipeline_pack_terminal_stage(spark):
    """'pack' changes grain doc→span exactly like calling pack_sequences
    directly, and runs after row-dropping gates (survivors only)."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, "en", "src", " ".join(["tok"] * (3 + i % 5))) for i in range(1, 30)],
        "doc_id long, lang string, source string, text string",
    )
    pipe = CorpusPipeline(
        [{"op": "sample_budget", "budget_tokens": 60},
         {"op": "pack", "window_tokens": 16}]
    )
    got = sorted(map(tuple, pipe.run(docs).collect()))
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import sample_to_budget

    kept = docs.join(
        sample_to_budget(docs, budget_tokens=60).filter(F.col("kept"))
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    want = sorted(map(tuple, pack_sequences(kept, window_tokens=16).collect()))
    assert got == want and len(got) > 0


def test_training_export_end_to_end(spark, tmp_path):
    """The full corpus-to-training-data flow: declarative gates →
    GPT-style packing → webdataset tar export, read back and verified
    against the in-memory windows. Every step is an already-tested
    operator; this pins that they compose."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import pack_windows
    from djangoadmin_postgresql_2_elasticseach_spark.sources.corpus_io import (
        read_tar_shards,
        write_tar_shards,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "far away to the old stone house near the river bank today"
    )
    docs = spark.createDataFrame(
        [(i, "en", "web", f"{good} variant {i}") for i in range(1, 30)]
        + [(99, "en", "web", "zz zz zz zz zz zz zz zz zz zz")],  # low quality
        "doc_id long, lang string, source string, text string",
    )
    pipe = CorpusPipeline(
        [{"op": "clean", "min_quality": 0.5}, {"op": "repetition_gate"}]
    )
    survivors = pipe.run(docs)
    windows = pack_windows(survivors, window_tokens=16)
    wdf = windows.select(
        F.col("window_id").alias("doc_id"), "text"
    )
    out = str(tmp_path / "train")
    write_tar_shards(wdf, out, n_shards=2)
    back = {
        int(r["member"].split(".")[0]): r["content"].decode()
        for r in read_tar_shards(spark, out).collect()
        if r["member"].endswith(".txt")
    }
    want = {r["window_id"]: r["text"] for r in windows.collect()}
    assert back == want and len(want) > 1
    # the low-quality doc's tokens never reach the export
    assert not any("zz" in t for t in back.values())


def test_pipeline_nb_quality_gate(spark):
    """NB gate keeps positive-seed-like docs and token-less docs,
    drops negative-seed-like ones; missing seeds raise loudly."""
    pos = spark.createDataFrame(
        [(100 + i, "insightful rigorous analysis of careful experiments") for i in range(3)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(200 + i, "click here free prize winner buy now spam") for i in range(3)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "rigorous careful analysis"),
            (2, "free prize spam winner"),
            (3, ""),  # token-less → passes by contract
        ],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline([{"op": "nb_quality_gate", "min_llr": 0.0}])
    got = {
        r["doc_id"]
        for r in pipe.run(docs, seed_pos=pos, seed_neg=neg).collect()
    }
    assert got == {1, 3}
    with pytest.raises(ValueError, match="seed_pos"):
        pipe.run(docs)


def test_pipeline_shares_one_token_frame(spark, monkeypatch):
    """The shared-token-frame contract (r10): a checkpointed run with
    two token-consuming stages builds tokenize() exactly TWICE — once
    for the shared corpus-side column injected at a stage boundary,
    once for decontaminate's (bounded) benchmark side. Without sharing
    the corpus bodies would be tokenized once per consuming stage."""
    from djangoadmin_postgresql_2_elasticseach_spark.functions import text as T

    calls = []
    real_tokenize = T.tokenize

    def counting(col):
        calls.append(col)
        return real_tokenize(col)

    monkeypatch.setattr(T, "tokenize", counting)

    base = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(i, base + f" tail{i}") for i in range(1, 6)],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(0, " ".join(f"b{i}" for i in range(15)))],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline(
        [
            {"op": "clean", "min_quality": 0.0},
            {"op": "decontaminate", "n": 13},
            {"op": "near_dedup", "method": "minhash", "threshold": 0.99},
            {"op": "split"},
        ]
    )
    out = pipe.run(docs, benchmark=benchmark)
    assert len(calls) == 2, f"tokenize built {len(calls)}x, want 2 (shared)"
    # the helper column never leaks into the result
    assert set(out.columns) == {"doc_id", "text", "split"}


def test_pipeline_sharing_matches_lazy_run(spark):
    """Checkpointed (token-shared) and lazy (per-stage tokenize) runs
    must agree row-for-row — the shared frame is an execution detail,
    not a semantic one."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    docs = spark.createDataFrame(
        [(i, base + (f" tail{i}" if i % 2 else "")) for i in range(1, 9)],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(0, " ".join(f"b{i}" for i in range(15)))],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline(
        [
            {"op": "decontaminate", "n": 13},
            {"op": "near_dedup", "method": "minhash", "threshold": 0.4},
            {"op": "split"},
        ]
    )
    shared = sorted(map(tuple, pipe.run(docs, benchmark=benchmark).collect()))
    lazy = sorted(map(tuple, pipe.run(
        docs, benchmark=benchmark, checkpoint_stages=False).collect()))
    assert shared == lazy and len(shared) > 0


def test_pipeline_pii_scrub_invalidates_shared_tokens(spark):
    """A text-mutating stage must drop the live token column: the
    near-dedup AFTER pii_scrub has to see the SCRUBBED tokens. The two
    docs below differ only in their email address, so they are
    near-dups only post-scrub — a stale pre-scrub token frame would
    miss the pair and keep both."""
    base = " ".join(f"word{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, f"alice@example.com {base}"),
            (2, f"bob@example.org {base}"),
            (3, " ".join(f"other{i}" for i in range(25))),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(0, " ".join(f"b{i}" for i in range(15)))],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline(
        [
            {"op": "decontaminate", "n": 13},
            {"op": "near_dedup", "method": "jaccard", "threshold": 0.99},
            {"op": "pii_scrub"},
            {"op": "near_dedup", "method": "jaccard", "threshold": 0.99},
        ]
    )
    got = {r["doc_id"] for r in pipe.run(docs, benchmark=benchmark).collect()}
    # pre-scrub pass keeps all three (emails differ); post-scrub pass
    # collapses 1/2 (identical after <EMAIL> masking), keeping the min id
    assert got == {1, 3}


# ---------------------------------------------------------------------------
# run_and_maintain (r11): one pipeline pass tick-maintains the minhash,
# token-count and shingle indexes — no extra ingest scans, no extra
# tokenize over the batch bodies.
# ---------------------------------------------------------------------------

def _tok_counter(monkeypatch):
    from djangoadmin_postgresql_2_elasticseach_spark.functions import text as T

    calls = []
    real = T.tokenize

    def counting(col):
        calls.append(col)
        return real(col)

    monkeypatch.setattr(T, "tokenize", counting)
    return calls


def test_run_and_maintain_adds_zero_tokenize_builds(spark, monkeypatch, tmp_path):
    """With token-consuming stages the shared frame is already live at
    the final checkpoint, so maintaining all THREE indexes adds ZERO
    tokenize builds over run()'s own two (corpus + benchmark side) —
    the one-scan-upkeep pin: a regression to per-append re-tokenize
    would read 5."""
    calls = _tok_counter(monkeypatch)
    base = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(i, base + f" tail{i}") for i in range(1, 6)],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(0, " ".join(f"b{i}" for i in range(15)))],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline(
        [
            {"op": "clean", "min_quality": 0.0},
            {"op": "decontaminate", "n": 13},
            {"op": "near_dedup", "method": "minhash", "threshold": 0.99},
            {"op": "split"},
        ]
    )
    out = pipe.run_and_maintain(
        docs,
        minhash_index=str(tmp_path / "mh"),
        token_count_index=str(tmp_path / "tc"),
        shingle_index=str(tmp_path / "sh"),
        benchmark=benchmark,
    )
    assert len(calls) == 2, f"tokenize built {len(calls)}x, want 2 (shared)"
    assert set(out.columns) == {"doc_id", "text", "split"}
    assert out.count() == 5


def test_run_and_maintain_consumerless_pipeline_tokenizes_once(
    spark, monkeypatch, tmp_path
):
    """A pipeline with NO token-consuming stage builds tokenize exactly
    ONCE for maintenance (injected into the final checkpoint) — shared
    by all three appends."""
    calls = _tok_counter(monkeypatch)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc{i}") for i in range(6)],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline([{"op": "clean", "min_quality": 0.0}])
    pipe.run_and_maintain(
        docs,
        minhash_index=str(tmp_path / "mh"),
        token_count_index=str(tmp_path / "tc"),
        shingle_index=str(tmp_path / "sh"),
    )
    assert len(calls) == 1, f"tokenize built {len(calls)}x, want 1 (shared)"


def test_run_and_maintain_ticks_equal_one_shot(spark, tmp_path):
    """Two run_and_maintain ticks over disjoint batches leave all three
    artifacts exactly equal to one-shot builds over the combined
    SURVIVORS (minhash compared modulo bucket_n, the documented
    own-batch undercount)."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        shingle_novelty,
        shingle_novelty_from_index,
        vocab_coverage,
        vocab_coverage_from_index,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.operators.dedup import (
        minhash_index_frame,
    )

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta doc{i} t{i}")
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    mh, tc, sh = (str(tmp_path / d) for d in ("mh", "tc", "sh"))
    pipe = CorpusPipeline([{"op": "clean", "min_quality": 0.0}])
    for pred in (F.col("doc_id") < 5, F.col("doc_id") >= 5):
        pipe.run_and_maintain(
            docs.filter(pred),
            minhash_index=mh,
            token_count_index=tc,
            shingle_index=sh,
        )

    got_cov = sorted(
        map(tuple, vocab_coverage_from_index(spark, tc, v=50).collect())
    )
    want_cov = sorted(map(tuple, vocab_coverage(docs, v=50).collect()))
    assert got_cov == want_cov and len(got_cov) > 0

    got_nov = sorted(
        map(
            tuple,
            shingle_novelty_from_index(
                spark, docs.select("doc_id"), sh
            ).collect(),
        )
    )
    want_nov = sorted(map(tuple, shingle_novelty(docs, n=3).collect()))
    assert got_nov == want_nov

    keep = ["doc_id", "band_idx", "band_key", "sig"]
    got_mh = sorted(
        map(tuple, spark.read.parquet(mh).select(*keep).collect())
    )
    want_mh = sorted(
        map(tuple, minhash_index_frame(docs).select(*keep).collect())
    )
    assert got_mh == want_mh and len(got_mh) > 0


def test_run_and_maintain_indexes_scrubbed_text(spark, tmp_path):
    """A text-mutating final stage must feed the indexes the MUTATED
    bodies: after pii_scrub, no indexed token is an email address."""
    docs = spark.createDataFrame(
        [(1, "contact alice@example.com about alpha beta gamma")],
        "doc_id long, text string",
    )
    tc = str(tmp_path / "tc")
    CorpusPipeline([{"op": "pii_scrub"}]).run_and_maintain(
        docs, token_count_index=tc
    )
    toks = {r["token"] for r in spark.read.parquet(tc).collect()}
    assert "alpha" in toks
    assert not any("example.com" in t for t in toks), toks


def test_run_and_maintain_rejects_grain_changing_tail(spark, tmp_path):
    pipe = CorpusPipeline(
        [{"op": "clean", "min_quality": 0.0}, {"op": "pack", "window_tokens": 64}]
    )
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="grain"):
        pipe.run_and_maintain(docs, token_count_index=str(tmp_path / "tc"))
