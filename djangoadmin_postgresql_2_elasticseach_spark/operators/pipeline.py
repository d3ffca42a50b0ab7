"""Declarative corpus-pipeline assembly — the engine's answer to the
reference's config-driven ETL orchestrator (reference ``etl/main.py``
drives extract → transform → load from settings; here the pipeline is a
JSON-able list of stage specs driving the corpus operators).

A pipeline is data, not code::

    pipe = CorpusPipeline([
        {"op": "clean"},
        {"op": "repetition_gate"},
        {"op": "decontaminate", "n": 13},          # benchmark passed at run()
        {"op": "near_dedup", "method": "minhash", "threshold": 0.8},
        {"op": "lm_quality_gate", "min_avg_logprob": -6.0},
        {"op": "pii_scrub"},
        {"op": "source_quota", "k": 100_000},
        {"op": "sample_budget", "budget_tokens": 10_000_000_000},
        {"op": "split"},
    ])
    out = pipe.run(docs, benchmark=benchmark_df)

Every stage maps 1:1 onto an already-oracle-checked operator — the
pipeline adds NO new semantics, only composition — so the end-to-end
flow inherits each stage's correctness checks, and the whole chain
stays one lazy DataFrame plan (Catalyst sees across stage boundaries;
nothing materializes until the caller writes). Unknown ops or params
raise immediately at construction — the reference's ``dynamic: strict``
spirit (es_movies.json:43): no silent wrong pipelines.

Scale: stage order is the cost order — cheap row-local gates (clean,
repetition, lm) run before the shuffling stages (near-dup, quota,
budget), so the expensive shuffles see only survivors. ``run`` keeps
doc identity by ``doc_id``; doc-level stages only ever DROP rows or add
columns, so survivors carry their full original row into the sink. The
two grain-changing stages (``chunk``, ``pack``) emit a different row
shape and are therefore only valid as the LAST stage — enforced at
construction.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keep_ids(docs: DataFrame, ids: DataFrame, id_col: str) -> DataFrame:
    return docs.join(ids.select(id_col), id_col, "left_semi")


def _drop_ids(docs: DataFrame, ids: DataFrame, id_col: str) -> DataFrame:
    return docs.join(ids.select(id_col), id_col, "left_anti")


def _st_clean(docs, p, ctx):
    # the slim keeper-id form: ONE semi-join against the full-row
    # frame instead of clean_corpus's text-restore join plus a second
    # semi-join (the stage only needs ids — r10 stage-count shave)
    from .corpus import clean_keeper_ids

    kept = clean_keeper_ids(
        docs,
        lang=p.get("lang", "en"),
        min_quality=p.get("min_quality", 0.6),
        id_col=ctx["id_col"],
        text_col=ctx["text_col"],
    )
    return _keep_ids(docs, kept, ctx["id_col"])


def _st_repetition_gate(docs, p, ctx):
    from .corpus import repetition_stats

    rep = repetition_stats(
        docs,
        max_dup_line_frac=p.get("max_dup_line_frac", 0.3),
        max_top_bigram_frac=p.get("max_top_bigram_frac", 0.2),
        id_col=ctx["id_col"],
        text_col=ctx["text_col"],
    )
    return _keep_ids(docs, rep.filter(F.col("keep")), ctx["id_col"])


def _st_decontaminate(docs, p, ctx):
    # anti-join the CONTAMINATED id set directly — decontaminate's
    # all-docs left join (which exists so clean docs get explicit
    # n_overlap=0 rows) would cost the stage an extra id scan + join
    # just to re-derive the complement (r10 stage-count shave)
    from .corpus import contamination_overlap

    bench = ctx.get("benchmark")
    if bench is None:
        raise ValueError("decontaminate stage needs run(benchmark=...)")
    cont = contamination_overlap(
        docs, bench, n=p.get("n", 13), id_col=ctx["id_col"],
        text_col=ctx["text_col"], tokens_col=ctx.get("tokens_col"),
    )
    return _drop_ids(docs, cont, ctx["id_col"])


_PAIR_FNS = {
    "minhash": ("minhash_dedup_pairs", 0.8),
    "simhash": ("simhash_neardup_pairs", None),
    "jaccard": ("ngram_jaccard_pairs", 0.8),
}


def _st_near_dedup(docs, p, ctx):
    from . import dedup as D

    method = p.get("method", "minhash")
    if method not in _PAIR_FNS:
        raise ValueError(f"near_dedup method {method!r} not in {sorted(_PAIR_FNS)}")
    fn_name, default_thr = _PAIR_FNS[method]
    kwargs: dict[str, Any] = {
        "id_col": ctx["id_col"],
        "text_col": ctx["text_col"],
        "tokens_col": ctx.get("tokens_col"),
    }
    if default_thr is not None:
        kwargs["threshold"] = p.get("threshold", default_thr)
    pairs = getattr(D, fn_name)(docs, **kwargs)
    clusters = D.dedup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster")).select(
        F.col("doc_id").alias(ctx["id_col"])
    )
    return _drop_ids(docs, losers, ctx["id_col"])


def _st_lm_quality_gate(docs, p, ctx):
    from .corpus import bigram_lm_logprob

    scores = bigram_lm_logprob(
        docs, train=ctx.get("lm_train"), id_col=ctx["id_col"],
        text_col=ctx["text_col"],
    )
    thr = p["min_avg_logprob"]
    # docs too short to have bigrams pass the gate (no evidence against)
    ok = scores.filter(
        (F.col("n_bigrams") == 0) | (F.col("avg_logprob") >= F.lit(thr))
    )
    return _keep_ids(docs, ok, ctx["id_col"])


def _st_nb_quality_gate(docs, p, ctx):
    from .corpus import quality_classifier_scores

    if ctx.get("seed_pos") is None or ctx.get("seed_neg") is None:
        raise ValueError(
            "nb_quality_gate stage needs run(seed_pos=..., seed_neg=...)"
        )
    scores = quality_classifier_scores(
        docs, ctx["seed_pos"], ctx["seed_neg"],
        n_features=p.get("n_features", 1024),
        id_col=ctx["id_col"], text_col=ctx["text_col"],
    )
    thr = p["min_llr"]
    # token-less docs pass (no evidence against — same posture as the
    # LM gate's zero-bigram rule)
    ok = scores.filter(
        (F.col("n_tokens") == 0) | (F.col("llr_mean") >= F.lit(thr))
    )
    return _keep_ids(docs, ok, ctx["id_col"])


def _st_pii_scrub(docs, p, ctx):
    from .corpus import scrub_pii

    scrubbed = scrub_pii(docs, id_col=ctx["id_col"], text_col=ctx["text_col"])
    # swap the text column for its scrubbed form, keep everything else
    keep = [c for c in docs.columns if c != ctx["text_col"]]
    return (
        docs.select(*keep)
        .join(
            scrubbed.select(
                ctx["id_col"], F.col("clean_text").alias(ctx["text_col"])
            ),
            ctx["id_col"],
        )
    )


def _st_source_quota(docs, p, ctx):
    from .corpus import source_quota

    kept = source_quota(
        docs, k=p["k"], source_col=p.get("source_col", "source"),
        id_col=ctx["id_col"], text_col=ctx["text_col"],
    )
    return _keep_ids(docs, kept, ctx["id_col"])


def _st_sample_budget(docs, p, ctx):
    from .corpus import sample_to_budget

    sampled = sample_to_budget(
        docs, budget_tokens=p["budget_tokens"],
        stratum_col=p.get("stratum_col", "lang"), id_col=ctx["id_col"],
        text_col=ctx["text_col"],
    )
    return _keep_ids(docs, sampled.filter(F.col("kept")), ctx["id_col"])


def _st_split(docs, p, ctx):
    from .corpus import split_corpus

    split = split_corpus(
        docs,
        val_pct=p.get("val_pct", 10),
        test_pct=p.get("test_pct", 10),
        id_col=ctx["id_col"],
        text_col=ctx["text_col"],
    )
    return docs.join(
        split.select(ctx["id_col"], "split"), ctx["id_col"]
    )


def _st_pack(docs, p, ctx):
    from .corpus import pack_sequences

    return pack_sequences(
        docs, window_tokens=p.get("window_tokens", 2048),
        id_col=ctx["id_col"], text_col=ctx["text_col"],
    )


def _st_chunk(docs, p, ctx):
    from .corpus import chunk_documents

    return chunk_documents(
        docs, p.get("size", 512), p.get("stride", 64),
        id_col=ctx["id_col"], text_col=ctx["text_col"],
    )


STAGE_OPS: dict[str, Callable] = {
    "clean": _st_clean,
    "repetition_gate": _st_repetition_gate,
    "decontaminate": _st_decontaminate,
    "near_dedup": _st_near_dedup,
    "lm_quality_gate": _st_lm_quality_gate,
    "nb_quality_gate": _st_nb_quality_gate,
    "pii_scrub": _st_pii_scrub,
    "source_quota": _st_source_quota,
    "sample_budget": _st_sample_budget,
    "split": _st_split,
    "chunk": _st_chunk,
    "pack": _st_pack,
}

# params each op accepts (validated at construction — loud failure)
_ALLOWED_PARAMS = {
    "clean": {"lang", "min_quality"},
    "repetition_gate": {"max_dup_line_frac", "max_top_bigram_frac"},
    "decontaminate": {"n"},
    "near_dedup": {"method", "threshold"},
    "lm_quality_gate": {"min_avg_logprob"},
    "nb_quality_gate": {"min_llr", "n_features"},
    "pii_scrub": set(),
    "source_quota": {"k", "source_col"},
    "sample_budget": {"budget_tokens", "stratum_col"},
    "split": {"val_pct", "test_pct"},
    "chunk": {"size", "stride"},
    "pack": {"window_tokens"},
}
_REQUIRED_PARAMS = {
    "lm_quality_gate": {"min_avg_logprob"},
    "nb_quality_gate": {"min_llr"},
    "source_quota": {"k"},
    "sample_budget": {"budget_tokens"},
}

# grain-changing ops emit a different row shape (chunks / windows, no
# text column), so no doc-level stage can follow them — enforced at
# construction, same loud-failure posture as unknown ops
_TERMINAL_OPS = {"chunk", "pack"}

# stages whose operators accept a shared pre-tokenized column
# (tokens_col) — run() materializes tokenize(text) ONCE into the stage
# checkpoint immediately preceding the first of these, so the
# decontaminate shingles and the near-dup shingles/signatures derive
# from the same token frame instead of each re-running the tokenizer
# over the corpus bodies (at 100 TB the repeated tokenize IS the
# repeated cost — shingle sizes differ per stage and cannot be shared,
# token arrays can)
_TOKEN_CONSUMERS = {"decontaminate", "near_dedup"}
# stages that rewrite the text column, invalidating any live shared
# token column — it is dropped and re-derived at the boundary before
# the next consumer
_TEXT_MUTATORS = {"pii_scrub"}
_TOKENS_COL = "_pipe_tokens"


class CorpusPipeline:
    """Validated, JSON-able sequence of corpus stages (module docstring
    for the spec format and design contract)."""

    def __init__(self, stages: list[dict], id_col: str = "doc_id",
                 text_col: str = "text"):
        for i, st in enumerate(stages):
            if "op" not in st:
                raise ValueError(f"stage {i}: missing 'op'")
            op = st["op"]
            if op not in STAGE_OPS:
                raise ValueError(
                    f"stage {i}: unknown op {op!r} (known: {sorted(STAGE_OPS)})"
                )
            params = set(st) - {"op"}
            bad = params - _ALLOWED_PARAMS[op]
            if bad:
                raise ValueError(f"stage {i} ({op}): unknown params {sorted(bad)}")
            missing = _REQUIRED_PARAMS.get(op, set()) - params
            if missing:
                raise ValueError(
                    f"stage {i} ({op}): missing required {sorted(missing)}"
                )
            if op in _TERMINAL_OPS and i != len(stages) - 1:
                raise ValueError(
                    f"stage {i} ({op}): grain-changing stage must be last"
                )
        self.stages = [dict(s) for s in stages]
        self.id_col = id_col
        self.text_col = text_col
        self._last_checkpoint = None  # set by _execute (report frees it)

    @classmethod
    def from_json(cls, spec: str, **kw) -> "CorpusPipeline":
        return cls(json.loads(spec), **kw)

    def to_json(self) -> str:
        return json.dumps(self.stages)

    def run(
        self,
        docs: DataFrame,
        benchmark: DataFrame | None = None,
        lm_train: DataFrame | None = None,
        seed_pos: DataFrame | None = None,
        seed_neg: DataFrame | None = None,
        checkpoint_stages: bool = True,
    ) -> DataFrame:
        """Compose every stage onto ``docs``; returns the final frame.

        By default each stage boundary is EAGERLY materialized
        (localCheckpoint). The fully-lazy composition reads nicely but
        executes badly: every doc-level stage references its input
        TWICE (once inside the scoring operator, once as the semi-join
        probe side), so stage k's plan nominally contains stage k-1's
        subtree 2×, k-2's 4×, … (AQE stage reuse absorbs part of it:
        measured 13.3 s lazy vs 9.9 s checkpointed on the bench spec at
        sf0.1, same rows — and the gap widens with stage count).
        Superseded stage checkpoints are freed as soon as the
        next stage lands (session.free_local_checkpoint). The LAST
        stage is returned as a lazy tail on the penultimate stage's
        checkpoint (whose blocks belong to the caller): the caller's
        own action materializes it, so a final checkpoint would pay
        the full output twice per run. Pass
        ``checkpoint_stages=False`` for the single-plan form (useful
        when a downstream optimizer should see through the whole chain,
        e.g. to prune columns the sink never reads).

        Checkpointed runs additionally SHARE ONE TOKEN FRAME across
        token-consuming stages (_TOKEN_CONSUMERS): tokenize(text) is
        materialized once, into the checkpoint at the boundary before
        the first consumer, and every later consumer shingles/signs
        from that array column instead of re-tokenizing the bodies.
        A text-mutating stage (_TEXT_MUTATORS) drops the live column;
        it is re-derived before the next consumer. The helper column
        never appears in the returned frame. Lazy runs skip sharing —
        without a materialization boundary the column is just an
        expression alias that each consumer would re-evaluate anyway.
        """
        return self._execute(
            docs, benchmark, lm_train, seed_pos, seed_neg,
            checkpoint_stages, counts=None,
        )

    def run_and_maintain(
        self,
        docs: DataFrame,
        *,
        minhash_index: str | None = None,
        token_count_index: str | None = None,
        shingle_index: str | None = None,
        shingle_n: int = 3,
        minhash_params: dict | None = None,
        benchmark: DataFrame | None = None,
        lm_train: DataFrame | None = None,
        seed_pos: DataFrame | None = None,
        seed_neg: DataFrame | None = None,
    ) -> DataFrame:
        """One pipeline tick that ALSO tick-maintains the persisted
        corpus artifacts — from a single pass over the batch.

        Runs the checkpointed pipeline, guarantees the FINAL stage
        checkpoint carries the shared token column (tokenize of the
        final, post-mutation text — one extra tokenize build at most,
        zero when a consumer already kept it live), then appends that
        ONE materialized frame's partials to each requested index:

        - ``minhash_index`` → dedup.append_minhash_index (band rows)
        - ``token_count_index`` → corpus.append_token_count_index
        - ``shingle_index`` → corpus.append_shingle_index

        Without this, per-tick upkeep is three separate ingest scans,
        each re-reading the batch AND re-running the tokenizer — at
        100 TB the repeated tokenize over document bodies is the
        dominant repeated cost (the same argument that motivated the
        in-run shared token frame). Here the input is read once by the
        pipeline; the appends read the in-memory final checkpoint.

        First tick bootstraps each index (parquet append creates the
        directory), so build vs append needs no flag; batches must be
        disjoint in doc_id (every append-tick index's contract).
        ``minhash_params``: n / num_hashes / band_size overrides —
        MUST match across ticks (signature layout is baked in).

        Returns the survivors frame (lazy column-drop tail on the
        final checkpoint, same shape run() returns). Note the last
        stage IS materialized here — the price of feeding three
        appends without recomputing it per append.

        CALLER OBLIGATION: the survivors checkpoint
        (``self._last_checkpoint``) stays alive so the returned frame
        remains readable. A long-running ticking driver MUST call
        ``free_survivors()`` once it is done with the returned frame
        (after its own sink action), or the block manager accumulates
        one batch-sized block set per tick — measured as a 4.7 s →
        13.5 s per-tick degradation over a ~100-query session before
        the registry adopted the discipline (commit 6cd8115)."""
        if self.stages and self.stages[-1]["op"] in _TERMINAL_OPS:
            raise ValueError(
                "run_and_maintain needs doc-grain output: the persisted "
                "indexes are (doc, ...) artifacts, but the final stage "
                f"{self.stages[-1]['op']!r} changes the row grain"
            )
        from ..functions.text import tokenize as _tokenize

        out = self._execute(
            docs, benchmark, lm_train, seed_pos, seed_neg,
            checkpoint_stages=True, counts=None, maintain_tokens=True,
        )
        frame = self._last_checkpoint
        if frame is None:  # zero-stage pipeline: materialize directly
            frame = docs.withColumn(
                _TOKENS_COL, _tokenize(F.col(self.text_col))
            ).localCheckpoint(eager=True)
            self._last_checkpoint = frame
            out = frame.drop(_TOKENS_COL)

        from .corpus import append_shingle_index, append_token_count_index
        from .dedup import append_minhash_index

        if minhash_index is not None:
            append_minhash_index(
                frame,
                minhash_index,
                self.id_col,
                self.text_col,
                tokens_col=_TOKENS_COL,
                **(minhash_params or {}),
            )
        if token_count_index is not None:
            append_token_count_index(
                frame, token_count_index, self.text_col,
                tokens_col=_TOKENS_COL,
            )
        if shingle_index is not None:
            append_shingle_index(
                frame, shingle_index, shingle_n, self.id_col,
                self.text_col, tokens_col=_TOKENS_COL,
            )
        return out

    def free_survivors(self) -> None:
        """Release the survivors checkpoint a run_and_maintain tick
        left alive (see its CALLER OBLIGATION note). Idempotent; the
        frame returned by that tick must not be read afterwards."""
        if self._last_checkpoint is not None:
            from ..session import free_local_checkpoint

            free_local_checkpoint(self._last_checkpoint)
            self._last_checkpoint = None

    def _execute(
        self,
        docs: DataFrame,
        benchmark, lm_train, seed_pos, seed_neg,
        checkpoint_stages: bool,
        counts: list[dict] | None,
        maintain_tokens: bool = False,
    ) -> DataFrame:
        from ..functions.text import tokenize
        from ..session import free_local_checkpoint

        ctx = {
            "id_col": self.id_col,
            "text_col": self.text_col,
            "benchmark": benchmark,
            "lm_train": lm_train,
            "seed_pos": seed_pos,
            "seed_neg": seed_neg,
        }
        ops = [st["op"] for st in self.stages]
        out = docs
        owned = None  # previous stage's checkpoint, freed after the next

        def inject_tokens(df: DataFrame) -> DataFrame:
            ctx["tokens_col"] = _TOKENS_COL
            return df.withColumn(
                _TOKENS_COL, tokenize(F.col(self.text_col))
            )

        # first stage already consumes tokens AND another consumer
        # follows: worth one extra input materialization so both read
        # the same token frame (a lone leading consumer tokenizes
        # inside its own operator exactly once — nothing to share)
        if (
            checkpoint_stages
            and ops
            and ops[0] in _TOKEN_CONSUMERS
            and any(o in _TOKEN_CONSUMERS for o in ops[1:])
        ):
            out = inject_tokens(out).localCheckpoint(eager=True)
            owned = out
        for i, st in enumerate(self.stages):
            params = {k: v for k, v in st.items() if k != "op"}
            out = STAGE_OPS[st["op"]](out, params, ctx)
            # the LAST stage is never checkpointed: its output goes to
            # the caller's one action (write/collect) anyway, so a
            # final materialization would pay the full frame twice;
            # it stays a lazy tail on the previous stage's checkpoint
            # (which is deliberately NOT freed — the tail reads it).
            # counts-mode still checkpoints everything: report()'s
            # count IS an action per stage.
            last = i + 1 == len(ops)
            if checkpoint_stages and (
                not last or counts is not None or maintain_tokens
            ):
                if st["op"] in _TEXT_MUTATORS and "tokens_col" in ctx:
                    out = out.drop(_TOKENS_COL)
                    del ctx["tokens_col"]
                # inject at the LATEST boundary before the next
                # consumer (rows only shrink, so later = fewer rows
                # tokenized), and only when ≥2 consumers remain — a
                # lone consumer tokenizes once inside its own operator
                # anyway, so sharing would just bloat the checkpoint.
                # maintain_tokens additionally guarantees the FINAL
                # checkpoint carries the token column (over the final
                # text), so run_and_maintain's index appends derive
                # from one materialized token frame of the survivors.
                if "tokens_col" not in ctx and (
                    (maintain_tokens and last)
                    or (
                        i + 1 < len(ops)
                        and ops[i + 1] in _TOKEN_CONSUMERS
                        and sum(
                            o in _TOKEN_CONSUMERS for o in ops[i + 1:]
                        )
                        >= 2
                    )
                ):
                    out = inject_tokens(out)
                out = out.localCheckpoint(eager=True)
                if owned is not None:
                    free_local_checkpoint(owned)
                owned = out
            if counts is not None:
                counts.append({"stage": st["op"], "rows": out.count()})
        # the final checkpoint handle, BEFORE any column-drop wrapper —
        # free_local_checkpoint needs the LogicalRDD frame itself
        # (report() uses this to release the last stage's blocks)
        self._last_checkpoint = owned
        if "tokens_col" in ctx:
            out = out.drop(_TOKENS_COL)
        return out

    def report(
        self,
        docs: DataFrame,
        benchmark: DataFrame | None = None,
        lm_train: DataFrame | None = None,
        seed_pos: DataFrame | None = None,
        seed_neg: DataFrame | None = None,
    ) -> list[dict]:
        """Per-stage survivor counts for pipeline tuning runs. Same
        execution as run() (per-stage checkpoints + shared token
        frame — counting each lazily-composed prefix would re-execute
        earlier stages per count on top of the double-reference cost);
        the final checkpoint is freed before returning since only the
        counts survive."""
        from ..session import free_local_checkpoint

        rows = [{"stage": "input", "rows": docs.count()}]
        out = self._execute(
            docs, benchmark, lm_train, seed_pos, seed_neg,
            checkpoint_stages=True, counts=rows,
        )
        free_local_checkpoint(self._last_checkpoint or out)
        return rows
