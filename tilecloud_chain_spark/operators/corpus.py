"""The composed text-corpus admission capstone (r8 — the text-side twin
of ``operators/image_curation.py:image_admission``): one call that runs
the full crawl-to-training-corpus decision a real LLM data pipeline makes,

    html_extract -> langid -> lm perplexity -> quality -> PII redaction
    -> exact + near dedup -> benchmark decontamination -> shard packing

and returns ONE row per document with every stage flag, the final
``admitted`` boolean, and (for admitted docs) the token-stream packing
coordinates. Stage helpers are single-source: the resumable staged plan
(``plans/corpus.py:curate_corpus``) composes exactly these functions, so
the staged result is row-identical to this operator (gate-pinned).

Scale shape: every stage is the already-scale-shaped operator it wraps —
one Arrow stage for extraction, broadcast-joined micro-integer models for
langid/LM, pure-Column quality/PII, collapsed-LSH star edges + CC for
near-dup, broadcast eval shingles for decontamination, distributed prefix
sum for packing. The composition adds only narrow flag-table joins keyed
by doc_id (hash joins on a single long key — no wide rows in any
shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tilecloud_chain_spark.operators import dedup as DD
from tilecloud_chain_spark.operators import lm as LM
from tilecloud_chain_spark.operators import text as TX
from tilecloud_chain_spark.operators.html import html_extract
from tilecloud_chain_spark.operators.langid import langid_ngram_udf


def extract_stage(
    pages: DataFrame,
    *,
    max_link_density: float = 0.4,
    min_block_chars: int = 25,
    stopwords=None,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """(doc_id, clean_text, n_blocks_kept, n_blocks_dropped)."""
    return html_extract(
        pages, max_link_density, min_block_chars,
        id_col=id_col, html_col=html_col, stopwords=stopwords,
    )


def _redacted_cols(c) -> tuple:
    """The redaction projection, single-source for :func:`redact_stage`
    and the composed operator's fused row pin: (text, n_pii) columns over
    the clean-text column ``c``."""
    pii = TX.pii_counts(c)
    return (
        TX.redact_pii(c).alias("text"),
        (pii["email"] + pii["phone"] + pii["ipv4"]).cast("int").alias("n_pii"),
    )


def _quality_col(c, min_tokens: int, max_repetition: float):
    """The corpus-hygiene floor rule as one boolean Column over the
    clean-text column ``c`` — single-source for :func:`quality_stage` and
    the composed operator's fused row pin."""
    return (
        (TX.token_count(c) >= min_tokens)
        & (TX.repetition_ratio(c) <= F.lit(max_repetition))
    ).alias("quality_keep")


def redact_stage(extracted: DataFrame) -> DataFrame:
    """(doc_id, text, n_pii) — PII-scrubbed clean text; ``n_pii`` is the
    total typed-match count (audit column)."""
    return extracted.select("doc_id", *_redacted_cols(F.col("clean_text")))


def lang_stage(extracted: DataFrame, profiles: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_score) over the extracted clean text.

    Runs the Arrow SCALE twin (broadcast profile dict, no gram explode,
    no shuffle) — property-tested identical to the SQL-expressible
    ``langid_ngram``, so the composed DuckDB oracle (which recomputes the
    SQL form) still matches hash-exactly. At sf0.1 the SQL form's gram
    explode + profile join costs ~16 s against the twin's ~1 s."""
    return langid_ngram_udf(
        extracted.select("doc_id", F.col("clean_text").alias("text")),
        profiles,
    ).select("doc_id", "lang_pred", F.col("score").alias("lang_score"))


def lm_stage(
    extracted: DataFrame,
    bigram_weights: DataFrame,
    prefix_backoff: DataFrame,
    keep_threshold_micro: int = LM.KEEP_THRESHOLD_MICRO,
) -> DataFrame:
    """(doc_id, lm_keep) — perplexity gate over the extracted clean text
    (Arrow scale twin: broadcast weight dicts, no bigram explode —
    property-tested identical to ``lm_score``, oracle-compatible)."""
    return LM.lm_score_udf(
        extracted.select("doc_id", F.col("clean_text").alias("text")),
        bigram_weights, prefix_backoff,
        keep_threshold_micro=keep_threshold_micro,
    ).select("doc_id", F.col("keep").alias("lm_keep"))


def quality_stage(
    extracted: DataFrame,
    min_tokens: int = 5,
    max_repetition: float = 0.8,
) -> DataFrame:
    """(doc_id, quality_keep) — the corpus-hygiene floor rule (token count
    + repetition ratio, the ``clean_corpus`` convention); the full Gopher
    rule set stays available as ``text.gopher_keep`` for corpora long
    enough to clear its 50-token floor."""
    return extracted.select(
        "doc_id",
        _quality_col(F.col("clean_text"), min_tokens, max_repetition),
    )


def scored_rows_stage(
    extracted: DataFrame,
    langid_profiles: DataFrame,
    lm_model: tuple[DataFrame, DataFrame],
    *,
    lm_threshold_micro: int = LM.KEEP_THRESHOLD_MICRO,
    min_tokens: int = 5,
    max_repetition: float = 0.8,
    scores_only: bool = False,
) -> DataFrame:
    """All ROW-LOCAL stages of the admission decision in one pass:
    (doc_id, n_blocks_kept, lang_pred, lang_score, lm_keep, quality_keep,
    text, n_pii) — ``text`` is the PII-redacted clean text.

    The composed operator's fast path: langid and LM perplexity share ONE
    Arrow stage (one JVM->Python->JVM round trip over the clean text
    instead of two — the scoring closures are the exact ones the
    individual twins build, factored single-source so they cannot
    diverge), and redaction / PII counts / the quality floor are codegen
    column math layered above it. Replaces three separate stage scans +
    their four doc_id flag joins in ``compose_corpus_flags`` — per-stage
    resumability (the staged plan) still composes the individual stage
    helpers.

    ``scores_only=True`` returns just (doc_id, n_blocks_kept, lang_pred,
    lang_score, lm_keep) and — the point — does NOT pass ``clean_text``
    back out of the Python stage: the text crosses the Arrow boundary
    inward only, halving the stage's return bytes (guide §4.1 column
    discipline). Used by ``corpus_admission`` since r9, whose redaction/
    quality columns ride a separate JVM-only pin so this Arrow pass can
    run CONCURRENTLY with the dedup chain."""
    import pandas as pd

    from tilecloud_chain_spark.operators.langid import _profile_scorer
    from tilecloud_chain_spark.operators.lm import _bigram_scorer

    bw, pw = lm_model
    # three bounded model collects (langs x top_k profile rows, reference
    # bigram vocabulary x2) with independent lineages — run concurrently;
    # serially each paid its own job latency back-to-back
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_prof = pool.submit(langid_profiles.collect)
        f_bw = pool.submit(bw.collect)
        f_pw = pool.submit(pw.collect)
        prof_rows, bw_rows, pw_rows = (
            f_prof.result(), f_bw.result(), f_pw.result()
        )
    thr = int(lm_threshold_micro)

    def run(batches):
        lang_one = _profile_scorer(prof_rows)
        lm_one = _bigram_scorer(bw_rows, pw_rows)
        for pdf in batches:
            preds, scores, keeps = [], [], []
            for t in pdf["clean_text"]:
                p, s = lang_one(t)
                preds.append(p)
                scores.append(s)
                lp, n = lm_one(t)
                keeps.append(True if n == 0 else lp >= thr * n)
            out = pdf.drop(columns=["clean_text"]) if scores_only else pdf.copy()
            out["lang_pred"] = preds
            out["lang_score"] = pd.array(scores, dtype="float64")
            out["lm_keep"] = pd.array(keeps, dtype="bool")
            yield out

    dt = dict(extracted.dtypes)
    head = f"doc_id {dt['doc_id']}, n_blocks_kept {dt['n_blocks_kept']}, "
    tail = "lang_pred string, lang_score double, lm_keep boolean"
    src = extracted.select("doc_id", "n_blocks_kept", "clean_text")
    if scores_only:
        return src.mapInPandas(run, head + tail)
    scored = src.mapInPandas(run, head + "clean_text string, " + tail)
    c = F.col("clean_text")
    return scored.select(
        "doc_id", "n_blocks_kept", "lang_pred", "lang_score", "lm_keep",
        _quality_col(c, min_tokens, max_repetition),
        *_redacted_cols(c),
    )


def dedup_stage(redacted: DataFrame, near_threshold: float = 0.5) -> DataFrame:
    """(doc_id, exact_keep, neardup_keep) over the redacted text: exact =
    min doc_id per content hash; near = min-id representative of the
    connected component over MinHash-LSH-verified jaccard pairs (collapsed
    star-edge scale recipe, as ``clean_corpus``). Both flags come out of
    the fused single-collapse operator (``dedup.dedup_keep_flags`` — one
    md5 group aggregate instead of a group aggregate PLUS a min-over-md5
    window that re-hashed and re-shuffled every text; rep-level CC with
    member attach, the ``dedup_clusters`` equivalence)."""
    return DD.dedup_keep_flags(
        redacted.select("doc_id", "text"), threshold=near_threshold,
    )


def decontam_stage(
    redacted: DataFrame, eval_df: DataFrame, n: int = 5
) -> DataFrame:
    """(doc_id, decontam_keep) — keep iff the doc shares no n-gram with
    the (broadcast) eval set."""
    out = DD.decontaminate(redacted.select("doc_id", "text"), eval_df, n=n)
    return out.select("doc_id", (~F.col("contaminated")).alias("decontam_keep"))


def compose_corpus_flags(
    extracted: DataFrame,
    redacted: DataFrame,
    lang: DataFrame,
    lm_flags: DataFrame,
    quality: DataFrame,
    dedup_flags: DataFrame,
    decontam: DataFrame | None,
    lang_allow: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Join the narrow flag tables into the admission row (every stage
    flag + the final boolean). ``decontam`` may be None (no eval set) —
    the flag column is then literal True, mirroring the image capstone's
    optional stages."""
    out = (
        extracted.select("doc_id", "n_blocks_kept")
        .join(lang, "doc_id")
        .join(lm_flags, "doc_id")
        .join(quality, "doc_id")
        .join(redacted.select("doc_id", "n_pii"), "doc_id")
        .join(dedup_flags, "doc_id")
    )
    if decontam is not None:
        out = out.join(decontam, "doc_id")
    else:
        out = out.withColumn("decontam_keep", F.lit(True))
    lang_keep = F.col("lang_pred").isin(*lang_allow)
    admitted = (
        lang_keep & F.col("lm_keep") & F.col("quality_keep")
        & F.col("exact_keep") & F.col("neardup_keep") & F.col("decontam_keep")
    )
    return out.select(
        "doc_id", "n_blocks_kept", "lang_pred", "lang_score",
        lang_keep.alias("lang_keep"), "lm_keep", "quality_keep", "n_pii",
        "exact_keep", "neardup_keep", "decontam_keep",
        admitted.alias("admitted"),
    )


def pack_stage(
    redacted: DataFrame, flags: DataFrame, chunk_tokens: int = 2048
) -> DataFrame:
    """(doc_id, n_tokens, chunk_first, chunk_last) — token-stream packing
    over the ADMITTED documents only, in doc_id order."""
    adm = flags.filter(F.col("admitted")).select("doc_id")
    chunks = TX.token_stream_chunks(
        redacted.join(adm, "doc_id").select("doc_id", "text"),
        chunk_tokens=chunk_tokens,
    )
    return chunks.select(
        F.col("id").alias("doc_id"), "n_tokens", "chunk_first", "chunk_last"
    )


def assemble_corpus_admission(flags: DataFrame, packed: DataFrame) -> DataFrame:
    """Final admission table: flags + packing coordinates (NULL n_tokens /
    chunk span for rejected documents)."""
    return flags.join(packed, "doc_id", "left")


def corpus_admission(
    pages: DataFrame,
    langid_profiles: DataFrame,
    lm_model,
    eval_df: DataFrame | None = None,
    *,
    lang_allow: tuple[str, ...] = ("en",),
    lm_threshold_micro: int = LM.KEEP_THRESHOLD_MICRO,
    min_tokens: int = 5,
    max_repetition: float = 0.8,
    near_threshold: float = 0.5,
    decontam_n: int = 5,
    chunk_tokens: int = 2048,
    max_link_density: float = 0.4,
    min_block_chars: int = 25,
    stopwords=None,
    extracted: DataFrame | None = None,
) -> DataFrame:
    """The single-shot composed admission decision (see module docstring).

    ``pages``: (doc_id, html); ``langid_profiles``: a trained
    ``train_ngram_profiles`` table; ``lm_model``: ``train_bigram_lm``'s
    (bigram_weights, prefix_backoff) — or a 0-arg callable returning that
    tuple, in which case the training plan (and its checkpoint's
    build-time shuffle execution) is deferred into the scoring thread,
    overlapped with the dedup chain; ``eval_df``: optional (doc_id, text)
    benchmark set for decontamination.

    ``extracted``: an ALREADY-materialized ``extract_stage(pages)`` result
    (same extraction parameters) — callers that extracted the pages once
    to fit the LM / build the eval set pass it here so the Arrow
    extraction pass is not run a second time over the identical input."""
    if extracted is None:
        extracted = extract_stage(
            pages, max_link_density=max_link_density,
            min_block_chars=min_block_chars, stopwords=stopwords,
        )
        # the one upstream Python-kernel stage — pin it so the Arrow parse
        # doesn't re-run per downstream branch
        extracted = extracted.localCheckpoint(eager=False)
    # the JVM-only row columns (redaction + PII counts + the quality
    # floor) pinned FIRST, eagerly, in one codegen pass over the pinned
    # extraction: dedup, decontamination and packing read only this —
    # which frees the Arrow SCORING pass (langid + LM, the expensive
    # Python boundary crossing) to run CONCURRENTLY with the whole dedup
    # chain below instead of serially ahead of it (r8 shape: score pin,
    # THEN dedup). Eager because three threads consume it — lazy, they
    # would race the materialization and run the projection per thread.
    c = F.col("clean_text")
    red = extracted.select(
        "doc_id", *_redacted_cols(c),
        _quality_col(c, min_tokens, max_repetition),
    ).localCheckpoint(eager=True)
    redacted = red.select("doc_id", "text")
    # three independent chains given (extracted, red) — overlap them
    # (guide-standard concurrent driver jobs: the scheduler back-fills
    # executors freed by one chain's stragglers with the others' tasks;
    # actions are only sequential when driver code calls them
    # sequentially): the Arrow scoring pass (scores_only — clean text
    # crosses the boundary inward only), the dedup CC chain, and the
    # decontamination probe. Scoring and decontam are eagerly pinned
    # inside their threads so their stages actually execute there rather
    # than lazily inside the flags join below.
    from concurrent.futures import ThreadPoolExecutor

    def _scored():
        # ``lm_model`` may be a 0-arg thunk: resolving it HERE (not at
        # call time) runs the training plan construction — whose internal
        # checkpoint executes the whole training-shuffle chain at build
        # (AQE) — inside this thread, overlapped with the dedup chain
        # instead of serially before it
        model = lm_model() if callable(lm_model) else lm_model
        return scored_rows_stage(
            extracted, langid_profiles, model,
            lm_threshold_micro=lm_threshold_micro, scores_only=True,
        ).localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=3) as pool:
        fut_sc = pool.submit(_scored)
        fut_dd = pool.submit(dedup_stage, redacted, near_threshold)
        fut_ct = (
            pool.submit(
                lambda: decontam_stage(redacted, eval_df, decontam_n)
                .localCheckpoint(eager=True)
            )
            if eval_df is not None else None
        )
        scored, dedup_flags = fut_sc.result(), fut_dd.result()
        decontam_flags = fut_ct.result() if fut_ct is not None else None
    out = (
        scored
        .join(red.select("doc_id", "n_pii", "quality_keep"), "doc_id")
        .join(dedup_flags, "doc_id")
    )
    if decontam_flags is not None:
        out = out.join(decontam_flags, "doc_id")
    else:
        out = out.withColumn("decontam_keep", F.lit(True))
    lang_keep = F.col("lang_pred").isin(*lang_allow)
    admitted = (
        lang_keep & F.col("lm_keep") & F.col("quality_keep")
        & F.col("exact_keep") & F.col("neardup_keep") & F.col("decontam_keep")
    )
    flags = out.select(
        "doc_id", "n_blocks_kept", "lang_pred", "lang_score",
        lang_keep.alias("lang_keep"), "lm_keep", "quality_keep", "n_pii",
        "exact_keep", "neardup_keep", "decontam_keep",
        admitted.alias("admitted"),
    )
    # consumed twice (pack filter + final join) — pin the narrow flag table
    flags = flags.localCheckpoint(eager=False)
    packed = pack_stage(redacted, flags, chunk_tokens)
    return assemble_corpus_admission(flags, packed)
