"""Corpus-curation pipeline: the training-data operators composed
end-to-end over a documents table (doc_id, text, ...).

Stages (each DataFrame-native; shuffles only in dedup and the final
partitioned write):

  1. exact dedup        — keep the min-id doc per normalized-text group
  2. near-dup removal   — MinHash+LSH verified pairs; drop the higher id
                          of each pair
  3. quality gate       — quality_score_col >= min_quality basis points
  4. repetition gate    — drop Gopher-flagged degenerate/repetitive docs
  5. language gate      — trigram language ID == lang (None = skip)
  6. split assignment   — hash-bucket train/val/test (80/10/10),
                          leakage-safe (pure function of doc_id)

``curate_documents_full`` adds the round-2 stages around the same core:
benchmark decontamination (before the gates), PII redaction (after
them), deterministic per-source mixing, and token-budget sequence
packing — the full modern pretraining-data shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cloud_ocr_summarizer_spark.functions.hashing import hash_split_col
from cloud_ocr_summarizer_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
)
from cloud_ocr_summarizer_spark.operators.textstats import (
    language_id_scores,
    quality_score_col,
    redacted_text_col,
    repetition_flagged_col,
)


def curate_documents(
    docs: DataFrame,
    *,
    min_quality: int = 3000,
    lang: str | None = None,
    neardup_threshold: float = 0.8,
    parallelism: int | None = None,
    checked: bool = False,
) -> DataFrame:
    """documents -> curated documents with a ``split`` column.

    ``checked=True`` swaps the near-dup stage to the cross-engine
    md5/affine MinHash variant so the WHOLE composed pipeline is
    reproducible in DuckDB (driver query ``curation_checked``); the
    default keeps the faster xxhash path for production runs — the two
    share every other stage.
    """
    # gate inputs computed from the ORIGINAL docs, not mid-pipeline
    # lineage: pred_lang is a pure per-doc function, a superset of
    # flagged ids joins to the identical result, and deriving it
    # downstream would re-execute the whole dedup cascade once per gate.
    # (The repetition gate needs no such branch anymore: the flag is a
    # row-local expression, applied inline as a filter below.)
    lang_pred = (
        None
        if lang is None
        else language_id_scores(docs).select("doc_id", "pred_lang")
    )

    keepers = exact_duplicates(docs).select(F.col("keeper").alias("doc_id"))
    docs = docs.join(keepers, "doc_id", "left_semi")

    if checked:
        from cloud_ocr_summarizer_spark.operators.dedup import (
            minhash_lsh_pairs_checked,
        )

        pair_fn = minhash_lsh_pairs_checked
    else:
        pair_fn = minhash_lsh_pairs
    pairs = pair_fn(
        docs,
        n=3,
        num_hashes=32,
        bands=8,
        threshold=neardup_threshold,
        parallelism=parallelism,
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")

    docs = docs.filter(quality_score_col(F.col("text")) >= min_quality)

    # row-local repetition gate: a plain filter (was an anti-join against
    # an exploded-aggregation branch — one less shuffle, same kept set)
    docs = docs.filter(
        ~F.coalesce(repetition_flagged_col(F.col("text")), F.lit(False))
    )

    if lang_pred is not None:
        docs = (
            docs.join(lang_pred, "doc_id")
            .filter(F.col("pred_lang") == lang)
            .drop("pred_lang")
        )

    return docs.withColumn("split", hash_split_col(F.col("doc_id")))


def curate_documents_full(
    docs: DataFrame,
    *,
    benchmark: DataFrame | None = None,
    contamination_n: int = 8,
    mix_fractions: dict[str, float] | None = None,
    pack_budget: int | None = 2048,
    line_clean: bool = False,
    persisted: list | None = None,
    **curate_kwargs,
) -> DataFrame:
    """The full pretraining-data pipeline around ``curate_documents``:

      C4 line cleaning (``line_clean=True``, the C4 stage order:
        boilerplate lines strip BEFORE dedup so they can't fuse
        near-duplicates; row-local, adds no exchange)
      -> dedup/gates/split (core)
      -> drop docs sharing an ``contamination_n``-gram with ``benchmark``
      -> redact PII in the surviving text
      -> per-source mixing rates (``mix_fractions``, None = keep all)
      -> token-budget packing metadata (bucket, bin_id, fill_pos)

    Output: (doc_id, source, split, text [redacted], n_tokens
    [, bucket, bin_id, fill_pos]).  Every stage is the already-tested
    operator; this function only fixes the composition order: decontam
    runs on the deduped set (fewer docs to gram-join), redaction after
    the gates (quality scores see the original text), packing last (bins
    reflect the final kept set).

    The curated core is persisted before the self-referencing stages:
    decontamination anti-joins ``kept`` against grams OF ``kept``, and
    packing joins the output back on doc_id — without the persist each
    side of those joins would re-execute the whole dedup cascade.
    Redaction is applied as an in-place regexp chain (row-local), never
    a join.

    The cached frames outlive this function by design (the returned
    DataFrame's plan references them).  Pass ``persisted=[]`` to receive
    them and call ``.unpersist()`` after your terminal action — otherwise
    they stay cached for the session (fine for one-shot jobs, a leak in a
    long-lived service looping over corpora).
    """
    from cloud_ocr_summarizer_spark.functions.text import whitespace_tokens_col
    from cloud_ocr_summarizer_spark.operators.dedup import contaminated_doc_ids
    from cloud_ocr_summarizer_spark.operators.sampling import (
        hash_sample,
        pack_sequences,
    )

    if line_clean:
        # C4 line cleaning runs FIRST (the C4 order): boilerplate lines
        # are stripped before dedup so nav/cookie fragments can't fuse
        # near-duplicate documents, and lorem-ipsum pages drop outright.
        # Row-local stage — adds no exchange ahead of the dedup cascade.
        from cloud_ocr_summarizer_spark.operators.linesclean import (
            c4_line_filter,
        )

        passthrough = tuple(c for c in docs.columns if c not in ("doc_id", "text"))
        cleaned = c4_line_filter(docs, keep=passthrough)
        docs = cleaned.where(F.col("doc_kept")).select(
            "doc_id",
            *passthrough,
            F.col("clean_text").alias("text"),
        )

    kept = curate_documents(docs, **curate_kwargs).persist()
    if persisted is not None:
        persisted.append(kept)

    if benchmark is not None:
        # membership-only decontamination: identical contaminated set to
        # ngram_contamination (any shared n-gram; membership equality
        # verified at 10^6 docs) but non-hit grams die at the broadcast
        # semi-join probe instead of flowing into a per-doc statistics
        # aggregate.  Wall is explode-scan-bound so the gain is small
        # (~2% at 10^6, interleaved A/B); the real win is state — no
        # hash-agg over every (doc, gram) group, only the rare hit ids.
        contaminated = contaminated_doc_ids(
            kept, benchmark, n=contamination_n
        )
        kept = kept.join(contaminated, "doc_id", "left_anti")

    kept = kept.withColumn("text", redacted_text_col(F.col("text")))

    if mix_fractions is not None:
        kept = hash_sample(kept, stratum_col="source", fractions=mix_fractions)

    out = kept.select(
        "doc_id",
        "source",
        "split",
        "text",
        F.size(whitespace_tokens_col(F.col("text"))).alias("n_tokens"),
    )
    if pack_budget is not None:
        out = out.persist()
        if persisted is not None:
            persisted.append(out)
        packed = pack_sequences(
            out.select("doc_id", "n_tokens"), budget=pack_budget
        ).drop("n_tokens")
        out = out.join(packed, "doc_id")
    return out


def curation_cap_audit(
    docs: DataFrame,
    *,
    embeddings: DataFrame | None = None,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int = 4096,
    max_gram_df: int = 256,
    simhash_bits: int = 24,
    simhash_bands: int = 4,
    simhash_max_bucket_size: int | None = None,
    embedding_block_col: str = "label",
    max_block_size: int = 65536,
    parallelism: int | None = None,
    after_exact_dedup: bool = True,
) -> DataFrame:
    """Drop accounting for every silent cap in the curation/dedup layer.

    One row per cap — (cap_name, cap_value, dropped_groups, dropped_rows)
    — including explicit zeros when a cap never fired: at 10^12 docs the
    caps WILL fire, and a run that silently skipped the most-duplicated
    content must be distinguishable from one that didn't.  Run it
    alongside ``curate_documents_full`` with the SAME cap parameters and
    sink the rows next to the lineage table.  Each audit reuses the exact
    stage its cap filters (shared helpers in operators/dedup.py).

    Positioning and family, honestly stated: with ``after_exact_dedup``
    (default) the LSH/SimHash audits run on the exact-dedup survivors —
    the same frame ``curate_documents`` feeds its near-dup stage, so a
    mass of byte-identical docs doesn't show up as LSH drops that the
    pipeline never actually took.  The audits use the md5/affine
    (checked) hash family: exact accounting for the ``checked=True``
    pipeline (the one the driver value-checks); for xxhash production
    runs, over-cap DEGENERATE buckets (near-identical docs) coincide by
    construction, but non-degenerate bucket membership can differ —
    treat those counts as directional, not bit-exact.  The gram-df audit
    runs on the raw corpus (ngram_jaccard_pairs is a standalone
    operator, not a pipeline stage).
    """
    from cloud_ocr_summarizer_spark.operators.dedup import (
        exact_duplicates,
        lsh_bucket_drop_audit,
        ngram_gram_df_drop_audit,
        simhash_bucket_drop_audit,
    )

    lsh_input = docs
    if after_exact_dedup:
        keepers = exact_duplicates(docs).select(F.col("keeper").alias("doc_id"))
        lsh_input = docs.join(keepers, "doc_id", "left_semi")

    audits = [
        ngram_gram_df_drop_audit(docs, n=n, max_gram_df=max_gram_df),
        lsh_bucket_drop_audit(
            lsh_input,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
            max_bucket_size=max_bucket_size,
            parallelism=parallelism,
        ),
        simhash_bucket_drop_audit(
            lsh_input,
            bits=simhash_bits,
            bands=simhash_bands,
            max_bucket_size=(
                max_bucket_size
                if simhash_max_bucket_size is None
                else simhash_max_bucket_size
            ),
        ),
    ]
    if embeddings is not None:
        from cloud_ocr_summarizer_spark.operators.similarity import (
            embedding_block_drop_audit,
        )

        audits.append(
            embedding_block_drop_audit(
                embeddings,
                block_col=embedding_block_col,
                max_block_size=max_block_size,
            )
        )
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out
