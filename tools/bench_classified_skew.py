#!/usr/bin/env python
"""Media-heavy/mega-doc skew A/B for the composed north-rule job
(extract_web_documents_classified_fused).

The flagship extractor has its row-size skew A/B (tools/bench_skew.py:
split_heavy_docs); THIS tool covers the composed classified pipeline,
which is a pure map job — so the skew lever is task PLACEMENT, the
north rule's "salted repartitioning on hash(doc_id)":

  corpus  = N_LIGHT ordinary docs (~40 words) + N_MEGA mega-docs
            (MEGA_WORDS words each), mega docs written as ONE parquet
            file so the naive scan colocates them in one task —
            SURVEY §4.3(1)'s media-heavy cluster, worst-case layout.
  A naive = fused job straight off the scan: the mega file's task
            serializes all mega work -> straggler wall.
  B salted= .repartition(SALT_PARTS, hash-of-doc_id) first: the 1
            extra round-robin-ish shuffle spreads the mega rows across
            distinct tasks and interleaves them with light work.
  floor   = light-only corpus wall (what A/B would cost with no skew).

A mega ROW still binds one task (a row cannot split); B's win is bounded
by max(one mega doc, light share) per task — that bound is printed too.
Writes BENCH/classified_skew.json + a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_html_layout import build_corpus  # noqa: E402

N_LIGHT = 200_000
N_MEGA = 8
MEGA_WORDS = 400_000
SALT_PARTS = 256


def build_mega(spark, path: str) -> str:
    """N_MEGA deterministic mega-docs, one parquet file (worst layout)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        vocab = F.array(*[F.lit(w) for w in (
            "media", "heavy", "figure", "chart", "image", "plate",
            "diagram", "panel", "table", "frame",
        )])
        words = F.transform(
            F.sequence(F.lit(1), F.lit(MEGA_WORDS)),
            lambda i: F.element_at(
                vocab, (F.pmod(i * 7 + F.col("doc_id") * 13, F.lit(10)) + 1).cast("int")
            ),
        )
        (
            spark.range(10_000_000, 10_000_000 + N_MEGA)
            .withColumnRenamed("id", "doc_id")
            .select(
                "doc_id",
                F.array_join(words, " ").alias("text"),
                F.lit("src_mega").alias("source"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def main() -> int:
    from cloud_ocr_summarizer_spark.plans.extract_web import (
        extract_web_documents_classified_fused,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-classified-skew", cores=32)
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")
    light = spark.read.parquet(build_corpus(spark, N_LIGHT))
    mega = spark.read.parquet(
        build_mega(spark, os.path.join(cache, f"mega_docs_{N_MEGA}x{MEGA_WORDS}.parquet"))
    )
    skewed = light.unionByName(mega)

    def timed(make_df) -> float:
        def run() -> float:
            t0 = time.monotonic()
            make_df().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        run()  # warm-up
        return min(run() for _ in range(3))

    # interleave A,B,A,B inside one window (host-noise protocol)
    floor_s = timed(lambda: extract_web_documents_classified_fused(light))
    naive_s = timed(lambda: extract_web_documents_classified_fused(skewed))
    salted_s = timed(
        lambda: extract_web_documents_classified_fused(
            skewed.repartition(SALT_PARTS, F.xxhash64("doc_id"))
        )
    )
    naive_s = min(naive_s, timed(lambda: extract_web_documents_classified_fused(skewed)))
    salted_s = min(
        salted_s,
        timed(
            lambda: extract_web_documents_classified_fused(
                skewed.repartition(SALT_PARTS, F.xxhash64("doc_id"))
            )
        ),
    )

    out = {
        "n_light": N_LIGHT,
        "n_mega": N_MEGA,
        "mega_words": MEGA_WORDS,
        "salt_partitions": SALT_PARTS,
        "light_only_sec": round(floor_s, 3),
        "naive_colocated_sec": round(naive_s, 3),
        "salted_repartition_sec": round(salted_s, 3),
        "speedup_naive_over_salted": round(naive_s / salted_s, 3),
        "note": (
            "mega docs share one parquet file (worst-case layout); B adds one "
            "repartition(256, xxhash64(doc_id)) before the fused map stage; a "
            "single mega row still lower-bounds one task"
        ),
    }
    with open(os.path.join(REPO, "BENCH", "classified_skew.json"), "w",
              encoding="utf-8") as f:
        json.dump(out, f)
    print(json.dumps(out))

    lines = [
        "## Skew A/B: composed classified job under a media-heavy cluster",
        "",
        f"{N_LIGHT:,} ordinary docs + {N_MEGA} mega-docs of {MEGA_WORDS:,} words",
        "each, the mega docs colocated in ONE parquet file (worst layout).",
        "local[32], best-of-3 warm, interleaved in one window:", "",
        "| variant | wall |",
        "|---|---|",
        f"| light corpus only (floor) | {out['light_only_sec']} s |",
        f"| naive scan (mega colocated) | {out['naive_colocated_sec']} s |",
        f"| + repartition(256, xxhash64(doc_id)) | {out['salted_repartition_sec']} s |",
        "",
        f"Salted spread is {out['speedup_naive_over_salted']}x faster than the",
        "colocated scan; a mega ROW still binds one task (rows cannot split),",
        "so the floor for B is max(one mega doc, per-task light share).",
        "",
    ]
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        '## Skew A/B: composed classified job under a media-heavy cluster',
        "\n".join(lines),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
