#!/usr/bin/env python
"""Hot-destination skew bench for the graph family (VERDICT r4 item 8).

Web in-degree is power-law; the round-5 bounded two-level merges in
``inbound_anchor_texts`` and ``harmonic_centrality_kmv`` (and map-side
partial aggregation in PageRank's ``groupBy dst``) exist so ONE hot
target cannot serialize the job on a single aggregation buffer.  This
bench evidences that on a corpus where ~10% of ALL edges land on doc 0
(``derive_linkgraph_html_from_documents(hot_dst_every=10)``):

* pagerank / anchor_texts / harmonic on the UNIFORM corpus vs the
  HOT corpus — the hot wall must stay near the uniform wall;
* anchor_texts and harmonic additionally at ``n_salts=1`` (the level-1
  pre-reduce degenerates to a single per-dst buffer — the exact naive
  shape VERDICT r4 flagged) vs the shipped default on the hot corpus —
  the contrast the classified_skew A/B established for extraction.

Every (corpus, job) cell is timed in its OWN fresh process: iterative
jobs leave localCheckpoint blocks behind that Dataset.unpersist cannot
release (ContextCleaner reclaims them asynchronously), so in-session
sequencing bleeds memory pressure from one cell into the next — a
first cut of this bench measured hot PageRank 3.6x slower than a
fresh-session run of the identical job for exactly that reason.

Writes BENCH/graph_skew.json + a BASELINE.md section.

Usage:
  python tools/bench_graph_skew.py worker <corpus> <job>   # one cell
  python tools/bench_graph_skew.py                         # orchestrate
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
HOT_EVERY = 10  # ~10% of all edges redirected onto doc 0
CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")

JOBS = ("pagerank", "anchor", "harmonic", "hits", "components",
        "anchor_salts1", "harmonic_salts1")


def _html_path(corpus: str) -> str:
    return os.path.join(CACHE, f"graph_skew_{corpus}_{N_DOCS}.parquet")


def prepare() -> None:
    """Materialize both HTML corpora once (so every cell scans parquet)."""
    from tools.bench_html_layout import build_corpus

    from cloud_ocr_summarizer_spark.operators.linkgraph import (
        derive_linkgraph_html_from_documents,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name="bench-graph-skew-prep", cores=32)
    docs = spark.read.parquet(build_corpus(spark, N_DOCS))
    for name, hot in (("uniform", None), ("hot", HOT_EVERY)):
        path = _html_path(name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            derive_linkgraph_html_from_documents(
                docs, hot_dst_every=hot
            ).write.mode("overwrite").parquet(path)
    spark.stop()


def worker(corpus: str, job: str) -> None:
    import time

    from tools.bench_html_layout import corpus_path

    from cloud_ocr_summarizer_spark.operators.linkgraph import (
        extract_outlinks,
        harmonic_centrality_kmv,
        hits_scores,
        inbound_anchor_texts,
        link_components,
        pagerank,
    )
    from cloud_ocr_summarizer_spark.session import get_spark

    spark = get_spark(app_name=f"bench-graph-skew-{corpus}-{job}", cores=32)
    docs = spark.read.parquet(corpus_path(N_DOCS))
    html = spark.read.parquet(_html_path(corpus))
    # edges only for the jobs that consume them: the anchor cells must
    # not pay a 1M-doc parse + distinct shuffle, nor hold ~2M-edge
    # checkpoint blocks resident, during THEIR timed runs (the same
    # in-session pollution trap documented below for the first cut)
    edges = None
    if job in ("pagerank", "harmonic", "harmonic_salts1", "hits",
               "components"):
        edges = extract_outlinks(html).localCheckpoint()  # parse once, eager

    make = {
        "pagerank": lambda: pagerank(docs, edges, n_iter=5),
        "anchor": lambda: inbound_anchor_texts(html),
        "harmonic": lambda: harmonic_centrality_kmv(docs, edges, n_iter=3),
        "anchor_salts1": lambda: inbound_anchor_texts(html, n_salts=1),
        "harmonic_salts1": lambda: harmonic_centrality_kmv(
            docs, edges, n_iter=3, n_salts=1
        ),
        "hits": lambda: hits_scores(docs, edges, n_iter=3),
        "components": lambda: link_components(docs, edges, n_iter=4),
    }[job]

    def run() -> float:
        t0 = time.monotonic()
        make().write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run()  # warm-up
    best = round(min(run() for _ in range(2)), 3)
    extra = {}
    if corpus == "hot" and job == "pagerank":
        extra["hot_inbound_edges"] = edges.where(
            edges.dst_doc_id == 0
        ).count()
    print("CELL " + json.dumps({"sec": best, **extra}))


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2], sys.argv[3])
        return 0
    prepare()
    out: dict = {"n_docs": N_DOCS, "hot_dst_every": HOT_EVERY,
                 "isolation": "fresh process per (corpus, job) cell"}
    cells = [("uniform", j) for j in JOBS[:5]] + [("hot", j) for j in JOBS]
    for corpus, job in cells:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker", corpus, job],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("CELL ")]
        if not line:
            print(f"FAILED {corpus}/{job}: {p.stderr[-2000:]}")
            return 1
        cell = json.loads(line[0][len("CELL "):])
        out.setdefault(corpus, {})[f"{job}_sec"] = cell["sec"]
        if "hot_inbound_edges" in cell:
            out["hot"]["hot_inbound_edges"] = cell["hot_inbound_edges"]
        print(f"{corpus} {job}: {cell}", flush=True)

    for q in ("pagerank", "anchor", "harmonic", "hits", "components"):
        out[f"hot_over_uniform_{q}"] = round(
            out["hot"][f"{q}_sec"] / out["uniform"][f"{q}_sec"], 3
        )
    with open(os.path.join(REPO, "BENCH", "graph_skew.json"), "w",
              encoding="utf-8") as f:
        json.dump(out, f)

    u, h = out["uniform"], out["hot"]
    lines = [
        "", "## Hot-destination graph skew A/B (round 5)",
        "",
        f"local[32], fresh process per cell, warm best-of-2, {N_DOCS:,}",
        f"docs; the hot corpus redirects ~1/{HOT_EVERY} of all edges onto",
        f"doc 0 ({h.get('hot_inbound_edges', 0):,} inbound edges on one",
        "key). Bounded two-level merges keep the hot wall near the",
        "uniform wall; n_salts=1 degenerates level 1 to one per-dst",
        "buffer (the naive shape VERDICT r4 flagged):", "",
        "| job | uniform | hot | hot/uniform | hot n_salts=1 |",
        "|---|---|---|---|---|",
        f"| pagerank (5 it) | {u['pagerank_sec']} s | {h['pagerank_sec']} s "
        f"| {out['hot_over_uniform_pagerank']} | — |",
        f"| anchor_texts | {u['anchor_sec']} s | {h['anchor_sec']} s "
        f"| {out['hot_over_uniform_anchor']} | {h['anchor_salts1_sec']} s |",
        f"| harmonic (3 it) | {u['harmonic_sec']} s | {h['harmonic_sec']} s "
        f"| {out['hot_over_uniform_harmonic']} | {h['harmonic_salts1_sec']} s |",
        f"| HITS (3 it) | {u['hits_sec']} s | {h['hits_sec']} s "
        f"| {out['hot_over_uniform_hits']} | — |",
        f"| components (4 it) | {u['components_sec']} s | {h['components_sec']} s "
        f"| {out['hot_over_uniform_components']} | — |",
        "",
    ]
    from tools.mdsection import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        "## Hot-destination graph skew A/B (round 5)",
        "\n".join(lines).lstrip("\n"),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
