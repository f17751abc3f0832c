"""Redirect-chain resolution: chains, loops, truncation, invariance."""

from pyspark.sql import functions as F

from cloud_ocr_summarizer_spark.operators.redirects import (
    derive_redirects_from_documents,
    redirect_audit,
    resolve_redirects,
)


def _docs(spark, n=24):
    return spark.createDataFrame(
        [(i, f"t{i}", f"src{i % 2}", ["en", "de"][i % 2]) for i in range(n)],
        "doc_id long, text string, source string, lang string",
    )


def _edges(spark, rows):
    return spark.createDataFrame(
        [(s, 301, d) for s, d in rows],
        "src_url string, http_status int, dst_url string",
    )


def test_chain_shapes_resolve(spark):
    res = {
        r.url: r
        for r in resolve_redirects(
            derive_redirects_from_documents(_docs(spark))
        ).collect()
    }
    u = lambda d: f"http://r{d % 10}.example.net/p/{d}"
    # r=1/2/3 chains end at the r=0 terminal with exact hop counts
    assert (res[u(9)].final_url, res[u(9)].n_hops, res[u(9)].status) == (u(8), 1, "ok")
    assert (res[u(10)].final_url, res[u(10)].n_hops, res[u(10)].status) == (u(8), 2, "ok")
    assert (res[u(11)].final_url, res[u(11)].n_hops, res[u(11)].status) == (u(8), 3, "ok")
    # r=4 self-loop: the closing edge is counted
    assert (res[u(12)].final_url, res[u(12)].n_hops, res[u(12)].status) == (u(12), 1, "loop")
    # r=5/6 two-cycle: both entries detect the loop at hop 2
    assert (res[u(13)].final_url, res[u(13)].n_hops, res[u(13)].status) == (u(13), 2, "loop")
    assert (res[u(14)].final_url, res[u(14)].n_hops, res[u(14)].status) == (u(14), 2, "loop")


def test_corpus_max_dangling_edge_is_terminal(spark):
    # n=22 -> max doc_id 21, r=5: its edge points at the nonexistent
    # doc 22, which has no outgoing edge -> 1-hop ok, not a loop
    res = {
        r.url: r
        for r in resolve_redirects(
            derive_redirects_from_documents(_docs(spark, 22))
        ).collect()
    }
    row = res["http://r1.example.net/p/21"]
    assert (row.final_url, row.n_hops, row.status) == (
        "http://r2.example.net/p/22",
        1,
        "ok",
    )


def test_truncation_is_reported_not_dropped(spark):
    edges = _edges(spark, [(f"u{i}", f"u{i + 1}") for i in range(6)])
    res = {r.url: r for r in resolve_redirects(edges, max_hops=3).collect()}
    assert res["u0"].status == "truncated" and res["u0"].n_hops == 3
    assert res["u0"].final_url == "u3"
    assert res["u3"].status == "ok" and res["u3"].final_url == "u6"


def test_explicit_seed_without_edge_resolves_in_place(spark):
    edges = _edges(spark, [("a", "b")])
    seeds = spark.createDataFrame([("a",), ("z",)], "url string")
    res = {r.url: r for r in resolve_redirects(edges, seeds).collect()}
    assert (res["z"].final_url, res["z"].n_hops, res["z"].status) == ("z", 0, "ok")
    assert (res["a"].final_url, res["a"].n_hops, res["a"].status) == ("b", 1, "ok")


def test_partitioning_invariance(spark):
    docs = _docs(spark, 40)
    base = sorted(
        map(tuple, resolve_redirects(derive_redirects_from_documents(docs)).collect())
    )
    skewed = sorted(
        map(
            tuple,
            resolve_redirects(
                derive_redirects_from_documents(docs.repartition(17, "lang"))
            ).collect(),
        )
    )
    assert base == skewed


def test_audit_counts_every_chain(spark):
    docs = _docs(spark, 24)
    resolved = resolve_redirects(derive_redirects_from_documents(docs))
    audit = redirect_audit(resolved)
    assert audit.agg(F.sum("n_chains")).first()[0] == resolved.count()
    by_status = {
        (r.status, r.n_hops): r.n_chains for r in audit.collect()
    }
    # 24 docs: residues 1,2,3 -> 3 ok rows each hop count; 4 -> loop@1; 5,6 -> loop@2
    assert by_status[("loop", 1)] == 3
    assert by_status[("loop", 2)] == 6


def test_dedup_ledger_is_deterministic_and_single_location(spark):
    from cloud_ocr_summarizer_spark.operators.redirects import (
        dedup_ledger,
        redirect_ledger_audit,
    )

    edges = spark.createDataFrame(
        [("a", 302, "b"), ("a", 301, "b"), ("a", 301, "a2"), ("c", 307, "d")],
        "src_url string, http_status int, dst_url string",
    )
    audit = redirect_ledger_audit(edges).first()
    assert (audit.n_edges, audit.n_src_urls, audit.n_multi_src) == (4, 2, 1)
    for n_parts in (1, 7):
        rows = sorted(
            map(tuple, dedup_ledger(edges.repartition(n_parts)).collect())
        )
        # lexicographically-least (dst_url, http_status): ('a2', 301)
        assert rows == [("a", 301, "a2"), ("c", 307, "d")]
    resolved = {
        r.url: r for r in resolve_redirects(dedup_ledger(edges)).collect()
    }
    assert resolved["a"].final_url == "a2" and resolved["a"].n_hops == 1


def test_frontier_rollup_counts_balance(spark):
    from cloud_ocr_summarizer_spark.operators.redirects import (
        derive_redirects_from_parsed_urls,
        frontier_redirect_rollup,
        resolve_redirects,
    )
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
        parse_urls,
    )

    docs = _docs(spark, 40)
    parsed = parse_urls(derive_urls_from_documents(docs))
    resolved = resolve_redirects(derive_redirects_from_parsed_urls(parsed))
    # frontier-space semantics: chains resolve ok, self-loop + 2-cycle drop
    by_status = {
        s: n for s, n in resolved.groupBy("status").count().collect()
    }
    assert by_status["ok"] == 15  # residues 1,2,3 over 40 docs
    assert by_status["loop"] == 15  # residues 4,5,6 (corpus max is r=7)
    roll = frontier_redirect_rollup(parsed, resolved)
    tot = roll.agg(
        F.sum("n_urls"), F.sum("n_rewritten"), F.sum("n_dropped_chains")
    ).first()
    assert (tot[0], tot[1], tot[2]) == (40, 15, 15)


def test_frontier_ledger_skips_unrecorded_neighbor(spark):
    from cloud_ocr_summarizer_spark.operators.redirects import (
        derive_redirects_from_parsed_urls,
    )
    from cloud_ocr_summarizer_spark.operators.urls import (
        derive_urls_from_documents,
        parse_urls,
    )

    # n=22 -> max doc_id 21 has r=5; its +1 neighbor is not in the
    # corpus, so no Location was recorded: not an edge, not a seed
    parsed = parse_urls(derive_urls_from_documents(_docs(spark, 22)))
    edges = derive_redirects_from_parsed_urls(parsed)
    u21 = parsed.where(F.col("doc_id") == 21).first().url
    assert edges.where(F.col("src_url") == u21).count() == 0
