"""Unit tests for operators/graph.py — pins the review-driven guards:
edge endpoints missing from the nodes frame must still resolve to the
true component minimum, and hitting max_iter must raise rather than
return silently-unconverged labels."""

import pytest

pytestmark = pytest.mark.spark


def _cc(spark, nodes, edges, **kw):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        connected_components,
    )

    n = spark.createDataFrame([(x,) for x in nodes], "iri string")
    e = spark.createDataFrame(edges, "subj string, obj string")
    return {
        r["iri"]: r["comp"]
        for r in connected_components(n, e, **kw).collect()
    }


def test_components_basic(spark):
    out = _cc(
        spark,
        ["a", "b", "c", "x", "y", "lone"],
        [("a", "b"), ("b", "c"), ("x", "y")],
    )
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "lone": "lone"}


def test_components_seed_missing_endpoints(spark):
    # 'a' appears only as an edge endpoint, not in nodes — it must
    # still self-seed so the component minimum is 'a', and it must
    # appear in the output
    out = _cc(spark, ["b"], [("a", "b")])
    assert out == {"a": "a", "b": "a"}


def test_components_nonconvergence_raises(spark):
    # a 64-node chain cannot reach per-component stars in 2
    # large-star/small-star rounds; max_iter=2 must raise instead of
    # returning split components
    chain = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(64)]
    nodes = [f"n{i:03d}" for i in range(65)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, nodes, chain, max_iter=2)


def test_components_long_path(spark):
    # diameter-299 path — plain min-label propagation needs 299 rounds
    # (the old default max_iter=50 RuntimeErrored); large-star/small-
    # star converges in O(log n) rounds well inside the default budget
    chain = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(299)]
    nodes = [f"n{i:03d}" for i in range(300)]
    out = _cc(spark, nodes, chain)
    assert len(out) == 300
    assert set(out.values()) == {"n000"}


def test_components_two_long_paths_reversed_edges(spark):
    # two disjoint 60-node paths, edge direction alternating — the
    # orientation step must not care about src/dst order
    edges = []
    for base in ("a", "b"):
        for i in range(59):
            u, v = f"{base}{i:02d}", f"{base}{i+1:02d}"
            edges.append((u, v) if i % 2 else (v, u))
    nodes = [f"{b}{i:02d}" for b in ("a", "b") for i in range(60)]
    out = _cc(spark, nodes, edges)
    assert set(out.values()) == {"a00", "b00"}
    assert all(v == ("a00" if k[0] == "a" else "b00") for k, v in out.items())


def _pr(spark, nodes, edges, **kw):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import pagerank

    n = spark.createDataFrame([(x,) for x in nodes], "id string")
    e = spark.createDataFrame(edges, "subj string, obj string")
    return {
        r["id"]: r["rank_u"]
        for r in pagerank(n, e, id_col="id", **kw).collect()
    }


def test_pagerank_symmetric_cycle_is_fixpoint(spark):
    # a<->b: each node keeps exactly scale div 2 = 500000 micro-rank
    # every round (teleport 75000 + contribution 425000)
    out = _pr(spark, ["a", "b"], [("a", "b"), ("b", "a")], iterations=4)
    assert out == {"a": 500_000, "b": 500_000}


def test_pagerank_dangling_and_outdeg_split(spark):
    # a->b only: a's rank decays to the teleport floor 75000; b gets
    # teleport + floor(75000*850000/1e6) = 138750 once a stabilizes.
    # Dangling mass (b has no out-edges) is dropped by contract.
    out = _pr(spark, ["a", "b"], [("a", "b")], iterations=3)
    assert out == {"a": 75_000, "b": 138_750}
    # outdeg 2 splits the first-round contribution exactly in half
    out2 = _pr(spark, ["a", "b", "c"], [("a", "b"), ("a", "c")], iterations=1)
    assert out2["b"] == out2["c"] == 50_000 + (333_333 * 850_000) // (2 * 10**6)


def test_degree_stats(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import degree_stats

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "subj string, obj string"
    )
    out = {r["iri"]: (r["out_deg"], r["in_deg"], r["total_deg"])
           for r in degree_stats(e).collect()}
    assert out == {"a": (2, 0, 2), "b": (1, 1, 2), "c": (0, 2, 2)}


def test_extract_links_and_host_edges(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.links import (
        extract_links,
        host_edges,
    )

    pages = spark.createDataFrame(
        [
            ("http://a.com/p", '<a href="http://b.com/x">1</a>'
                               '<a href="http://b.com/y">2</a>'
                               '<a href="/relative">3</a>'),
            ("http://c.com/q", "<p>no links</p>"),
        ],
        "url string, html string",
    )
    links = sorted(
        (r["src_url"], r["dst_url"]) for r in extract_links(pages).collect()
    )
    assert links == [
        ("http://a.com/p", "/relative"),
        ("http://a.com/p", "http://b.com/x"),
        ("http://a.com/p", "http://b.com/y"),
    ]
    # an UNRESOLVED relative target has no parseable host and is
    # dropped; the two absolute links yield a PARALLEL a.com->b.com
    # edge pair
    edges = sorted(
        (r["subj"], r["obj"]) for r in host_edges(extract_links(pages)).collect()
    )
    assert edges == [("a.com", "b.com"), ("a.com", "b.com")]


def test_extract_links_all_quoting_styles(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.links import (
        extract_links,
    )

    pages = spark.createDataFrame(
        [
            (
                "http://a.com/p",
                '<a href="http://dq.com/x">1</a>'
                "<a href='http://sq.com/y'>2</a>"
                "<a href=http://uq.com/z>3</a>"
                "<a HREF = '/mixed'>4</a>"
                "<a href=#frag>5</a>",
            ),
        ],
        "url string, html string",
    )
    got = sorted(r["dst_url"] for r in extract_links(pages).collect())
    assert got == [
        "#frag", "/mixed", "http://dq.com/x", "http://sq.com/y",
        "http://uq.com/z",
    ]


def test_resolve_links_rfc3986(spark):
    from pyspark.sql import functions as F

    from microdata_rdf_streaming_parser_js_spark.operators.links import (
        extract_links,
        host_edges,
        resolve_links,
    )

    pages = spark.createDataFrame(
        [
            (
                "http://a.com/dir/p.html?v=1",
                "<a href='sub/x'>1</a>"
                "<a href=/rooted>2</a>"
                "<a href=../up>3</a>"
                '<a href="//b.com/pp">4</a>'
                "<a href=#sec>5</a>"
                "<a href='?q=2'>6</a>"
                '<a href="">7</a>'
                '<a href="javascript:void(0)">8</a>',
            ),
        ],
        "url string, html string",
    )
    got = sorted(
        r["dst_url"] for r in resolve_links(extract_links(pages)).collect()
    )
    assert got == sorted(
        [
            "http://a.com/dir/sub/x",
            "http://a.com/rooted",
            "http://a.com/up",
            "http://b.com/pp",
            "http://a.com/dir/p.html?v=1#sec",
            "http://a.com/dir/p.html?q=2",
            "http://a.com/dir/p.html?v=1",  # empty href: the page itself
            "javascript:void(0)",
        ]
    )
    # after resolution, relative links DO produce host edges (including
    # the same-host self edges); the javascript: href drops
    edges = sorted(
        (r["subj"], r["obj"])
        for r in host_edges(resolve_links(extract_links(pages))).collect()
    )
    assert edges == [("a.com", "a.com")] * 6 + [("a.com", "b.com")]


def test_normalize_url_rules(spark):
    from pyspark.sql import functions as F

    from microdata_rdf_streaming_parser_js_spark.operators.links import (
        normalize_url,
    )

    cases = {
        "HTTP://WWW.Example.ORG:80/A/b?utm_source=x&b=2&a=1#frag":
            "http://www.example.org/A/b?a=1&b=2",
        "https://h.com:443": "https://h.com/",
        "https://h.com:8080/x": "https://h.com:8080/x",
        "http://h.com/p?utm_campaign=only": "http://h.com/p",
        "/relative?b=1": "/relative?b=1",
        "  http://pad.com/x  ": "http://pad.com/x",
        # '?' only inside the fragment must not resurrect as a query
        "http://h.com/p#sec?a=b": "http://h.com/p",
        # bare valueless tracking params strip like their '=' forms
        "http://h.com/p?fbclid&a=1": "http://h.com/p?a=1",
        "http://h.com/p?utm_source": "http://h.com/p",
    }
    sdf = spark.createDataFrame([(u,) for u in cases], "url string")
    out = {
        r["url"]: r["n"]
        for r in sdf.select("url", normalize_url(F.col("url")).alias("n")).collect()
    }
    for raw, want in cases.items():
        assert out[raw] == want, (raw, out[raw], want)


def test_extract_sitemap_urls(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.links import (
        extract_sitemap_urls,
    )

    sm = spark.createDataFrame(
        [
            ("http://h/s.xml",
             "<urlset><url><loc>  http://h/a </loc></url>"
             "<url><loc>http://h/b</loc></url></urlset>"),
            ("http://h/i.xml",
             "<sitemapindex><sitemap><loc>http://h/s2.xml</loc>"
             "</sitemap></sitemapindex>"),
            ("http://h/empty.xml", "<urlset></urlset>"),
        ],
        "sitemap_url string, xml string",
    )
    out = sorted(
        (r["sitemap_url"], r["url"]) for r in extract_sitemap_urls(sm).collect()
    )
    assert out == [
        ("http://h/i.xml", "http://h/s2.xml"),
        ("http://h/s.xml", "http://h/a"),
        ("http://h/s.xml", "http://h/b"),
    ]


def _tri(spark, nodes, edges):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        triangle_counts,
    )

    n = spark.createDataFrame([(x,) for x in nodes], "iri string")
    e = spark.createDataFrame(edges, "subj string, obj string")
    return {
        r["iri"]: r["n_triangles"]
        for r in triangle_counts(n, e).collect()
    }


def test_triangles_k4(spark):
    # K4: every vertex is in C(3,2) = 3 triangles
    verts = ["a", "b", "c", "d"]
    edges = [(u, v) for i, u in enumerate(verts) for v in verts[i + 1:]]
    out = _tri(spark, verts, edges)
    assert out == {v: 3 for v in verts}


def test_triangles_collapses_direction_multiplicity_loops(spark):
    # duplicate edges, both directions, and a self-loop must not
    # manufacture extra triangles; 'lone' has none
    edges = [
        ("a", "b"), ("b", "a"), ("a", "b"),
        ("b", "c"), ("a", "c"), ("c", "c"),
    ]
    out = _tri(spark, ["a", "b", "c", "lone"], edges)
    assert out == {"a": 1, "b": 1, "c": 1, "lone": 0}


def test_triangles_wedge_is_not_triangle(spark):
    out = _tri(spark, ["a", "b", "c"], [("a", "b"), ("b", "c")])
    assert out == {"a": 0, "b": 0, "c": 0}


def _kcore(spark, nodes, edges, k, **kw):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import kcore

    n = spark.createDataFrame([(x,) for x in nodes], "iri string")
    e = spark.createDataFrame(edges, "subj string, obj string")
    return {
        r["iri"]: r["in_kcore"] for r in kcore(n, e, k, **kw).collect()
    }


def test_kcore_triangle_with_pendant_chain(spark):
    # triangle is the 2-core; the chain c1-c2-c3 peels off tail-first
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("a", "c1"), ("c1", "c2"), ("c2", "c3"),
    ]
    out = _kcore(spark, ["a", "b", "c", "c1", "c2", "c3", "lone"], edges, 2)
    assert out == {
        "a": True, "b": True, "c": True,
        "c1": False, "c2": False, "c3": False, "lone": False,
    }


def test_kcore_3core_empty_for_triangle(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    out = _kcore(spark, ["a", "b", "c"], edges, 3)
    assert out == {"a": False, "b": False, "c": False}


def test_kcore_guards(spark):
    import pytest as _pytest

    from microdata_rdf_streaming_parser_js_spark.operators.graph import kcore

    n = spark.createDataFrame([("a",)], "iri string")
    e = spark.createDataFrame([("a", "b")], "subj string, obj string")
    with _pytest.raises(ValueError, match="k must be"):
        kcore(n, e, 0)


# --- transitive_closure_fixpoint (no depth guess) ---------------------------

def _chain_edges(spark, n):
    return spark.createDataFrame(
        [(i, i - 1) for i in range(1, n)], "subj bigint, obj bigint"
    )


def test_closure_fixpoint_matches_bounded_on_deep_chain(spark):
    """A depth-20 chain: the fixpoint variant must equal the bounded
    variant given a CORRECT depth, with no depth supplied."""
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        transitive_closure,
        transitive_closure_fixpoint,
    )

    e = _chain_edges(spark, 21)  # nodes 0..20, longest path 20
    fx = sorted(map(tuple, transitive_closure_fixpoint(e).collect()))
    bd = sorted(map(tuple, transitive_closure(e, max_depth=20).collect()))
    assert fx == bd
    assert len(fx) == 21 * 22 // 2  # reflexive chain closure
    # and the bounded DEFAULT (max_depth=16) would have truncated:
    short = transitive_closure(e, max_depth=16).count()
    assert short < len(fx)


def test_closure_fixpoint_cycle_and_pplus(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        transitive_closure_fixpoint,
    )

    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "subj bigint, obj bigint"
    )
    full = sorted(
        map(tuple, transitive_closure_fixpoint(cyc).collect())
    )
    assert full == sorted((a, b) for a in range(3) for b in range(3))
    # p+ on a DAG drops exactly the identity rows
    dag = _chain_edges(spark, 4)
    pp = transitive_closure_fixpoint(dag, reflexive=False)
    assert pp.where("subj = obj").count() == 0
    assert pp.count() == 4 * 5 // 2 - 4


def test_closure_fixpoint_guards(spark):
    import pytest as _pytest

    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        transitive_closure_fixpoint,
    )

    e = _chain_edges(spark, 3)
    with _pytest.raises(ValueError, match="max_rounds"):
        transitive_closure_fixpoint(e, max_rounds=0)
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        # a depth-4 chain cannot converge within ONE doubling round
        transitive_closure_fixpoint(_chain_edges(spark, 5), max_rounds=1)
