"""Unit tests for functions/robots.py (RFC 9309 semantics) and the
operators/crawl.robots_filter Spark stage."""

import pytest

from microdata_rdf_streaming_parser_js_spark.functions.robots import (
    parse_robots,
    url_allowed,
)

_TXT = (
    "# policy\n"
    "User-agent: sparkbot\n"
    "Disallow: /private\n"
    "Allow: /private/ok$\n"
    "Disallow: /*.zip$\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /\n"
)


@pytest.mark.parametrize(
    "path,want",
    [
        ("/", True),
        ("/page/1", True),
        ("/private/x", False),
        ("/private/ok", True),     # longer Allow with $ wins
        ("/private/okx", False),   # $ anchor must not match a prefix
        ("/a/b/c.zip", False),     # * wildcard spans directories
        ("/a/b/c.zipx", True),
    ],
)
def test_specific_group_longest_match(path, want):
    assert url_allowed(parse_robots(_TXT, "sparkbot"), path) is want


def test_star_group_only_when_no_specific_match():
    rules = parse_robots(_TXT, "otherbot")
    assert url_allowed(rules, "/anything") is False  # * group: Disallow /


def test_group_selection_prefers_longest_agent_token():
    txt = (
        "User-agent: spark\nDisallow: /a\n\n"
        "User-agent: sparkbot\nDisallow: /b\n"
    )
    rules = parse_robots(txt, "sparkbot")
    assert url_allowed(rules, "/a/x") is True   # the short group lost
    assert url_allowed(rules, "/b/x") is False


def test_repeated_specific_groups_merge():
    # RFC 9309: every group naming the winning token contributes rules
    # — a second 'User-agent: sparkbot' group is NOT silently ignored.
    txt = (
        "User-agent: sparkbot\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: sparkbot\nDisallow: /b\n"
    )
    rules = parse_robots(txt, "sparkbot")
    assert url_allowed(rules, "/a/x") is False
    assert url_allowed(rules, "/b/x") is False  # second group merged in
    assert url_allowed(rules, "/c/x") is True   # '*' group still ignored


def test_equal_length_specific_tokens_merge():
    txt = (
        "User-agent: sparkbot\nDisallow: /a\n\n"
        "User-agent: SPARKBOT\nDisallow: /b\n"
    )
    rules = parse_robots(txt, "sparkbot-news")
    assert url_allowed(rules, "/a/x") is False
    assert url_allowed(rules, "/b/x") is False


def test_duplicate_token_in_one_group_counts_once():
    txt = "User-agent: sparkbot\nUser-agent: sparkbot\nDisallow: /a\n"
    rules = parse_robots(txt, "sparkbot")
    assert [(allow, pat) for allow, pat, _ in rules] == [(False, "/a")]


def test_empty_disallow_and_garbage_lines():
    txt = "User-agent: *\nDisallow:\nnot a directive\nFoo: bar\n"
    rules = parse_robots(txt, "sparkbot")
    assert url_allowed(rules, "/anything") is True


def test_allow_wins_equal_length():
    txt = "User-agent: *\nDisallow: /abc\nAllow: /abc\n"
    assert url_allowed(parse_robots(txt, "x"), "/abcdef") is True


@pytest.mark.spark
def test_robots_filter_spark_stage(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.crawl import (
        robots_filter,
    )

    pages = spark.createDataFrame(
        [
            ("http://a.com/private/x",),
            ("http://a.com/page",),
            ("http://norobots.com/anything",),
        ],
        "url string",
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private\n")],
        "host string, robots_txt string",
    )
    out = {r["url"]: r["allowed"] for r in robots_filter(pages, robots).collect()}
    assert out == {
        "http://a.com/private/x": False,
        "http://a.com/page": True,
        "http://norobots.com/anything": True,  # missing robots row
    }


@pytest.mark.spark
def test_robots_sitemap_directive_feeds_frontier(spark):
    """Full crawl-frontier loop: Sitemap: directives out of robots.txt
    join the fetched sitemap corpus and <loc> extraction walks on."""
    from microdata_rdf_streaming_parser_js_spark.operators.links import (
        extract_sitemap_urls,
        robots_sitemap_urls,
    )

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /x\n"
                      "Sitemap: http://a.com/sm.xml\n"
                      "  SITEMAP:\thttp://a.com/sm2.xml\r\n"),
            ("b.com", "User-agent: *\nDisallow: /\n"),  # no directive
        ],
        "host string, robots_txt string",
    )
    seeds = sorted(
        (r["host"], r["sitemap_url"])
        for r in robots_sitemap_urls(robots).collect()
    )
    assert seeds == [
        ("a.com", "http://a.com/sm.xml"),
        ("a.com", "http://a.com/sm2.xml"),
    ]
    fetched = spark.createDataFrame(
        [
            ("http://a.com/sm.xml",
             "<urlset><url><loc>http://a.com/p1</loc></url></urlset>"),
            ("http://unreferenced.com/sm.xml",
             "<urlset><url><loc>http://unreferenced.com/p9</loc></url></urlset>"),
        ],
        "sitemap_url string, xml string",
    )
    frontier = extract_sitemap_urls(
        fetched.join(robots_sitemap_urls(robots), "sitemap_url")
    )
    assert [(r["sitemap_url"], r["url"]) for r in frontier.collect()] == [
        ("http://a.com/sm.xml", "http://a.com/p1")
    ]


def test_politeness_schedule_waves(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.crawl import (
        politeness_schedule,
    )

    rows = [(f"http://h{i % 2}/p{i}", f"h{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, "url string, _host string")
    out = politeness_schedule(df, per_wave=2, delay_s=5).collect()
    assert len(out) == 10
    per_host_wave = {}
    for r in out:
        assert r["offset_s"] == r["wave"] * 5
        assert r["wave"] == (r["host_rank"] - 1) // 2
        per_host_wave.setdefault((r["host"], r["wave"]), 0)
        per_host_wave[(r["host"], r["wave"])] += 1
    assert max(per_host_wave.values()) <= 2
    # deterministic across repartition
    out2 = politeness_schedule(
        df.repartition(5), per_wave=2, delay_s=5
    ).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in out2}


def test_politeness_schedule_guards(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.crawl import (
        politeness_schedule,
    )

    df = spark.createDataFrame([("u", "h")], "url string, _host string")
    with pytest.raises(ValueError, match="per_wave"):
        politeness_schedule(df, per_wave=0)
    with pytest.raises(ValueError, match="delay_s"):
        politeness_schedule(df, delay_s=-1)


def test_crawl_delta_statuses(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.crawl import (
        crawl_delta,
    )

    old = spark.createDataFrame(
        [("a", "d1"), ("b", "d2"), ("c", "d3")], "url string, digest string"
    )
    new = spark.createDataFrame(
        [("a", "d1"), ("b", "dX"), ("d", "d4")], "url string, digest string"
    )
    out = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert out == {
        "a": "unchanged", "b": "changed", "c": "removed", "d": "added"
    }
