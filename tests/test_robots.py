"""robots.txt / RFC 9309 (functions/robots.py).

Driver-side semantics (group selection, longest match, wildcards,
ties, empty Disallow) pinned with RFC-shaped examples; the
distributed match_allowed flow tested end-to-end over a multi-host
frontier against the same verdicts.
"""

import pytest

from k2_18_spark.functions.robots import (
    _select_group,
    match_allowed,
    match_path,
    parse_robots,
    sitemaps,
)

BASIC = """
# politeness file
User-agent: *
Disallow: /private/
Allow: /private/public.html
Disallow: /*.gif$
Crawl-delay: 2.5
Sitemap: https://h.example/sitemap.xml
"""


@pytest.mark.parametrize(
    "path,want",
    [
        ("/", True),
        ("/private/", False),
        ("/private/x.html", False),
        ("/private/public.html", True),   # longer allow wins
        ("/img/a.gif", False),            # *.gif$ anchored
        ("/img/a.gif?x=1", True),         # $ means end-of-path
        ("/gifts", True),
    ],
)
def test_basic_verdicts(path, want):
    rules, delay = _select_group(BASIC, "FooBot")
    assert delay == 2.5
    assert match_path(rules, path) is want


def test_tie_allow_wins():
    rules = [("allow", "/page"), ("disallow", "/page")]
    assert match_path(rules, "/page/x") is True


def test_longest_pattern_wins():
    rules = [("allow", "/p"), ("disallow", "/page")]
    assert match_path(rules, "/page/x") is False
    assert match_path(rules, "/pquick") is True


def test_no_rules_default_allow():
    assert match_path([], "/anything") is True
    rules, _ = _select_group("", "FooBot")
    assert rules == []


GROUPED = """
User-agent: googlebot
Disallow: /g/

User-agent: googlebot-news
Disallow: /gn/

User-agent: *
Disallow: /all/

User-agent: googlebot
Disallow: /g2/
"""


def test_group_selection_longest_token_and_merge():
    # longest matching token wins
    rules, _ = _select_group(GROUPED, "Googlebot-News")
    assert rules == [("disallow", "/gn/")]
    # same-token groups merge
    rules, _ = _select_group(GROUPED, "googlebot")
    assert sorted(rules) == [("disallow", "/g/"), ("disallow", "/g2/")]
    # unknown agent falls back to *
    rules, _ = _select_group(GROUPED, "FooBot")
    assert rules == [("disallow", "/all/")]


def test_empty_disallow_is_allow_all():
    txt = "User-agent: *\nDisallow:\n"
    rules, _ = _select_group(txt, "FooBot")
    assert rules == []


def test_multi_ua_lines_share_rules():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    assert _select_group(txt, "a")[0] == [("disallow", "/x/")]
    assert _select_group(txt, "b")[0] == [("disallow", "/x/")]


def test_parse_and_match_distributed(spark):
    robots = spark.createDataFrame(
        [
            ("h0.example", BASIC),
            ("h1.example", "User-agent: *\nDisallow: /\nAllow: /open/\n"),
            # h2 has no robots row at all
        ],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots, user_agent="FooBot")
    got_rules = {
        (r["host"], r["rule_type"], r["pattern"]) for r in rules.collect()
    }
    assert ("h0.example", "disallow", "/private/") in got_rules
    assert ("h1.example", "allow", "/open/") in got_rules

    urls = spark.createDataFrame(
        [
            ("https://h0.example/private/x",),
            ("https://h0.example/private/public.html",),
            ("https://h1.example/anything",),
            ("https://h1.example/open/doc",),
            ("https://h2.example/no/robots",),
            ("https://h0.example",),  # empty path -> "/"
            ("https://h0.example/img/x.gif",),      # *.gif$ blocks
            ("https://h0.example/img/x.gif?v=2",),  # query defeats $
        ],
        "url string",
    )
    got = {r["url"]: r["allowed"] for r in match_allowed(urls, rules).collect()}
    assert got == {
        "https://h0.example/private/x": False,
        "https://h0.example/private/public.html": True,
        "https://h1.example/anything": False,
        "https://h1.example/open/doc": True,
        "https://h2.example/no/robots": True,
        "https://h0.example": True,
        "https://h0.example/img/x.gif": False,
        "https://h0.example/img/x.gif?v=2": True,
    }


def test_sitemaps_extraction(spark):
    robots = spark.createDataFrame(
        [("h0.example", BASIC), ("h1.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    got = {(r["host"], r["sitemap"]) for r in sitemaps(robots).collect()}
    assert got == {("h0.example", "https://h.example/sitemap.xml")}
