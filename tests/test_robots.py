"""robots.txt parsing + evaluation (functions/robots.py)."""

import pyspark.sql.functions as F
import pytest

from gonova_document_parser_spark.functions.robots import (
    parse_robots_txt,
    robots_rules,
    robots_verdict,
    select_agent_group,
    url_host_expr,
    url_path_expr,
)

FIXTURE = """\
# global group
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Disallow: /fish*.html
Disallow: /exact$

Sitemap: https://example.org/sitemap.xml

# stacked agents share one group
User-Agent: gonovabot
user-agent: otherbot
Crawl-delay: 2
Disallow: /bot-only/
Allow:

User-agent: emptybot
Disallow:
"""


def test_parse_groups_stacking_and_case():
    rules = parse_robots_txt(FIXTURE, "Example.ORG")
    assert all(r["host"] == "example.org" for r in rules)
    star = [(r["allow"], r["pattern"]) for r in rules if r["agent"] == "*"]
    assert star == [
        (False, "/private/"),
        (True, "/private/ok.html"),
        (False, "/fish*.html"),
        (False, "/exact$"),
    ]
    # stacked UA lines: both agents get the group's rules; an
    # empty-pattern directive emits the group-presence SENTINEL
    # (allow=True, pattern='') so §2.2.1 shadowing survives (ADVICE r5);
    # Crawl-delay does not break the group
    for agent in ("gonovabot", "otherbot"):
        assert [(r["allow"], r["pattern"]) for r in rules if r["agent"] == agent] == [
            (False, "/bot-only/"),
            (True, ""),
        ]
    # empty-pattern Disallow = allow all = sentinel row only
    assert [(r["allow"], r["pattern"]) for r in rules if r["agent"] == "emptybot"] == [
        (True, "")
    ]


def test_whitelisted_bot_group_shadows_star(spark):
    """ADVICE r5 (medium): 'User-agent: gonovabot / Disallow:' followed by
    'User-agent: * / Disallow: /' must yield allowed=True for gonovabot —
    the empty-pattern group exists and shadows the * group entirely."""
    body = "User-agent: gonovabot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    rules = spark.createDataFrame(
        [
            (r["host"], r["agent"], r["allow"], r["pattern"])
            for r in parse_robots_txt(body, "w.example.org")
        ],
        "host string, agent string, allow boolean, pattern string",
    )
    pages = spark.createDataFrame(
        [("https://w.example.org/anything",)], "url string"
    )
    out = robots_verdict(pages, rules, crawler="gonovabot").collect()
    assert out[0]["allowed"] is True
    assert out[0]["matched_pattern"] is None  # sentinel never matches
    # and the * group still blocks everyone else
    other = robots_verdict(pages, rules, crawler="somebot").collect()
    assert other[0]["allowed"] is False


def test_parse_rules_before_any_agent_are_dropped():
    assert parse_robots_txt("Disallow: /x\nUser-agent: *\nDisallow: /y\n", "h") == [
        {"host": "h", "agent": "*", "allow": False, "pattern": "/y"}
    ]


def test_url_host_and_path_exprs(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.Example.org/A/b?q=1#frag",),
            ("http://h.example:8080/x",),
            ("https://bare.example",),
        ],
        "url string",
    )
    rows = df.select(
        url_host_expr("url").alias("h"), url_path_expr("url").alias("p")
    ).collect()
    assert (rows[0]["h"], rows[0]["p"]) == (
        "www.example.org",
        "/A/b?q=1#frag",
    )
    assert (rows[1]["h"], rows[1]["p"]) == ("h.example", "/x")
    assert (rows[2]["h"], rows[2]["p"]) == ("bare.example", "/")


@pytest.fixture()
def rules_df(spark):
    robots = spark.createDataFrame(
        [("example.org", FIXTURE), ("open.example", "User-agent: *\nAllow: /\n")],
        "host string, body string",
    )
    return robots_rules(robots)


def test_agent_group_shadowing(spark, rules_df):
    # gonovabot has its own group on example.org -> '*' rules are invisible
    grp = select_agent_group(rules_df, "GonovaBot")
    ex = [(r["allow"], r["pattern"]) for r in grp.where(F.col("host") == "example.org").collect()]
    # the empty-pattern Allow in the group now yields the presence
    # sentinel (True, '') alongside the real rule (ADVICE r5 fix)
    assert ex == [(False, "/bot-only/"), (True, "")]
    # open.example has no gonovabot group -> falls back to '*'
    assert [
        (r["allow"], r["pattern"])
        for r in grp.where(F.col("host") == "open.example").collect()
    ] == [(True, "/")]


def test_verdict_longest_match_allow_wins_and_extensions(spark, rules_df):
    pages = spark.createDataFrame(
        [
            ("https://example.org/private/secret.html",),  # disallow /private/
            ("https://example.org/private/ok.html",),  # longer allow wins
            ("https://example.org/fish/salmon.html",),  # wildcard disallow
            ("https://example.org/fishy",),  # pattern needs .html
            ("https://example.org/exact",),  # $-anchored disallow
            ("https://example.org/exactly",),  # $ anchor fails -> allowed
            ("https://example.org/other",),  # no rule matches
            ("https://norobots.example/x",),  # host without robots
        ],
        "url string",
    )
    got = {
        r["url"]: (r["allowed"], r["matched_pattern"])
        for r in robots_verdict(pages, rules_df, crawler="unrelatedbot").collect()
    }
    assert got["https://example.org/private/secret.html"] == (False, "/private/")
    assert got["https://example.org/private/ok.html"] == (True, "/private/ok.html")
    assert got["https://example.org/fish/salmon.html"] == (False, "/fish*.html")
    assert got["https://example.org/fishy"] == (True, None)
    assert got["https://example.org/exact"] == (False, "/exact$")
    assert got["https://example.org/exactly"] == (True, None)
    assert got["https://example.org/other"] == (True, None)
    assert got["https://norobots.example/x"] == (True, None)


def test_verdict_specific_agent_ignores_star_entirely(spark, rules_df):
    # /private/ is disallowed for '*' but gonovabot's own group has no
    # /private/ rule -> allowed for gonovabot (RFC 9309 group shadowing)
    pages = spark.createDataFrame(
        [
            ("https://example.org/private/secret.html",),
            ("https://example.org/bot-only/page",),
        ],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in robots_verdict(pages, rules_df, crawler="gonovabot").collect()
    }
    assert got["https://example.org/private/secret.html"] is True
    assert got["https://example.org/bot-only/page"] is False


def test_verdict_plan_is_broadcast_no_corpus_shuffle(spark, rules_df):
    pages = spark.createDataFrame(
        [("https://example.org/a%d" % i,) for i in range(100)], "url string"
    )
    out = robots_verdict(pages, rules_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Window" not in plan
