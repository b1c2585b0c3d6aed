"""robots.txt semantics: REP grouping/decision edge cases against
hand-written files, the Spark parse/decision operators against the
pure-Python reference, and the planted fixture gate."""

import numpy as np
from pyspark.sql import functions as F

from conflation_spark.operators.robots import (
    parse_robots,
    parse_robots_text,
    url_allowed,
)

TXT = """
# header comment
User-agent: GraftBot
User-Agent: OtherBot
Crawl-delay: 5
Disallow: /private
Allow: /private/pub  # exception

User-agent: *
Disallow: /api
Disallow:
Allow: /api/open

Disallow: /ignored-no-agent
"""


def test_parse_semantics():
    rules = parse_robots_text("h", TXT)
    # group 1: two agents x two rules; group 2: star x two (empty dropped)
    assert ("h", "graftbot", "disallow", "/private", 0) in rules
    assert ("h", "otherbot", "disallow", "/private", 0) in rules
    assert ("h", "graftbot", "allow", "/private/pub", 1) in rules
    assert ("h", "*", "disallow", "/api", 2) in rules
    assert ("h", "*", "allow", "/api/open", 3) in rules
    # empty Disallow dropped; orphan rule (no agent in scope... group 2
    # is still open, so it attaches to *)
    assert ("h", "*", "disallow", "/ignored-no-agent", 4) in rules
    assert len(rules) == 7


def test_parse_orphan_rules_before_any_agent_are_dropped():
    assert parse_robots_text("h", "Disallow: /x\nAllow: /y\n") == []


def test_parse_blank_lines_do_not_break_groups():
    rules = parse_robots_text("h", "User-agent: a\n\n\nDisallow: /x\n")
    assert rules == [("h", "a", "disallow", "/x", 0)]


def test_parse_new_group_resets_agents():
    rules = parse_robots_text(
        "h", "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    )
    assert ("h", "a", "disallow", "/x", 0) in rules
    assert ("h", "b", "disallow", "/y", 1) in rules
    assert ("h", "a", "disallow", "/y", 1) not in rules


def _decide(spark, rules_rows, urls_rows, agent):
    rules = spark.createDataFrame(
        rules_rows, "host string, agent string, rule_type string, path string, rule_order int"
    )
    urls = spark.createDataFrame(urls_rows, "url string, host string, path string")
    out = url_allowed(urls, rules, agent)
    return {r["url"]: r["allowed"] for r in out.collect()}


def test_decision_semantics(spark):
    rules = [
        ("h", "graftbot", "disallow", "/private", 0),
        ("h", "graftbot", "allow", "/private/pub", 1),
        ("h", "*", "disallow", "/", 2),  # star must be IGNORED for graftbot
        ("g", "*", "disallow", "/api", 0),
        ("g", "*", "allow", "/api", 1),  # tie -> allow wins
    ]
    urls = [
        ("u1", "h", "/private/secret"),
        ("u2", "h", "/private/pub/x"),
        ("u3", "h", "/open"),
        ("u4", "g", "/api/v1"),
        ("u5", "g", "/other"),
        ("u6", "nohost", "/anything"),
    ]
    got = _decide(spark, rules, urls, "GraftBot")
    assert got == {"u1": 0, "u2": 1, "u3": 1, "u4": 1, "u5": 1, "u6": 1}
    # for an agent with no specific rules, star applies
    got2 = _decide(spark, rules, urls, "randombot")
    assert got2["u3"] == 0  # star disallows everything on h
    assert got2["u4"] == 1  # tie -> allow


def test_spark_parse_and_decisions_match_reference(spark):
    """Fixture-wide: Spark parse == pure-Python parse, and decisions
    match a brute-force Python REP implementation."""
    from conflation_spark.datagen_warc import ensure_robots_fixture

    d = ensure_robots_fixture("sf0.001")
    txt = spark.read.parquet(f"{d}/robots_txt.parquet")
    parsed = parse_robots(txt)
    got_rules = sorted(map(tuple, parsed.collect()))
    want_rules = []
    for r in txt.collect():
        want_rules.extend(parse_robots_text(r["host"], r["robots_txt"]))
    assert got_rules == sorted(want_rules)

    urls = spark.read.parquet(f"{d}/robots_urls.parquet")
    got = {
        r["url"]: r["allowed"]
        for r in url_allowed(urls, parsed, "graftbot").collect()
    }
    by_host: dict[str, list] = {}
    for h, a, t, p, o in want_rules:
        by_host.setdefault(h, []).append((a, t, p))
    for r in urls.collect():
        rl = by_host.get(r["host"], [])
        eff = [x for x in rl if x[0] == "graftbot"] or [
            x for x in rl if x[0] == "*"
        ]
        matching = [(len(p), t == "allow") for (_a, t, p) in eff if r["path"].startswith(p)]
        want = 1 if (not matching or max(matching)[1]) else 0
        assert got[r["url"]] == want, r["url"]


def test_decision_partition_invariant(spark):
    rng = np.random.default_rng(3)
    rules = [
        ("h", "*", "disallow" if rng.random() < 0.5 else "allow", p, i)
        for i, p in enumerate(["/", "/a", "/a/b", "/c"])
    ]
    urls = [(f"u{i}", "h", p) for i, p in enumerate(["/a/b/c", "/c/d", "/x", "/a"])]
    r3 = spark.createDataFrame(rules, "host string, agent string, rule_type string, path string, rule_order int").repartition(3)
    u3 = spark.createDataFrame(urls, "url string, host string, path string").repartition(2)
    a = sorted(map(tuple, url_allowed(u3, r3, "bot").collect()))
    r1 = spark.createDataFrame(rules, "host string, agent string, rule_type string, path string, rule_order int").coalesce(1)
    u1 = spark.createDataFrame(urls, "url string, host string, path string").coalesce(1)
    b = sorted(map(tuple, url_allowed(u1, r1, "bot").collect()))
    assert a == b


def test_duplicate_url_across_hosts_gets_per_host_decisions(spark):
    """The same url string under two hosts must not merge scores
    cross-host: one decision row per (url, host)."""
    rules = [
        ("h1", "*", "disallow", "/x", 0),
        ("h2", "*", "allow", "/x", 0),
    ]
    urls = [("same", "h1", "/x/y"), ("same", "h2", "/x/y")]
    r = spark.createDataFrame(rules, "host string, agent string, rule_type string, path string, rule_order int")
    u = spark.createDataFrame(urls, "url string, host string, path string")
    rows = sorted(map(tuple, url_allowed(u, r, "bot").collect()))
    assert rows == [("same", 0), ("same", 1)]
