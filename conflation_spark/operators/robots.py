"""robots.txt parsing + URL permission filtering — the crawl-politeness
stage of a web-curation pipeline (the reference fetches from a single
authenticated API and has no analog; a Common-Crawl-style corpus build
must honor per-host rules before fetching/keeping URLs).

Semantics implemented (the original REP with Google's grouping
clarifications; PREFIX rules only — `*`/`$` wildcards are a documented
non-goal, matching the fixture contract):

- a GROUP is one or more consecutive ``User-agent`` lines followed by
  rules; a ``User-agent`` line after any non-UA directive starts a new
  group; blank lines and comments (``#`` to end of line) never
  terminate a group;
- field names are case-insensitive, agent names compare lowercased;
- ``Allow``/``Disallow`` with an empty value is a no-op (dropped);
- ``Crawl-delay``/``Sitemap``/unknown fields are skipped (but still end
  an agent run);
- decision for (agent, path): use the host's rules for the EXACT agent
  if any exist, else the ``*`` rules; among rules whose path is a
  prefix of the URL path the LONGEST wins, ties go to ``allow``; no
  matching rule means allowed.

Scale design: parsing is a stateless per-row mapInPandas kernel (one
robots.txt per host — no shuffle). The decision join broadcasts the
rules (per-host rule sets are small by nature), hash-joins on host
with the prefix test as a residual condition, and reduces per URL with
a single integer MAX — the score ``2*len(prefix) + is_allow`` encodes
the longest-wins / allow-breaks-ties order, so the whole decision is
one broadcast join + one aggregation, exactly reproducible in SQL
(`robots_allowed` oracle row).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULES_SCHEMA = (
    "host string, agent string, rule_type string, path string, rule_order int"
)


def parse_robots_text(host: str, text: str) -> list[tuple[str, str, str, str, int]]:
    """One robots.txt -> rule rows (host, agent, type, path, order).
    ``order`` counts rule LINES in file order (shared by the row per
    agent a multi-agent group emits)."""
    rules: list[tuple[str, str, str, str, int]] = []
    agents: list[str] = []
    in_agent_run = False
    order = 0
    for raw in (text or "").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, val = line.partition(":")
        field = field.strip().lower()
        val = val.strip()
        if field == "user-agent":
            if not in_agent_run:
                agents = []
            if val:
                agents.append(val.lower())
            in_agent_run = True
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if agents and val:
                for a in agents:
                    rules.append((host, a, field, val, order))
                order += 1
        else:
            in_agent_run = False
    return rules


def parse_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) rows -> exploded rule rows. Stateless kernel,
    zero shuffle; also runs unchanged on a streaming DataFrame."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, str, str, int]] = []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                rows.extend(parse_robots_text(host, text))
            yield pd.DataFrame(
                rows, columns=["host", "agent", "rule_type", "path", "rule_order"]
            )

    return df.select(
        F.col(host_col).cast("string").alias(host_col), F.col(text_col)
    ).mapInPandas(kernel, schema=ROBOTS_RULES_SCHEMA)


def url_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """(url, allowed 0/1) for ``agent`` under the REP decision rules.
    One broadcast hash-join on host (prefix test as the residual
    condition) + one integer-MAX aggregation per (url, host) — no
    window, no per-row Python. Grouping includes the host so a url
    string that (pathologically) appears under two hosts gets one
    decision PER host instead of a cross-host score merge."""
    a = agent.lower()
    has_spec = rules.groupBy("host").agg(
        F.max((F.col("agent") == a).cast("int")).alias("has_s")
    )
    eff = (
        rules.join(has_spec, "host")
        .where(
            ((F.col("has_s") == 1) & (F.col("agent") == a))
            | ((F.col("has_s") == 0) & (F.col("agent") == "*"))
        )
        .select(
            F.col("host").alias("_rhost"),
            F.col("path").alias("_rpath"),
            F.col("rule_type").alias("_rtype"),
        )
    )
    joined = urls.select(url_col, host_col, path_col).join(
        F.broadcast(eff),
        (F.col(host_col) == F.col("_rhost"))
        & F.col(path_col).startswith(F.col("_rpath")),
        "left",
    )
    score = (
        F.length("_rpath") * 2 + (F.col("_rtype") == "allow").cast("int")
    ).cast("long")
    return (
        joined.groupBy(url_col, host_col)
        .agg(F.max(score).alias("_best"))
        .select(
            url_col,
            (F.col("_best").isNull() | (F.pmod("_best", 2) == 1))
            .cast("int")
            .alias("allowed"),
        )
    )
