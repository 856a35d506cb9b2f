"""robots.txt compliance (RFC 9309) — the crawl-hygiene gate a
responsible 100 TB pipeline applies before (re)publishing or refetching
crawled URLs: parse each host's robots.txt once, then screen the URL
corpus with a distributed longest-match evaluation.

Spark-first shape: rules become a small ``(host, like_pattern,
pattern_len, allow)`` frame (hosts x a handful of rules — always
broadcastable next to a 100 TB URL table), and rule matching compiles
to SQL ``LIKE`` — robots ``*`` is exactly LIKE's ``%``, the ``$``
anchor is the absence of a trailing ``%`` — so the whole screen is a
broadcast join + one argmax, zero Python on the URL side, and the
semantics are ANSI-SQL-replicable (DuckDB-oracle-checkable).

RFC 9309 semantics implemented: group selection by longest matching
product token (falling back to ``*``), multiple user-agent lines per
group, longest-octet-match precedence with allow winning length ties,
unmatched URLs allowed, empty-pattern rules ignored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.functions.urls import url_host, url_path
from udacity_data_engineering_capstone_project_spark.operators.relational import maybe_broadcast


def parse_robots_txt(text: str, user_agent: str = "*") -> list[tuple[str, bool]]:
    """Parse one robots.txt into the rule list for ``user_agent``:
    ``[(path_pattern, allow), ...]``.

    Group selection per RFC 9309 §2.2.1: collect groups by their
    user-agent lines (case-insensitive product-token match); the group
    whose agent token is the LONGEST prefix-token of ``user_agent``
    wins, else the ``*`` group, else no rules (everything allowed).
    Comments (``#``), blank lines, unknown directives, and empty
    patterns are ignored.
    """
    ua = user_agent.lower()
    groups: dict[str, list[tuple[str, bool]]] = {}
    current_agents: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                current_agents = []
            current_agents.append(val.lower())
            groups.setdefault(val.lower(), [])
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            if not val:
                continue  # empty pattern = no-op per RFC
            for agent in current_agents:
                groups.setdefault(agent, []).append((val, key == "allow"))
        else:
            last_was_agent = False
    # longest agent token that is a prefix-token of ua wins
    best = None
    for agent in groups:
        if agent != "*" and (ua == agent or ua.startswith(agent)):
            if best is None or len(agent) > len(best):
                best = agent
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def robots_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    """Evaluate one path against parsed rules: longest-match wins,
    allow wins ties, no match = allowed. Pure-Python twin of the
    distributed LIKE evaluation (tests pin their equivalence)."""
    best: tuple[int, bool] | None = None
    for pattern, allow in rules:
        if _pattern_matches(path, pattern):
            key = (len(pattern), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def _pattern_matches(path: str, pattern: str) -> bool:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    pos = 0
    # first part must match at the start
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for part in parts[1:]:
        idx = path.find(part, pos)
        if idx < 0:
            return False
        pos = idx + len(part)
    if anchored:
        # last wildcard (if any) absorbs the tail; otherwise exact end
        return pos == len(path) if len(parts) == 1 else True if parts[-1] == "" else path.endswith(parts[-1])
    return True


def robots_like_pattern(pattern: str) -> str:
    """Translate a robots path pattern to a SQL LIKE pattern:
    ``*`` -> ``%``, trailing ``$`` -> no trailing ``%``, LIKE specials
    escaped with ``\\``. Exact same match set as ``_pattern_matches``
    (greedy wildcards are equivalent for existence-of-match)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    like = "".join(out)
    if not anchored:
        like += "%"
    return like


def robots_rules_df(
    spark, robots: list[tuple[str, str]], user_agent: str = "*"
) -> DataFrame:
    """``[(host, robots_txt), ...]`` -> the broadcastable rule frame
    ``(host, like_pattern, pattern_len, allow)``. Parsing happens once
    per HOST (driver-side for a literal list; hosts x rules is tiny
    next to the URL corpus — the web's robots.txt census is ~10^8
    rows upper bound, and per-pipeline blocklists are far smaller).
    """
    rows = []
    for host, txt in robots:
        for pattern, allow in parse_robots_txt(txt, user_agent):
            rows.append(
                (host.lower(), robots_like_pattern(pattern), len(pattern), allow)
            )
    out = spark.createDataFrame(
        rows, "host string, like_pattern string, pattern_len int, allow boolean"
    )
    # builder-known size (r8): the frame came from THIS driver list,
    # so annotate its payload bytes for maybe_broadcast's zero-job
    # fast path (the un-persisted-LogicalRDD probe otherwise costs a
    # job per gate check). UTF-8 bytes, not chars (review fix), plus
    # 64/row for int+bool+struct overhead; maybe_broadcast additionally
    # hints only below a quarter of the budget to absorb JVM
    # serialization overhead the annotation cannot see.
    out._sg_local_bytes = sum(
        len(h.encode()) + len(lp.encode()) + 64 for h, lp, _, _ in rows
    )
    return out


def with_robots_verdict(
    df: DataFrame,
    rules: DataFrame,
    url_col: str,
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Add ``out_col``: RFC 9309 verdict for every URL.

    Plan shape: the rule frame pre-aggregates to ONE row per host
    (``collect_list`` of its rules), which left-joins the URL frame
    1:1 on host; the longest-match argmax is then a pure array
    expression per row (``filter`` by LIKE -> ``array_max`` over
    (pattern_len, allow) structs). Row-preserving with NO row
    multiplication, NO synthetic row ids (an earlier join-back on
    ``monotonically_increasing_id`` computed the id in two lineages —
    nondeterministic under shuffle/retry, review finding).
    Unmatched / ruleless / unparseable-host URLs are allowed.

    Scale posture: the rule frame is broadcast via the SIZE-GATED
    ``maybe_broadcast`` — a per-pipeline rules set (hosts x a handful
    of rules) always takes the broadcast fast path, while a web-scale
    robots census (10^8 hosts x dozens of rules) exceeds the gate and
    degrades to a shuffle join on host instead of a broadcast OOM.

    The rules frame's join key is renamed to a reserved name before
    the join: a plain ``drop("host")`` after the join would remove
    EVERY column named ``host`` (Spark drop-by-name), silently eating
    a caller's own ``host`` column — a very plausible column in a
    crawl frame (review finding).
    """
    rules_by_host = (
        rules.withColumnRenamed("host", "__rhost")
        .groupBy("__rhost")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("pattern_len"), F.col("allow"), F.col("like_pattern")
                )
            ).alias("__rset")
        )
    )
    # the host-agg only REPACKS the same cells (one row per host), so
    # the builder-known byte annotation propagates unchanged
    if getattr(rules, "_sg_local_bytes", None) is not None:
        rules_by_host._sg_local_bytes = rules._sg_local_bytes
    work = df.withColumn("__host", url_host(F.col(url_col))).withColumn(
        "__path", F.coalesce(url_path(F.col(url_col)), F.lit("/"))
    )
    joined = work.join(
        maybe_broadcast(rules_by_host),
        work["__host"] == rules_by_host["__rhost"],
        "left",
    )
    best = F.expr(
        "array_max(transform("
        "  filter(__rset, r -> __path LIKE r.like_pattern ESCAPE '\\\\'),"
        "  r -> struct(r.pattern_len, r.allow)))"
    )
    return (
        joined.withColumn(out_col, F.coalesce(best["allow"], F.lit(True)))
        .drop("__host", "__path", "__rhost", "__rset")
    )


def filter_robots_disallowed(
    df: DataFrame, rules: DataFrame, url_col: str
) -> DataFrame:
    """Keep only URLs the host's robots.txt allows (the publish/refetch
    screen). Row schema unchanged."""
    out = with_robots_verdict(df, rules, url_col, out_col="__ra")
    return out.filter(F.col("__ra")).drop("__ra")
