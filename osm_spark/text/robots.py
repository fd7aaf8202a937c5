"""robots.txt (Robots Exclusion Protocol, RFC 9309) parse + URL-rule
evaluation — the crawl-policy gate every Common-Crawl-style pipeline
applies before a page enters the corpus.

Spark-first shapes:

- **Parsing is a window pass, not a UDF**: a robots file is a line
  sequence where each Allow/Disallow rule belongs to the most recent
  ``User-agent`` group above it — split lines, ``posexplode``, and
  propagate the current agent down with ``last(..., ignorenulls)`` over
  an ordered window per (host, file).  Pure column ops.
- **Evaluation is a broadcast join**: the rules table is tiny per host
  (a few dozen rows), so urls join rules on host broadcast-side, match
  path patterns with LIKE (RFC prefix match; ``*`` wildcards and the
  ``$`` end anchor translated to SQL LIKE), and pick the winner by the
  RFC's longest-match rule (specificity = pattern length; ties go to
  Allow).  No shuffle on the page side beyond the join itself.

The reference engine has no crawl-policy surface; the structural
analogue is its tag-predicate filter pushdown (osm/tags.go Find/HasTag)
— a small decision table broadcast against the big table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# RFC 9309: case-insensitive directive names, optional whitespace.
_AGENT_RE = r"(?i)^[ \t]*user-agent[ \t]*:[ \t]*([^ \t#]+)"
_RULE_RE = r"(?i)^[ \t]*(allow|disallow)[ \t]*:[ \t]*([^ \t#]*)"


def parse_robots(files: DataFrame, host_col: str, txt_col) -> DataFrame:
    """(host, robots_txt) -> one row per (agent, Allow/Disallow rule):
    ``(host, agent, allow: boolean, pattern: string, spec: int)``.

    RFC 9309 group semantics: consecutive ``User-agent`` lines STACK
    (2.2.1 — they form one group sharing the rules that follow), so the
    parse assigns each line a group id (a group starts at a User-agent
    line not directly preceded by another) and then joins each group's
    rules to EVERY agent token of that group.  Lines split on ``\\r?\\n``
    (CRLF robots.txt is the common on-the-wire case).  ``spec`` is the
    RFC longest-match specificity (pattern length).  An empty Disallow
    value ("Disallow:") means allow-all and is dropped, per RFC.  Rules
    before any User-agent line are dropped (rules outside a group are
    ignored)."""
    lines = files.select(
        F.col(host_col),
        F.posexplode(F.split(_c(txt_col), "\r?\n")).alias("li", "line"),
    )
    agent_tok = F.lower(F.regexp_extract("line", _AGENT_RE, 1))
    ordered = Window.partitionBy(host_col).orderBy("li")
    cum = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = lines.select(
        F.col(host_col),
        F.col("li"),
        agent_tok.alias("agent_tok"),
        F.lower(F.regexp_extract("line", _RULE_RE, 1)).alias("verb"),
        F.regexp_extract("line", _RULE_RE, 2).alias("pattern"),
    )
    is_agent = F.col("agent_tok") != ""
    prev_is_agent = F.coalesce(
        F.lag(is_agent).over(ordered), F.lit(False)
    )
    # group id = number of group STARTS seen so far (0 = before any group)
    grouped = tagged.withColumn(
        "gid",
        F.sum((is_agent & ~prev_is_agent).cast("int")).over(cum),
    )
    agents = grouped.where(is_agent).select(
        F.col(host_col), F.col("gid"), F.col("agent_tok").alias("agent")
    )
    rules = grouped.where(
        (F.col("gid") > 0) & (F.col("verb") != "") & (F.col("pattern") != "")
    ).select(
        F.col(host_col), F.col("gid"),
        (F.col("verb") == "allow").alias("allow"),
        F.col("pattern"),
        F.length("pattern").cast("int").alias("spec"),
    )
    return agents.join(rules, [host_col, "gid"]).drop("gid")


def _like_pattern(pattern) -> Column:
    """robots path pattern -> SQL LIKE pattern: escape LIKE metachars,
    ``*`` -> ``%``, trailing ``$`` anchors the end (no trailing ``%``),
    otherwise prefix match (append ``%``)."""
    p = _c(pattern)
    esc = F.replace(
        F.replace(F.replace(p, F.lit("\\"), F.lit("\\\\")),
                  F.lit("%"), F.lit("\\%")),
        F.lit("_"), F.lit("\\_"),
    )
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    anchored = F.endswith(p, F.lit("$"))
    body = F.when(anchored, F.substring(esc, 1, F.length(esc) - 1)).otherwise(esc)
    return F.when(anchored, body).otherwise(F.concat(body, F.lit("%")))


def robots_eval(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    agent: str = "*",
) -> DataFrame:
    """Evaluate each (host, path) url row against the rules of the
    given agent's group (falling back to the ``*`` group when the agent
    has no own group on that host, per RFC 9309 group selection).

    Adds ``allowed`` (boolean; default TRUE when nothing matches) and
    ``matched`` (winning pattern or NULL).

    100 TB shape: the per-host rule lists pack into ONE array column
    and broadcast; each page row then joins 1:1 and picks its winner
    with in-row higher-order functions (filter by LIKE, max by
    (specificity, allow)) — the page side takes zero shuffles and never
    widens."""
    agent = agent.lower()
    own = rules.where(F.col("agent") == agent)
    star = rules.where(F.col("agent") == "*")
    hosts_with_own = own.select(host_col).distinct()
    star_effective = star.join(hosts_with_own, host_col, "left_anti")
    grp = own.unionByName(star_effective)
    packed = (
        grp.select(
            F.col(host_col).alias("__rh"),
            F.struct(
                F.col("spec").alias("spec"),
                F.col("allow").alias("allow"),
                F.col("pattern").alias("pattern"),
                _like_pattern(F.col("pattern")).alias("like"),
            ).alias("__rule"),
        )
        .groupBy("__rh")
        .agg(F.collect_list("__rule").alias("__rules"))
    )
    j = urls.join(
        F.broadcast(packed), _c(host_col) == F.col("__rh"), "left"
    )
    path = _c(path_col)
    hits = F.filter(
        F.coalesce(
            F.col("__rules"),
            F.array().cast(
                "array<struct<spec:int,allow:boolean,"
                "pattern:string,like:string>>"
            ),
        ),
        lambda r: F.like(path, r["like"], F.lit("\\")),
    )
    # RFC longest-match: max specificity wins; tie -> Allow wins
    # (struct ordering (spec, allow, pattern) — pattern as final
    # deterministic tiebreak).
    best = F.array_max(
        F.transform(
            hits,
            lambda r: F.struct(
                r["spec"].alias("s"),
                r["allow"].cast("int").alias("a"),
                r["pattern"].alias("p"),
            ),
        )
    )
    return j.select(
        *urls.columns,
        F.coalesce(best["a"] == 1, F.lit(True)).alias("allowed"),
        best["p"].alias("matched"),
    )
