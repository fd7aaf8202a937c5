"""URL canonicalization + host rollups — the Common-Crawl-side
operators a webtext pipeline needs before dedup/grouping.

All pure column math (regexp + string ops, engine-portable patterns:
ASCII classes, no lookarounds), each with an exact SQL twin:

- canonicalize: lowercase scheme+host, strip default ports (:80/:443),
  drop fragments, strip utm_* tracking params, drop a single trailing
  slash on non-root paths;
- host / registered host extraction;
- per-host rollups run on the canonical form so near-duplicate urls
  (tracking-param variants) collapse before counting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(url) -> Column:
    """Lowercased host (no port, no credentials)."""
    u = _c(url)
    host = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    host = F.regexp_replace(host, r"^[^@]*@", "")  # strip userinfo
    host = F.regexp_replace(host, r":[0-9]+$", "")  # strip port
    return F.lower(host)


def url_canonical(url) -> Column:
    """Canonical form (see module docstring). Deterministic pure string
    math; the SQL twin applies the identical replacement sequence."""
    u = _c(url)
    # 1. drop fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme://host[:port]
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substring(u, F.length(head) + 1, F.lit(1 << 30))
    u = F.concat(F.lower(head), tail)
    # 3. strip default ports
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443(?:([/?#])|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80(?:([/?#])|$)", r"$1$2")
    # 4. strip utm_* params (leading or mid-query), then dangling ?/&
    u = F.regexp_replace(u, r"([?&])utm_[a-zA-Z0-9_]*=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 5. drop ONE trailing slash on a non-root path (no query present)
    u = F.regexp_replace(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^?#]*[^/?#])/$", r"$1")
    return u


URL_CANONICAL_SQL_STEPS = [
    # (pattern, replacement) — DuckDB regexp_replace applies RE2; the
    # pattern set is lookaround-free and uses \\1-style backrefs
    (r"#.*$", r""),
    # (scheme+host lowercasing is done structurally in SQL — see url_canonical_sql)
    (r"^(https://[^/?#:]*):443(?:([/?#])|$)", r"\1\2"),
    (r"^(http://[^/?#:]*):80(?:([/?#])|$)", r"\1\2"),
    (r"([?&])utm_[a-zA-Z0-9_]*=[^&#]*", r"\1"),
    (r"\?&+", r"?"),
    (r"&&+", r"&"),
    (r"[?&]$", r""),
    (r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^?#]*[^/?#])/$", r"\1"),
]


def url_canonical_sql(url: str) -> str:
    """DuckDB twin of :func:`url_canonical`."""
    u = f"regexp_replace({url}, '#.*$', '', 'g')"
    head = f"regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)"
    u = f"(lower({head}) || substr({u}, length({head}) + 1))"
    for pat, rep in URL_CANONICAL_SQL_STEPS[1:]:
        # DuckDB standard strings pass backslashes through verbatim —
        # '\1' IS the RE2 backreference, no extra escaping
        pat_sql = pat.replace("'", "''")
        u = f"regexp_replace({u}, '{pat_sql}', '{rep}', 'g')"
    return u


def url_host_sql(url: str) -> str:
    h = f"regexp_extract({url}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)"
    h = f"regexp_replace({h}, '^[^@]*@', '', 'g')"
    h = f"regexp_replace({h}, ':[0-9]+$', '', 'g')"
    return f"lower({h})"
