"""Tag predicates over map<string,string> columns.

Reference semantics: tag.go (Find/HasTag/AnyInteresting) and
osmgeojson/convert.go:389-403 (hasInterestingTags). All pure column
HOFs — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tag.go:12-22
UNINTERESTING_TAGS = [
    "source",
    "source_ref",
    "source:ref",
    "history",
    "attribution",
    "created_by",
    "tiger:county",
    "tiger:tlid",
    "tiger:upload_uuid",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def find(tags, key) -> Column:
    """Tags.Find (tag.go:35-43): value or '' when absent."""
    return F.coalesce(F.element_at(_col(tags), key), F.lit(""))


def has_tag(tags, key) -> Column:
    """Tags.HasTag (tag.go:56-67)."""
    return F.map_contains_key(_col(tags), key)


def any_interesting(tags) -> Column:
    """Tags.AnyInteresting (tag.go:80-88): any key outside the
    UninterestingTags blocklist."""
    blocked = F.array(*[F.lit(k) for k in UNINTERESTING_TAGS])
    return F.exists(
        F.map_keys(_col(tags)), lambda k: ~F.array_contains(blocked, k)
    )


def has_interesting_tags(tags, ignore: dict[str, str] | None = None) -> Column:
    """osmgeojson hasInterestingTags (convert.go:389-403): blocklist plus
    a per-call ignore map; ignore value 'true' matches any value."""
    blocked = F.array(*[F.lit(k) for k in UNINTERESTING_TAGS])
    ignore = ignore or {}

    def pred(k, v):
        cond = ~F.array_contains(blocked, k)
        for ik, iv in ignore.items():
            if iv == "true":
                cond = cond & (k != F.lit(ik))
            else:
                cond = cond & ~((k == F.lit(ik)) & (v == F.lit(iv)))
        return cond

    return F.exists(
        F.map_entries(_col(tags)), lambda e: pred(e["key"], e["value"])
    )
