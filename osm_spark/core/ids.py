"""Packed element/feature/object id column expressions.

Reproduces the reference's bit-packing exactly (reference:
feature.go:62-77, element.go:22-83) so that sorting by the packed int64
yields (type, ref, version) order and fixtures sort identically.

Layout (int64):
    bits 63..56 : type  (0x7F mask; values below, pre-shifted)
    bits 55..16 : ref   (40 bits)
    bits 15..0  : version

All functions return Spark Column expressions — pure JVM bit math, no
UDFs, so they stay inside whole-stage codegen and push down through
Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# masks — reference feature.go:62-77
VERSION_BITS = 16
VERSION_MASK = 0x000000000000FFFF
REF_MASK = 0x00FFFFFFFFFF0000
FEATURE_MASK = 0x7FFFFFFFFFFF0000
TYPE_MASK = 0x7F00000000000000

BOUNDS_MASK = 0x0800000000000000
NODE_MASK = 0x1000000000000000
WAY_MASK = 0x2000000000000000
RELATION_MASK = 0x3000000000000000
CHANGESET_MASK = 0x4000000000000000
NOTE_MASK = 0x5000000000000000
USER_MASK = 0x6000000000000000

TYPE_TO_MASK = {
    "bounds": BOUNDS_MASK,
    "node": NODE_MASK,
    "way": WAY_MASK,
    "relation": RELATION_MASK,
    "changeset": CHANGESET_MASK,
    "note": NOTE_MASK,
    "user": USER_MASK,
}
MASK_TO_TYPE = {v: k for k, v in TYPE_TO_MASK.items()}


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def feature_id(typ, ref) -> Column:
    """type + ref -> FeatureID (all versions of an element).

    reference node.go:20-22: ``nodeMask | (id << versionBits)``.
    ``typ`` may be a literal python string or a string Column.
    """
    ref = _col(ref).cast("long")
    packed_ref = F.shiftleft(ref, VERSION_BITS)
    if isinstance(typ, str):
        return packed_ref.bitwiseOR(F.lit(TYPE_TO_MASK[typ]))
    # column form: map type name -> mask via chained CASE
    mask = F.lit(0).cast("long")
    expr = F.when(F.lit(False), F.lit(0).cast("long"))
    for name, m in TYPE_TO_MASK.items():
        expr = expr.when(_col(typ) == name, F.lit(m))
    return packed_ref.bitwiseOR(expr.otherwise(mask))


def element_id(fid, version) -> Column:
    """FeatureID + version -> ElementID (reference feature.go:109-111)."""
    return _col(fid).bitwiseOR(
        _col(version).cast("long").bitwiseAND(F.lit(VERSION_MASK))
    )


def eid(typ, ref, version) -> Column:
    return element_id(feature_id(typ, ref), version)


def ref_of(packed) -> Column:
    """Ref (raw element id) from a packed id (feature.go:101-103)."""
    return F.shiftright(_col(packed).bitwiseAND(F.lit(REF_MASK)), VERSION_BITS)


def version_of(packed) -> Column:
    """Version from a packed ElementID (element.go:36-43)."""
    return _col(packed).bitwiseAND(F.lit(VERSION_MASK)).cast("int")


def feature_of(packed) -> Column:
    """Strip the version: ElementID -> FeatureID (element.go:51-53)."""
    return _col(packed).bitwiseAND(F.lit(FEATURE_MASK | TYPE_MASK))


def type_of(packed) -> Column:
    """Type name string from a packed id (feature.go:85-97)."""
    t = _col(packed).bitwiseAND(F.lit(TYPE_MASK))
    expr = F.when(t == F.lit(NODE_MASK), F.lit("node"))
    for name, m in TYPE_TO_MASK.items():
        if name == "node":
            continue
        expr = expr.when(t == F.lit(m), F.lit(name))
    return expr.otherwise(F.lit(""))


def id_string(packed) -> Column:
    """Format ``"type/ref:version"`` (element.go:76-83); feature ids
    (version 0 via feature_of) format as ``"type/ref"``."""
    base = F.concat_ws("/", type_of(packed), ref_of(packed).cast("string"))
    v = version_of(packed)
    return F.when(v == 0, base).otherwise(
        F.concat(base, F.lit(":"), v.cast("string"))
    )


def parse_id_string(s) -> Column:
    """Parse ``"type/ref[:version]"`` back to a packed ElementID
    (element.go:86-127)."""
    s = _col(s)
    typ = F.regexp_extract(s, r"^([a-z]+)/", 1)
    ref = F.regexp_extract(s, r"/(\d+)", 1).cast("long")
    ver = F.coalesce(
        F.nullif(F.regexp_extract(s, r":(\d+)$", 1), F.lit("")).cast("long"),
        F.lit(0).cast("long"),
    )
    return element_id(feature_id(typ, ref), ver)
