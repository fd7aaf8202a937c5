"""Temporal as-of annotation join — the reference's ``annotate`` core.

Semantics ported branch-exactly from the reference (all file:line refs
are into /root/reference):

- FindVisible          annotate/internal/core/types.go:39-110
- VersionBefore        types.go:113-125
- timeThreshold(+Parent) types.go:127-141
- Compute update loop  annotate/internal/core/compute.go:38-143
- nextVersionIndex     compute.go:145-197
- update timestamp     annotate/shared/child.go:105-111
- CommitInfoStart      update.go:9-12

Spark shape (SURVEY §3.2): posexplode parent refs, attach next-parent
metadata with a window ``lead`` over (pid, version), then
``cogroup(ref).applyInPandas`` — the branchy kernel runs per child ref
with its full version history and every (parent, slot) referencing it.
Distribution is by child ref — exactly the reference's ``mapChildLocs``
inverted index (compute.go:200-218) realized as a shuffle key. Groups
are tiny (one element's history), so the per-group Python is bounded;
the heavy lifting (explode, lead, shuffle, reassembly) is all JVM.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# update.go:9-12
COMMIT_INFO_START = pd.Timestamp("2012-09-12 09:30:03")
DEFAULT_THRESHOLD_SEC = 30 * 60  # annotate/options.go:13

_ZERO = pd.Timestamp(0)


def _tt(ts, committed):
    """timeThreshold (types.go:127-133) with esp=0: committed if it is
    on/after CommitInfoStart else the element timestamp."""
    if committed is None or pd.isna(committed) or committed < COMMIT_INFO_START:
        return ts
    return committed


class _Child:
    __slots__ = ("vidx", "version", "changeset", "ts", "committed", "visible",
                 "lat", "lon", "reverse")

    def __init__(self, vidx, version, changeset, ts, committed, visible, lat, lon,
                 reverse=False):
        self.vidx = vidx
        self.version = version
        self.changeset = changeset
        self.ts = ts
        self.committed = committed if committed is not None and not pd.isna(committed) else _ZERO
        self.visible = visible
        self.lat = lat
        self.lon = lon
        self.reverse = reverse

    def update_ts(self):
        """shared/child.go:105-111."""
        if self.ts < COMMIT_INFO_START or self.committed == _ZERO:
            return self.ts
        return self.committed


def find_visible(children, cid, at, eps):
    """types.go:39-110, branch-exact. children sorted by version index;
    eps is a pd.Timedelta; returns _Child or None."""
    diff = None  # None == Go's -1 sentinel
    nearest = None
    start = at - eps
    for c in children:
        if c.committed < COMMIT_INFO_START:
            offset = c.ts - start
            visible = c.visible
            if offset > 2 * eps:
                break
            if offset < pd.Timedelta(0):
                nearest = c if visible else None
                continue
            d = abs(offset - eps)
            if diff is None or d <= diff:
                if diff is None and not visible and offset == pd.Timedelta(0):
                    nearest = None
                if visible:
                    if offset <= eps:
                        nearest = c
                    elif c.changeset == cid:
                        nearest = c
                    else:
                        continue
                diff = d
        else:
            if c.committed > at:
                break
            nearest = c if c.visible else None
    return nearest


def version_before(children, end):
    """types.go:113-125: last child with timeThreshold strictly before end."""
    latest = None
    for c in children:
        if not _tt(c.ts, c.committed) < end:
            break
        latest = c
    return latest


def next_version_index(current, children, next_parent, eps):
    """compute.go:145-197 branch-exact. next_parent is a dict or None."""
    if next_parent is None:
        return children[-1].vidx + 1 if children else 0
    np_at = _parent_threshold(next_parent, pd.Timedelta(0))
    nxt = find_visible(children, next_parent["changeset"], np_at, eps)
    if nxt is not None:
        if _tt(nxt.ts, nxt.committed) < _parent_threshold(next_parent, -eps):
            return nxt.vidx + 1
        return nxt.vidx
    ts = _parent_threshold(next_parent, -eps)
    if current is not None and not ts > _tt(current.ts, current.committed):
        return 0
    nxt = version_before(children, ts)
    if nxt is None:
        return 0
    return nxt.vidx + 1


def _parent_threshold(p, esp):
    """timeThresholdParent (types.go:135-141): committed if known else
    ts + esp (esp only applies on the pre-commit-info branch)."""
    committed = p["committed"]
    if committed is None or pd.isna(committed) or committed < COMMIT_INFO_START:
        return p["ts"] + esp
    return committed


_OUT_SCHEMA = StructType(
    [
        StructField("pid", LongType()),
        StructField("parent_version", IntegerType()),
        StructField("parent_ts", TimestampType()),
        StructField("idx", IntegerType()),
        StructField("kind", StringType()),  # 'set' | 'update' | 'error'
        StructField("child_version", IntegerType()),
        StructField("child_changeset", LongType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("uts", TimestampType()),
        StructField("reverse", BooleanType()),
    ]
)


def _fast_path(refs_pdf, child_pdf, out, ignore_inconsistency):
    """Vectorized kernel for the dominant modern case: every child and
    parent committed on/after CommitInfoStart AND child committed
    nondecreasing in version order (then FindVisible degenerates to
    'last committed <= at', a searchsorted — types.go:101-104). Returns
    True if it handled the group, False to fall back to the branch-exact
    python loop."""
    import numpy as np

    cis = np.datetime64(COMMIT_INFO_START, "ns")
    C = child_pdf["committed"].to_numpy(dtype="datetime64[ns]")
    if len(C) == 0 or np.isnat(C).any() or (C < cis).any():
        return False
    if not (C[:-1] <= C[1:]).all():
        return False
    PC = refs_pdf["parent_committed"].to_numpy(dtype="datetime64[ns]")
    if np.isnat(PC).any() or (PC < cis).any():
        return False
    NC = refs_pdf["next_committed"].to_numpy(dtype="datetime64[ns]")
    has_next = ~refs_pdf["next_ts"].isna().to_numpy()
    if (has_next & (np.isnat(NC) | (NC < cis))).any():
        return False

    VIS = child_pdf["visible"].to_numpy(dtype=bool)
    if "reverse" in child_pdf.columns:
        REV = child_pdf["reverse"].fillna(False).to_numpy(dtype=bool)
    else:
        REV = np.zeros(len(VIS), dtype=bool)
    CV = child_pdf["version"].to_numpy()
    CCS = child_pdf["changeset"].to_numpy()
    CLAT = child_pdf["lat"].to_numpy(dtype=float)
    CLON = child_pdf["lon"].to_numpy(dtype=float)
    CTS = child_pdf["ts"].to_numpy(dtype="datetime64[ns]")
    # shared/child.go:105-111 update timestamp
    UTS = np.where(CTS < cis, CTS, C)
    n = len(C)

    # one row per parent, idx slots aggregated
    pid_a = refs_pdf["pid"].to_numpy()
    pver_a = refs_pdf["parent_version"].to_numpy()
    pts_a = refs_pdf["parent_ts"].to_numpy(dtype="datetime64[ns]")
    pvis_a = refs_pdf["parent_visible"].to_numpy(dtype=bool)
    idx_a = refs_pdf["idx"].to_numpy()

    pick = np.searchsorted(C, PC, side="right") - 1
    pick_ok = (pick >= 0) & VIS[np.clip(pick, 0, n - 1)]

    nv = np.full(len(PC), n, dtype=np.int64)
    if has_next.any():
        na = NC
        nidx = np.searchsorted(C, na, side="right") - 1
        n_ok = (nidx >= 0) & VIS[np.clip(nidx, 0, n - 1)]
        # visible next pick: +1 if strictly before next parent commit
        nv_next = nidx + (C[np.clip(nidx, 0, n - 1)] < na)
        # no visible next pick: 0 if pick within threshold of next parent,
        # else last strictly-before + 1 (== searchsorted left)
        vb = np.searchsorted(C, na, side="left")
        cond_zero = pick_ok & ~(na > C[np.clip(pick, 0, n - 1)])
        nv_nonext = np.where(cond_zero, 0, vb)
        nv = np.where(has_next, np.where(n_ok, nv_next, nv_nonext), nv)

    start = np.where(pick_ok, pick + 1, np.searchsorted(C, PC, side="left"))

    # group slots per parent (parents already sorted)
    key = np.empty(len(pid_a), dtype=object)
    boundaries = np.flatnonzero(
        np.r_[True, (pid_a[1:] != pid_a[:-1]) | (pver_a[1:] != pver_a[:-1])
              | (pts_a[1:] != pts_a[:-1])]
    )
    bounds = list(boundaries) + [len(pid_a)]
    for gi in range(len(bounds) - 1):
        s0, s1 = bounds[gi], bounds[gi + 1]
        if not pvis_a[s0]:
            continue
        pid, pver = int(pid_a[s0]), int(pver_a[s0])
        pts = pd.Timestamp(pts_a[s0])
        idxs = [int(i) for i in idx_a[s0:s1]]
        p = pick[s0]
        if pick_ok[s0]:
            for i in idxs:
                out.append((pid, pver, pts, i, "set", int(CV[p]), int(CCS[p]),
                            float(CLAT[p]), float(CLON[p]), None, None))
        elif not ignore_inconsistency:
            out.append((pid, pver, pts, idxs[0], "error",
                        None, None, None, None, None, None))
            continue
        for k in range(int(start[s0]), int(nv[s0])):
            if VIS[k]:
                for i in idxs:
                    out.append((pid, pver, pts, i, "update", int(CV[k]),
                                int(CCS[k]), float(CLAT[k]), float(CLON[k]),
                                pd.Timestamp(UTS[k]), bool(REV[k])))
            elif not ignore_inconsistency:
                out.append((pid, pver, pts, idxs[0], "error", int(CV[k]),
                            None, None, None, None, None))
    return True


def _make_kernel(threshold_sec: float, ignore_inconsistency: bool):
    eps = pd.Timedelta(seconds=threshold_sec)

    def kernel(refs_pdf: pd.DataFrame, child_pdf: pd.DataFrame):
        out = []
        # Build the sorted ChildList (datasource.go:114-149: sort by
        # version, assign 0-based VersionIndex).
        child_pdf = child_pdf.sort_values("version").reset_index(drop=True)
        # eps/threshold never enters the post-CommitInfoStart branches
        # (types.go:101-104), so the fast path is valid for any threshold.
        if len(child_pdf):
            sorted_refs = refs_pdf.sort_values(
                ["pid", "parent_version", "parent_ts", "idx"]
            ).reset_index(drop=True)
            if _fast_path(sorted_refs, child_pdf, out, ignore_inconsistency):
                return pd.DataFrame(
                    out,
                    columns=["pid", "parent_version", "parent_ts", "idx", "kind",
                             "child_version", "child_changeset", "lat", "lon",
                             "uts", "reverse"],
                )
            out = []
        has_rev = "reverse" in child_pdf.columns
        children = [
            _Child(
                i,
                int(r.version),
                int(r.changeset) if pd.notna(r.changeset) else 0,
                r.ts,
                r.committed,
                bool(r.visible),
                float(r.lat) if pd.notna(r.lat) else 0.0,
                float(r.lon) if pd.notna(r.lon) else 0.0,
                bool(r.reverse) if has_rev and pd.notna(r.reverse) else False,
            )
            for i, r in enumerate(child_pdf.itertuples())
        ]

        # parents are ordered by (version, ts) — the reference relies on
        # caller list order; duplicate versions exist in real data
        # (edgecases_test.go "2 nodes": same id+version, different ts).
        refs_pdf = refs_pdf.sort_values(["pid", "parent_version", "parent_ts", "idx"])
        for (pid, pver, pts), grp in refs_pdf.groupby(
            ["pid", "parent_version", "parent_ts"], sort=True
        ):
            first = grp.iloc[0]
            if not bool(first["parent_visible"]):
                continue
            if not children:
                # NoHistoryError path (compute.go:50-60) with
                # IgnoreMissingChildren: leave unannotated.
                continue
            parent = {
                "changeset": int(first["parent_changeset"]),
                "ts": first["parent_ts"],
                "committed": first["parent_committed"],
            }
            next_parent = None
            if pd.notna(first["next_ts"]):
                next_parent = {
                    "changeset": int(first["next_changeset"]),
                    "ts": first["next_ts"],
                    "committed": first["next_committed"],
                }
            at = _parent_threshold(parent, pd.Timedelta(0))
            c = find_visible(children, parent["changeset"], at, eps)
            if c is None and not ignore_inconsistency:
                out.append((int(pid), int(pver), pts, int(first["idx"]), "error",
                            None, None, None, None, None, None))
                continue

            idxs = [int(i) for i in grp["idx"]]
            if c is not None:
                for i in idxs:
                    out.append((int(pid), int(pver), pts, i, "set", c.version,
                                c.changeset, c.lat, c.lon, None, None))

            nv = next_version_index(c, children, next_parent, eps)
            if c is not None:
                start = c.vidx + 1
            else:
                nxt = version_before(children, at)
                start = 0 if nxt is None else nxt.vidx + 1
            for k in range(start, nv):
                ck = children[k]
                if ck.visible:
                    for i in idxs:
                        out.append((int(pid), int(pver), pts, i, "update", ck.version,
                                    ck.changeset, ck.lat, ck.lon, ck.update_ts(),
                                    ck.reverse))
                elif not ignore_inconsistency:
                    out.append((int(pid), int(pver), pts, int(first["idx"]), "error",
                                ck.version, None, None, None, None, None))

        return pd.DataFrame(
            out,
            columns=["pid", "parent_version", "parent_ts", "idx", "kind",
                     "child_version", "child_changeset", "lat", "lon", "uts",
                     "reverse"],
        )

    return kernel


def _fast_sql_path(slots: DataFrame, children: DataFrame) -> DataFrame:
    """The post-CommitInfoStart path of FindVisible/nextVersionIndex
    (types.go:101-104, compute.go:145-197) as pure JVM DataFrame ops —
    the plan SURVEY §2.3 prescribes: equi-join on ref + per-slot ordered
    reduction. Mirrors ``_fast_path``'s numpy logic expression-for-
    expression:

    - ``pick``      = argmax vidx with child.committed <= parent.committed
    - ``start``     = pick+1 if pick visible else #(committed < parent's)
    - ``nv``        = upper bound from the next parent version
    - 'set' row     = the pick, when visible
    - 'update' rows = visible children with vidx in [start, nv)

    Valid only for refs where every relevant commit timestamp is known,
    >= CommitInfoStart, and nondecreasing in version order — the caller
    routes all other refs to the branch-exact Python kernel. Assumes
    ignore_inconsistency (no 'error' rows)."""
    cis = F.lit(COMMIT_INFO_START.to_pydatetime())
    w = Window.partitionBy("ref").orderBy("version")
    has_rev = "reverse" in children.columns
    ch = children.withColumn("vidx", F.row_number().over(w) - 1)
    if not has_rev:
        ch = ch.withColumn("reverse", F.lit(None).cast("boolean"))

    j = slots.join(ch, "ref")
    C, PC, NC = F.col("committed"), F.col("parent_committed"), F.col("next_committed")
    crow = F.struct("vidx", "visible", "version", "changeset", "lat", "lon",
                    "committed")
    slot_cols = ["pid", "parent_version", "parent_ts", "idx", "ref",
                 "parent_visible", "parent_committed", "next_ts",
                 "next_committed"]
    agg = j.groupBy(*slot_cols).agg(
        F.max(F.when(C <= PC, crow)).alias("pick"),
        F.max(F.when(C <= NC, crow)).alias("nxt"),
        F.sum(F.when(C < PC, 1).otherwise(0)).alias("start_ss"),
        F.sum(F.when(C < NC, 1).otherwise(0)).alias("vb"),
        F.count(F.lit(1)).alias("n"),
    )
    pick_ok = F.col("pick").isNotNull() & F.col("pick.visible")
    has_next = F.col("next_ts").isNotNull()
    n_ok = F.col("nxt").isNotNull() & F.col("nxt.visible")
    nv_next = F.col("nxt.vidx") + (F.col("nxt.committed") < NC).cast("int")
    cond_zero = pick_ok & ~(NC > F.col("pick.committed"))
    nv_nonext = F.when(cond_zero, F.lit(0)).otherwise(F.col("vb"))
    ann = agg.where("parent_visible").select(
        "pid", "parent_version", "parent_ts", "idx", "ref",
        F.col("pick"),
        pick_ok.alias("pick_ok"),
        F.when(pick_ok, F.col("pick.vidx") + 1)
        .otherwise(F.col("start_ss"))
        .cast("long")
        .alias("start"),
        F.when(~has_next, F.col("n"))
        .otherwise(F.when(n_ok, nv_next).otherwise(nv_nonext))
        .cast("long")
        .alias("nv"),
    )
    sets = ann.where("pick_ok").select(
        "pid", "parent_version", "parent_ts", "idx",
        F.lit("set").alias("kind"),
        F.col("pick.version").cast("int").alias("child_version"),
        F.col("pick.changeset").alias("child_changeset"),
        F.col("pick.lat").alias("lat"),
        F.col("pick.lon").alias("lon"),
        F.lit(None).cast("timestamp").alias("uts"),
        F.lit(None).cast("boolean").alias("reverse"),
    )
    upds = (
        ann.where(F.col("start") < F.col("nv"))
        .select(
            "pid", "parent_version", "parent_ts", "idx", "ref",
            F.explode(F.sequence("start", F.col("nv") - 1)).alias("vidx"),
        )
        .join(ch, ["ref", "vidx"])
        .where("visible")
        .select(
            "pid", "parent_version", "parent_ts", "idx",
            F.lit("update").alias("kind"),
            F.col("version").cast("int").alias("child_version"),
            F.col("changeset").alias("child_changeset"),
            "lat", "lon",
            # shared/child.go:105-111
            F.when(F.col("ts") < cis, F.col("ts"))
            .otherwise(F.col("committed"))
            .alias("uts"),
            F.coalesce("reverse", F.lit(False)).alias("reverse"),
        )
    )
    return sets.unionByName(upds)


# DataFrames persisted by the most recent annotate_refs() call; see the
# persist note inside — bounded to one invocation's worth of blocks.
_PERSISTED: list[DataFrame] = []


def release_caches() -> None:
    """Unpersist cache blocks held by the last annotate_refs() call."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist(blocking=False)
        except Exception:
            pass


def annotate_refs(
    parents: DataFrame,
    children: DataFrame,
    threshold_sec: float = DEFAULT_THRESHOLD_SEC,
    ignore_inconsistency: bool = True,
    child_filter=None,
) -> DataFrame:
    """Core as-of annotation (compute.go:38-143).

    parents:  (pid, version, visible, changeset, ts, committed,
               refs array<struct<ref:long[, annotated:boolean]>> —
               positional)
    children: (ref, version, visible, changeset, ts, committed, lat, lon)

    ``child_filter`` (annotate ChildFilter, options.go:58-67): a
    function Column -> boolean Column over the ref id. Ref slots that
    are ALREADY annotated (``annotated`` struct field true) and fail
    the filter are skipped — compute.go:200-218 mapChildLocs semantics:
    unannotated slots are processed regardless of the filter, so a
    batch update can restrict work to its own children without losing
    anyone never annotated before.

    Returns rows (pid, parent_version, idx, kind, child_version,
    child_changeset, lat, lon, uts) where kind='set' is the major-version
    assignment (SetChild, way.go:111-120) and kind='update' the minor
    versions between parent versions.

    Plan: refs whose commit metadata is modern (post-CommitInfoStart,
    known, monotone) run the pure-JVM join/window plan
    (:func:`_fast_sql_path`); the rest — the pre-2012 eps-threshold
    tail, a vanishing fraction at scale — go through the branch-exact
    cogrouped Python kernel. ``ignore_inconsistency=False`` (error
    surfacing) forces everything through the kernel.
    """
    w = Window.partitionBy("pid").orderBy("version", "ts")
    p = (
        parents.withColumn("next_ts", F.lead("ts").over(w))
        .withColumn("next_committed", F.lead("committed").over(w))
        .withColumn("next_changeset", F.lead("changeset").over(w))
        .select(
            "pid",
            F.col("version").alias("parent_version"),
            F.col("visible").alias("parent_visible"),
            F.col("changeset").alias("parent_changeset"),
            F.col("ts").alias("parent_ts"),
            F.col("committed").alias("parent_committed"),
            "next_ts",
            "next_committed",
            "next_changeset",
            F.posexplode("refs").alias("idx", "_r"),
        )
        .withColumn("ref", F.col("_r.ref"))
    )
    ref_fields = parents.schema["refs"].dataType.elementType.fieldNames()
    if child_filter is not None and "annotated" in ref_fields:
        # mapChildLocs (compute.go:205-207): skip slots that are both
        # already-annotated AND rejected by the filter
        p = p.filter(
            ~(
                F.coalesce(F.col("_r.annotated"), F.lit(False))
                & ~child_filter(F.col("ref"))
            )
        )
    p = p.drop("_r")
    kernel = _make_kernel(threshold_sec, ignore_inconsistency)

    def _cogroup(slots_df, child_df):
        return (
            slots_df.groupBy("ref")
            .cogroup(child_df.groupBy("ref"))
            .applyInPandas(kernel, schema=_OUT_SCHEMA)
        )

    if not ignore_inconsistency:
        return _cogroup(p, children)

    # Both inputs feed four consumers (bad-ref detection, fast path,
    # slow-path semi joins); without persistence the whole upstream
    # (scan + explode + lead window) replans per consumer — measured 78
    # exchanges / ~20 rescans of the source in one query plan. The
    # persists can't be scoped to this call (the returned plan is lazy),
    # so each invocation evicts the previous invocation's blocks — a
    # long-lived session holds at most one annotation's cache; call
    # release_caches() to drop that too.
    release_caches()
    p = p.persist()
    children = children.persist()
    _PERSISTED.extend([p, children])

    cis = F.lit(COMMIT_INFO_START.to_pydatetime())
    wc = Window.partitionBy("ref").orderBy("version")
    bad_child = (
        children.withColumn("_pc", F.lag("committed").over(wc))
        .groupBy("ref")
        .agg(
            F.max(
                F.col("committed").isNull()
                | (F.col("committed") < cis)
                | (F.col("_pc").isNotNull() & (F.col("committed") < F.col("_pc")))
            ).alias("bad")
        )
        .where("bad")
        .select("ref")
    )
    bad_parent = (
        p.groupBy("ref")
        .agg(
            F.max(
                F.col("parent_committed").isNull()
                | (F.col("parent_committed") < cis)
                | (
                    F.col("next_ts").isNotNull()
                    & (
                        F.col("next_committed").isNull()
                        | (F.col("next_committed") < cis)
                    )
                )
            ).alias("bad")
        )
        .where("bad")
        .select("ref")
    )
    slow_refs = bad_child.unionByName(bad_parent).distinct()
    if slow_refs.isEmpty():
        # common modern case: no eps-threshold tail at all — skip the
        # anti/semi joins and the Python-kernel branch entirely (the
        # isEmpty() materializes the persisted inputs the main query
        # needs anyway, so the extra action is nearly free)
        return _fast_sql_path(p, children)
    fast = _fast_sql_path(
        p.join(slow_refs, "ref", "left_anti"),
        children.join(slow_refs, "ref", "left_anti"),
    )
    slow = _cogroup(
        p.join(slow_refs, "ref", "left_semi"),
        children.join(slow_refs, "ref", "left_semi"),
    )
    return fast.unionByName(slow)


def annotate_ways(
    ways: DataFrame,
    node_histories: DataFrame,
    threshold_sec: float = DEFAULT_THRESHOLD_SEC,
    ignore_inconsistency: bool = True,
) -> DataFrame:
    """annotate.Ways (annotate/way.go:30-63): fill each way-node slot with
    the node version visible as-of the way's commit time, and attach the
    minor-version ``updates`` array.

    ways: (id, version, visible, changeset, ts, committed, tags,
           nodes array<struct<ref:long, ...>>)
    node_histories: (id, version, visible, changeset, ts, committed,
           lat, lon)

    Returns the ways DataFrame with ``nodes`` rewritten as
    array<struct<ref, version, changeset, lat, lon>> and ``updates`` as
    array<struct<idx, version, changeset, ts, lat, lon>>, both in slot /
    (index, ts) order (update.go:63-85 SortByIndex).
    """
    parents = ways.select(
        F.col("id").alias("pid"),
        "version",
        "visible",
        "changeset",
        "ts",
        "committed",
        F.transform("nodes", lambda n: F.struct(n["ref"].alias("ref"))).alias("refs"),
    )
    children = node_histories.select(
        F.col("id").alias("ref"), "version", "visible", "changeset", "ts",
        "committed", "lat", "lon",
    )
    ann = annotate_refs(parents, children, threshold_sec, ignore_inconsistency)

    sets = ann.filter(F.col("kind") == "set").select(
        "pid", "parent_version", "parent_ts", "idx", "child_version",
        "child_changeset", "lat", "lon",
    )
    upds = (
        ann.filter(F.col("kind") == "update")
        .groupBy("pid", "parent_version", "parent_ts")
        .agg(
            F.array_sort(
                F.collect_list(
                    # field order = sort key: (idx, version) — SortByIndex
                    # (update.go:63-74) is stable, and generation order per
                    # slot is ascending version index.
                    F.struct(
                        F.col("idx").alias("idx"),
                        F.col("child_version").alias("version"),
                        F.col("uts").alias("ts"),
                        F.col("child_changeset").alias("changeset"),
                        F.col("lat").alias("lat"),
                        F.col("lon").alias("lon"),
                    )
                )
            ).alias("updates")
        )
    )

    slots = ways.select(
        F.col("id").alias("pid"),
        F.col("version").alias("parent_version"),
        F.col("ts").alias("parent_ts"),
        F.posexplode("nodes").alias("idx", "node"),
    )
    filled = (
        slots.join(sets, ["pid", "parent_version", "parent_ts", "idx"], "left")
        .select(
            "pid",
            "parent_version",
            "parent_ts",
            "idx",
            F.struct(
                F.col("node.ref").alias("ref"),
                F.coalesce("child_version", F.lit(0)).alias("version"),
                F.coalesce("child_changeset", F.lit(0)).alias("changeset"),
                F.coalesce("lat", F.lit(0.0)).alias("lat"),
                F.coalesce("lon", F.lit(0.0)).alias("lon"),
            ).alias("node"),
        )
        .groupBy("pid", "parent_version", "parent_ts")
        .agg(
            F.array_sort(F.collect_list(F.struct("idx", "node"))).alias("_slots")
        )
        .select(
            "pid",
            "parent_version",
            "parent_ts",
            F.transform("_slots", lambda s: s["node"]).alias("nodes"),
        )
    )
    ren = lambda df: (
        df.withColumnRenamed("pid", "id")
        .withColumnRenamed("parent_version", "version")
        .withColumnRenamed("parent_ts", "ts")
    )
    out = (
        ways.drop("nodes")
        .join(ren(filled), ["id", "version", "ts"], "left")
        .join(ren(upds), ["id", "version", "ts"], "left")
    )
    return out
