"""OSM v0.6 API source — the reference's osmapi package re-expressed
as a Spark datasource with a PLUGGABLE transport.

The reference (osmapi/datasource.go:28-53) wraps an http.Client around
URL builders + an XML decode; everything but the socket is pure logic.
Here the URL grammar is reproduced EXACTLY (golden-tested against the
reference's fmt.Sprintf formats) and responses parse through the
engine's JVM XML codec into DataFrames; the transport is a callable
``url -> bytes`` so tests (and this sandbox, which has no network)
inject a fake server while production wires urllib/requests in without
touching any logic.

URL formats (verbatim from the reference):
- BaseURL ``http://api.openstreetmap.org/api/0.6``  datasource.go:16
- node     ``%s/node/%d?%s``                        node.go:23
- nodes    ``%s/nodes?nodes=1,2,3``                 node.go:49-58
- version  ``%s/node/%d/%d``                        node.go:79
- history  ``%s/node/%d/history``                   node.go:97 (way.go:100)
- node ways ``%s/node/%d/ways?%s``                  node.go:121
- relations of ``%s/way/%d/relations?%s``           way.go:125
- full     ``%s/way/%d/full?%s``                    way.go:147
- map      ``%s/map?bbox=%f,%f,%f,%f&%s``           map.go:23-26
- changeset ``%s/changeset/%d`` (+``?include_discussion=true``)
                                                    changeset.go:18,29
- download ``%s/changeset/%d/download``             changeset.go:56
- notes    ``%s/notes?bbox=%f,%f,%f,%f[&limit=N][&closed=N]``
                                                    note.go:47-61
- user     ``%s/user/%d``                           user.go:18
- At(t) option ``at=2006-01-02T15:04:05Z``          options.go:17-25
  (Go's reference-time layout == strftime %Y-%m-%dT%H:%M:%SZ, UTC)
- Go ``%f`` is fixed 6 decimals -> ``f"{v:.6f}"``.

Error taxonomy mirrors datasource.go:126-180: NotFound(404) /
Forbidden(403) / Gone(410) / RequestURITooLong(414) / UnexpectedStatus,
and ``not_found(err)`` matches datasource.go:119-125.

Scale note: per-id getters are parameter-sized lookups (the reference's
shape too — one element per request); BULK data always flows through
the parquet/replication sources. This module is API-surface parity,
not a bulk path, but the XML parse itself stays in the JVM
(regexp_extract_all + from_xml over the response body) so a many-URL
fetch parallelizes by mapping transport calls over a URL DataFrame.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_URL = "http://api.openstreetmap.org/api/0.6"  # datasource.go:16


# ----------------------------------------------------------------- errors
class NotFoundError(Exception):
    """404 — datasource.go:128-136."""

    def __init__(self, url: str):
        super().__init__(f"osmapi: not found at {url}")
        self.url = url


class ForbiddenError(Exception):
    """403 (redacted version) — datasource.go:139-147."""

    def __init__(self, url: str):
        super().__init__(f"osmapi: forbidden at {url}")
        self.url = url


class GoneError(Exception):
    """410 (deleted element) — datasource.go:150-158."""

    def __init__(self, url: str):
        super().__init__(f"osmapi: gone at {url}")
        self.url = url


class RequestURITooLongError(Exception):
    """414 (too many ids in a multi-id request) — datasource.go:161-169."""

    def __init__(self, url: str):
        super().__init__(f"osmapi: uri too long at {url}")
        self.url = url


class UnexpectedStatusCodeError(Exception):
    """Any other non-200 — datasource.go:172-180."""

    def __init__(self, code: int, url: str):
        super().__init__(
            f"osmapi: unexpected status code of {code} for url {url}"
        )
        self.code = code
        self.url = url


def not_found(err: Exception | None) -> bool:
    """datasource.go:119-125 NotFound."""
    return isinstance(err, NotFoundError)


STATUS_ERRORS = {
    404: NotFoundError,
    403: ForbiddenError,
    410: GoneError,
    414: RequestURITooLongError,
}


def raise_for_status(code: int, url: str) -> None:
    """getFromAPI's status dispatch (datasource.go:66-101)."""
    if code == 200:
        return
    exc = STATUS_ERRORS.get(code)
    raise exc(url) if exc else UnexpectedStatusCodeError(code, url)


def urllib_transport(
    timeout: float = 30.0,
    user_agent: str = "osm-spark/1.0",
    headers: dict[str, str] | None = None,
) -> Callable[[str], bytes]:
    """Production ``url -> bytes`` transport over urllib — the glue the
    reference gets from http.DefaultClient (datasource.go getFromAPI).
    HTTP statuses map to the same typed errors as raise_for_status
    (404 -> NotFoundError etc., datasource.go:66-101); gzip response
    bodies (Content-Encoding or .gz replication payloads served raw)
    are NOT decoded — callers own payload decompression, matching the
    pluggable-transport contract. Wire it explicitly:

        ds = OsmApiDatasource(spark, transport=urllib_transport())

    The env-gated live tests (tests/test_osmapi.py, OSM_SPARK_LIVE=1 —
    the reference's LIVE_TEST=true pattern, osmapi/live_test.go:15-19)
    exercise this against api.openstreetmap.org; the always-on replay
    test exercises it against a local loopback server."""
    import urllib.error
    import urllib.request

    def fetch(url: str) -> bytes:
        req = urllib.request.Request(
            url, headers={"User-Agent": user_agent, **(headers or {})}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            raise_for_status(e.code, url)
            raise  # pragma: no cover — raise_for_status always raises
    return fetch


# ------------------------------------------------------------ option/At
def at_param(t) -> str:
    """options.go:17-25: ``at=2006-01-02T15:04:05Z`` in UTC."""
    if isinstance(t, str):
        t = datetime.fromisoformat(t)
    if t.tzinfo is not None:
        t = t.astimezone(timezone.utc).replace(tzinfo=None)
    return "at=" + t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _q(params: Sequence[str]) -> str:
    return "&".join(p for p in params if p)


class OsmApiDatasource:
    """URL grammar + fetch + JVM XML parse. ``transport`` is a callable
    ``url -> bytes`` (raise one of the error classes to signal status);
    None leaves the source usable for URL building only."""

    def __init__(
        self,
        spark: SparkSession,
        transport: Callable[[str], bytes] | None = None,
        base_url: str | None = None,
    ):
        self.spark = spark
        self.transport = transport
        self.base_url = base_url or BASE_URL

    # ------------------------------------------------------ URL builders
    def element_url(self, etype: str, eid: int, at: str | None = None) -> str:
        p = at_param(at) if at else ""
        return f"{self.base_url}/{etype}/{eid}?{p}"

    def elements_url(
        self, etype: str, ids: Sequence[int], at: str | None = None
    ) -> str:
        # node.go:49-58: comma-joined ids under the pluralized key
        data = ",".join(str(int(i)) for i in ids)
        url = f"{self.base_url}/{etype}s?{etype}s={data}"
        if at:
            url += "&" + at_param(at)
        return url

    def element_version_url(self, etype: str, eid: int, version: int) -> str:
        return f"{self.base_url}/{etype}/{eid}/{version}"

    def element_history_url(self, etype: str, eid: int) -> str:
        return f"{self.base_url}/{etype}/{eid}/history"

    def element_relations_url(
        self, etype: str, eid: int, at: str | None = None
    ) -> str:
        p = at_param(at) if at else ""
        return f"{self.base_url}/{etype}/{eid}/relations?{p}"

    def node_ways_url(self, eid: int, at: str | None = None) -> str:
        p = at_param(at) if at else ""
        return f"{self.base_url}/node/{eid}/ways?{p}"

    def element_full_url(self, etype: str, eid: int, at: str | None = None) -> str:
        # way.go:147 / relation.go:148 — full only exists for way/relation
        p = at_param(at) if at else ""
        return f"{self.base_url}/{etype}/{eid}/full?{p}"

    def map_url(self, minlon, minlat, maxlon, maxlat, at: str | None = None) -> str:
        # map.go:23-26: bbox=%f,%f,%f,%f in (MinLon, MinLat, MaxLon,
        # MaxLat) order; Go %f == fixed 6 decimals
        p = at_param(at) if at else ""
        return (
            f"{self.base_url}/map?bbox={minlon:.6f},{minlat:.6f},"
            f"{maxlon:.6f},{maxlat:.6f}&{p}"
        )

    def changeset_url(self, cid: int, include_discussion: bool = False) -> str:
        if include_discussion:
            return f"{self.base_url}/changeset/{cid}?include_discussion=true"
        return f"{self.base_url}/changeset/{cid}"

    def changeset_download_url(self, cid: int) -> str:
        return f"{self.base_url}/changeset/{cid}/download"

    def notes_url(
        self,
        minlon,
        minlat,
        maxlon,
        maxlat,
        limit: int | None = None,
        max_days_closed: int | None = None,
    ) -> str:
        # note.go:47-61 + options.go:34-59 (limit validated 1..10000)
        params = [
            f"bbox={minlon:.6f},{minlat:.6f},{maxlon:.6f},{maxlat:.6f}"
        ]
        if limit is not None:
            if not 1 <= limit <= 10000:
                raise ValueError("osmapi: limit must be between 1 and 10000")
            params.append(f"limit={limit}")
        if max_days_closed is not None:
            params.append(f"closed={max_days_closed}")
        return f"{self.base_url}/notes?{_q(params)}"

    def note_url(self, nid: int) -> str:
        return f"{self.base_url}/notes/{nid}"  # note.go:21

    def notes_search_url(
        self,
        query: str,
        limit: int | None = None,
        max_days_closed: int | None = None,
    ) -> str:
        # note.go:83-98: q is url.QueryEscape'd (space -> '+', which is
        # exactly urllib's quote_plus)
        from urllib.parse import quote_plus

        params = [f"q={quote_plus(query)}"]
        if limit is not None:
            if not 1 <= limit <= 10000:
                raise ValueError("osmapi: limit must be between 1 and 10000")
            params.append(f"limit={limit}")
        if max_days_closed is not None:
            params.append(f"closed={max_days_closed}")
        return f"{self.base_url}/notes/search?{_q(params)}"

    def user_url(self, uid: int) -> str:
        return f"{self.base_url}/user/{uid}"

    # --------------------------------------------------------- fetch+parse
    def _fetch(self, url: str) -> str:
        if self.transport is None:
            raise RuntimeError(
                "no transport wired (this sandbox has no network); pass "
                "transport=url->bytes to OsmApiDatasource"
            )
        return self.transport(url).decode("utf-8")

    def _parse_nodes(self, body: str) -> DataFrame:
        """Parse every <node .../> of an OSM XML body via the engine's
        JVM codec (functions/xml_codec.py schema): regexp-extract the
        element snippets, explode, from_xml each. No Python parsing."""
        from osm_spark.functions.xml_codec import _NODE_SCHEMA

        df = self.spark.createDataFrame([(body,)], "body string")
        snippets = F.regexp_extract_all(
            "body", F.lit(r"(<node\b[^>]*/>|<node\b[\s\S]*?</node>)"), 1
        )
        out = df.select(F.explode(snippets).alias("xml")).select(
            F.from_xml("xml", _NODE_SCHEMA, {"rowTag": "node"}).alias("n")
        )
        return out.select(
            F.col("n._id").alias("id"),
            F.col("n._lat").alias("lat"),
            F.col("n._lon").alias("lon"),
            F.col("n._version").alias("version"),
            F.col("n._changeset").alias("changeset"),
            F.col("n.tag").alias("tags"),
        )

    def node(self, eid: int, at: str | None = None) -> DataFrame:
        """Latest (or as-of) version of one node — node.go:18-35; the
        reference errors unless exactly one node returns."""
        df = self._parse_nodes(self._fetch(self.element_url("node", eid, at)))
        rows = df.limit(2).collect()
        if len(rows) != 1:
            raise ValueError(
                f"wrong number of nodes, expected 1, got {len(rows)}"
            )
        return df

    def nodes(self, ids: Sequence[int], at: str | None = None) -> DataFrame:
        return self._parse_nodes(
            self._fetch(self.elements_url("node", ids, at))
        )

    def node_version(self, eid: int, version: int) -> DataFrame:
        return self._parse_nodes(
            self._fetch(self.element_version_url("node", eid, version))
        )

    def node_history(self, eid: int) -> DataFrame:
        return self._parse_nodes(
            self._fetch(self.element_history_url("node", eid))
        )

    def map(self, minlon, minlat, maxlon, maxlat, at: str | None = None) -> DataFrame:
        return self._parse_nodes(
            self._fetch(self.map_url(minlon, minlat, maxlon, maxlat, at))
        )

    # ----------------------------------------------- way/relation parse
    def _snippet_parse(self, body: str, tag: str, schema: str) -> DataFrame:
        df = self.spark.createDataFrame([(body,)], "body string")
        pat = rf"(<{tag}\b[^>]*/>|<{tag}\b[\s\S]*?</{tag}>)"
        snippets = F.regexp_extract_all("body", F.lit(pat), 1)
        return df.select(F.explode(snippets).alias("xml")).select(
            F.from_xml("xml", schema, {"rowTag": tag}).alias("e")
        )

    def _parse_ways(self, body: str) -> DataFrame:
        """Every <way> of an OSM XML body -> (id, version, changeset,
        refs array<long>, tags) via the JVM codec."""
        from osm_spark.functions.xml_codec import _WAY_SCHEMA

        out = self._snippet_parse(body, "way", _WAY_SCHEMA)
        return out.select(
            F.col("e._id").alias("id"),
            F.col("e._version").alias("version"),
            F.col("e._changeset").alias("changeset"),
            F.transform("e.nd", lambda n: n["_ref"]).alias("refs"),
            F.col("e.tag").alias("tags"),
        )

    def _parse_relations(self, body: str) -> DataFrame:
        """Every <relation> -> (id, version, changeset, members, tags)."""
        from osm_spark.functions.xml_codec import _REL_SCHEMA

        out = self._snippet_parse(body, "relation", _REL_SCHEMA)
        return out.select(
            F.col("e._id").alias("id"),
            F.col("e._version").alias("version"),
            F.col("e._changeset").alias("changeset"),
            F.transform(
                "e.member",
                lambda m: F.struct(
                    m["_type"].alias("type"),
                    m["_ref"].alias("ref"),
                    m["_role"].alias("role"),
                ),
            ).alias("members"),
            F.col("e.tag").alias("tags"),
        )

    def way(self, eid: int, at: str | None = None) -> DataFrame:
        """Latest (or as-of) version of one way — way.go:18-36."""
        df = self._parse_ways(self._fetch(self.element_url("way", eid, at)))
        if len(df.limit(2).collect()) != 1:
            raise ValueError("wrong number of ways, expected 1")
        return df

    def way_history(self, eid: int) -> DataFrame:
        return self._parse_ways(
            self._fetch(self.element_history_url("way", eid))
        )

    def way_full(self, eid: int, at: str | None = None):
        """way/<id>/full (way.go:136-154): (way df, nodes df)."""
        body = self._fetch(self.element_full_url("way", eid, at))
        return self._parse_ways(body), self._parse_nodes(body)

    def relation(self, eid: int, at: str | None = None) -> DataFrame:
        """Latest (or as-of) version of one relation — relation.go:18-36."""
        df = self._parse_relations(
            self._fetch(self.element_url("relation", eid, at))
        )
        if len(df.limit(2).collect()) != 1:
            raise ValueError("wrong number of relations, expected 1")
        return df

    def relation_history(self, eid: int) -> DataFrame:
        return self._parse_relations(
            self._fetch(self.element_history_url("relation", eid))
        )

    # ------------------------------------------ notes/changesets/users
    def _parse_notes(self, body: str) -> DataFrame:
        """Every <note> of a notes API body -> typed DataFrame.

        Shape from the reference Note struct (note.go:54-82): lat/lon
        are ATTRIBUTES, everything else child elements; dates use the
        '2006-01-02 15:04:05 MST' layout (note.go:16-49, the Date
        codec) which Spark's 'yyyy-MM-dd HH:mm:ss zzz' parses; comments
        are an ordered <comments><comment>... list (note.go:71-81)."""
        out = self._snippet_parse(body, "note", _NOTE_SCHEMA)
        return out.select(
            F.col("e.id").alias("id"),
            F.col("e._lat").alias("lat"),
            F.col("e._lon").alias("lon"),
            F.col("e.url").alias("url"),
            F.col("e.status").alias("status"),
            note_date(F.col("e.date_created")).alias("created"),
            note_date(F.col("e.date_closed")).alias("closed"),
            F.coalesce(
                F.transform(
                    "e.comments.comment",
                    lambda c: F.struct(
                        note_date(c["date"]).alias("date"),
                        c["uid"].alias("uid"),
                        c["user"].alias("user"),
                        c["action"].alias("action"),
                        c["text"].alias("text"),
                    ),
                ),
                F.array().cast(
                    "array<struct<date:timestamp,uid:bigint,"
                    "user:string,action:string,text:string>>"
                ),
            ).alias("comments"),
        )

    def _parse_changesets(self, body: str) -> DataFrame:
        """Every <changeset> -> typed DataFrame (changeset.go:20-38:
        all scalars are attributes, RFC3339 timestamps, ordered <tag>
        children, optional <discussion><comment> list from
        changeset.go:105-116)."""
        out = self._snippet_parse(body, "changeset", _CHANGESET_SCHEMA)
        return out.select(
            F.col("e._id").alias("id"),
            F.col("e._user").alias("user"),
            F.col("e._uid").alias("uid"),
            F.to_timestamp("e._created_at").alias("created_at"),
            F.to_timestamp("e._closed_at").alias("closed_at"),
            F.col("e._open").alias("open"),
            F.coalesce("e._num_changes", F.lit(0)).alias("num_changes"),
            F.col("e._min_lat").alias("min_lat"),
            F.col("e._max_lat").alias("max_lat"),
            F.col("e._min_lon").alias("min_lon"),
            F.col("e._max_lon").alias("max_lon"),
            F.coalesce("e._comments_count", F.lit(0)).alias(
                "comments_count"
            ),
            F.coalesce(
                F.transform(
                    "e.tag",
                    lambda t: F.struct(
                        t["_k"].alias("k"), t["_v"].alias("v")
                    ),
                ),
                F.array().cast("array<struct<k:string,v:string>>"),
            ).alias("tags"),
            F.coalesce(
                F.transform(
                    "e.discussion.comment",
                    lambda c: F.struct(
                        c["_uid"].alias("uid"),
                        c["_user"].alias("user"),
                        F.to_timestamp(c["_date"]).alias("date"),
                        c["text"].alias("text"),
                    ),
                ),
                F.array().cast(
                    "array<struct<uid:bigint,user:string,"
                    "date:timestamp,text:string>>"
                ),
            ).alias("discussion"),
        )

    def _parse_users(self, body: str) -> DataFrame:
        """Every <user> -> typed DataFrame (user.go:20-56: id /
        display_name / account_created attributes, nested single-attr
        child elements for img/changesets/traces/home/blocks/messages,
        <languages><lang> string list)."""
        out = self._snippet_parse(body, "user", _USER_SCHEMA)
        return out.select(
            F.col("e._id").alias("id"),
            F.col("e._display_name").alias("name"),
            F.col("e.description").alias("description"),
            F.to_timestamp("e._account_created").alias("created_at"),
            F.col("e.img._href").alias("img_href"),
            F.coalesce("e.changesets._count", F.lit(0)).alias(
                "changeset_count"
            ),
            F.coalesce("e.traces._count", F.lit(0)).alias("trace_count"),
            F.col("e.home._lat").alias("home_lat"),
            F.col("e.home._lon").alias("home_lon"),
            F.col("e.home._zoom").alias("home_zoom"),
            F.coalesce(
                "e.languages.lang", F.array().cast("array<string>")
            ).alias("languages"),
            F.coalesce("e.blocks.received._count", F.lit(0)).alias(
                "blocks_received"
            ),
            F.coalesce("e.blocks.received._active", F.lit(0)).alias(
                "blocks_active"
            ),
            F.coalesce("e.messages.received._count", F.lit(0)).alias(
                "messages_received"
            ),
            F.coalesce("e.messages.received._unread", F.lit(0)).alias(
                "messages_unread"
            ),
            F.coalesce("e.messages.sent._count", F.lit(0)).alias(
                "messages_sent"
            ),
        )

    def note(self, nid: int) -> DataFrame:
        """One note — note.go:19-32 (errors unless exactly one)."""
        df = self._parse_notes(self._fetch(self.note_url(nid)))
        if len(df.limit(2).collect()) != 1:
            raise ValueError("wrong number of notes, expected 1")
        return df

    def notes(
        self,
        minlon,
        minlat,
        maxlon,
        maxlat,
        limit: int | None = None,
        max_days_closed: int | None = None,
    ) -> DataFrame:
        """Notes in a bbox — note.go:44-68."""
        return self._parse_notes(
            self._fetch(
                self.notes_url(
                    minlon, minlat, maxlon, maxlat, limit, max_days_closed
                )
            )
        )

    def notes_search(
        self,
        query: str,
        limit: int | None = None,
        max_days_closed: int | None = None,
    ) -> DataFrame:
        """Notes whose text matches query — note.go:79-98."""
        return self._parse_notes(
            self._fetch(
                self.notes_search_url(query, limit, max_days_closed)
            )
        )

    def changeset(
        self, cid: int, include_discussion: bool = False
    ) -> DataFrame:
        """One changeset — changeset.go:17-46 (errors unless exactly
        one; include_discussion=True keeps the comment list)."""
        df = self._parse_changesets(
            self._fetch(self.changeset_url(cid, include_discussion))
        )
        if len(df.limit(2).collect()) != 1:
            raise ValueError("wrong number of changesets, expected 1")
        return df

    def parse_changeset_feed(self, body: str) -> DataFrame:
        """Decode a changeset feed — the replicate_changesets.rb XML
        served by changeset replication (same element shape as the
        API's changeset/<id> response, changeset_test.go:13-26). Needs
        no transport: the body is handed in (e.g. from the replication
        fetcher)."""
        return self._parse_changesets(body)

    def user(self, uid: int) -> DataFrame:
        """One user — user.go:17-30 (errors unless exactly one)."""
        df = self._parse_users(self._fetch(self.user_url(uid)))
        if len(df.limit(2).collect()) != 1:
            raise ValueError("wrong number of users, expected 1")
        return df


# XML schemas for the notes/changesets/users payloads (shapes from the
# reference structs: note.go:54-82, changeset.go:20-38 + 105-116,
# user.go:20-56; `_`-prefixed = attribute under Spark's XML mapping).
_NOTE_SCHEMA = (
    "struct<_lon:double,_lat:double,id:bigint,url:string,"
    "comment_url:string,close_url:string,reopen_url:string,"
    "date_created:string,date_closed:string,status:string,"
    "comments:struct<comment:array<struct<date:string,uid:bigint,"
    "user:string,user_url:string,action:string,text:string,"
    "html:string>>>>"
)

_CHANGESET_SCHEMA = (
    "struct<_id:bigint,_user:string,_uid:bigint,_created_at:string,"
    "_closed_at:string,_open:boolean,_num_changes:int,"
    "_min_lat:double,_max_lat:double,_min_lon:double,_max_lon:double,"
    "_comments_count:int,tag:array<struct<_k:string,_v:string>>,"
    "discussion:struct<comment:array<struct<_uid:bigint,_user:string,"
    "_date:string,text:string>>>>"
)

_USER_SCHEMA = (
    "struct<_id:bigint,_display_name:string,_account_created:string,"
    "description:string,img:struct<_href:string>,"
    "changesets:struct<_count:int>,traces:struct<_count:int>,"
    "home:struct<_lat:double,_lon:double,_zoom:int>,"
    "languages:struct<lang:array<string>>,"
    "blocks:struct<received:struct<_count:int,_active:int>>,"
    "messages:struct<received:struct<_count:int,_unread:int>,"
    "sent:struct<_count:int>>>"
)


def note_date(col) -> "F.Column":
    """The notes Date codec (note.go:16-49): layout
    '2006-01-02 15:04:05 MST' — Go's reference-time zone-abbreviation
    form, which is 'yyyy-MM-dd HH:mm:ss zzz' in Java; empty/missing
    elements parse to NULL (the reference's zero Date)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(
        F.nullif(c, F.lit("")), "yyyy-MM-dd HH:mm:ss zzz"
    )
