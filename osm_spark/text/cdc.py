"""Content-defined chunking (CDC) — shift-resistant dedup units.

Fixed-size chunking (chunk_dedup's C4-style 8-word blocks) breaks on
insertion: one added sentence shifts every later block boundary and
every downstream digest changes.  CDC places boundaries where a hash
of the LAST w characters hits a target residue, so boundaries are a
pure function of local content — after an edit, boundaries (and hence
chunk digests) re-synchronize within w characters, and the rest of
the document dedups against the unedited copy.  This is the
rsync/LBFS/FastCDC family; the windowed polynomial below is the
Rabin-style variant whose boundary predicate depends on EXACTLY the
trailing w-gram (no unbounded rolling state), which is what makes it
replayable in ANSI SQL and bit-identical across engines.

Scale shape: chunking is entirely IN-ROW — no shuffle, no Python, no
per-position row blowup of the text; the only shuffle in a CDC dedup
is the digest-keyed first-occurrence window (exact dedup's audited
shape, |chunks| rows of digests, never document bytes).

Expression-evaluation discipline (the lesson this module encodes):
higher-order-function lambdas get NO common-subexpression
elimination, and CollapseProject inlines single-use aliases INTO
lambda bodies — so both the nested formulation (chunk structs over a
boundary array over per-position hashes over a char-code array) and
the staged-withColumn formulation collapse into per-element
re-evaluation of the inner arrays: O(len^3) per document, measured
MINUTES per partition at 300-char documents.  The fix is not a
barrier hack but an algorithmic shape: ONE ``aggregate`` fold over
the code array whose accumulator carries the sliding w-window and
the boundary list, so every lambda references only its own lambda
variables — linear work, single evaluation, whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cdc_chunks(
    text_col,
    w: int = 8,
    base: int = 33,
    mod: int = 32,
    rem: int = 17,
) -> Column:
    """-> array<struct<start, chunk_len, digest>> of CDC chunks.

    ``start`` is the 0-based character offset, ``digest`` the md5 hex
    of the chunk's utf-8 bytes.  A boundary after 1-based position i
    (i >= w) requires hash(text[i-w+1 .. i]) % mod == rem, where hash
    is the base-``base`` polynomial with the newest character in the
    units digit; expected chunk length is ~``mod`` characters.
    Concatenating the chunks in order reproduces the document
    byte-for-byte (pytest-pinned — chunking must lose nothing);
    texts shorter than ``w`` yield one whole-document chunk, empty
    texts zero chunks."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(t)
    # split(t, "") keeps a trailing "" element (Java split limit -1);
    # dropping empties also collapses the empty-text [""] case to []
    codes = F.transform(
        F.filter(F.split(t, ""), lambda c: c != ""),
        lambda c: F.ascii(c).cast("long"),
    )

    def merge(acc, c):
        winw = F.concat(acc["win"], F.array(c))
        win_new = F.when(F.size(winw) > w, F.slice(winw, 2, w)).otherwise(
            winw
        )
        p_new = acc["p"] + 1
        h = F.aggregate(
            win_new,
            F.lit(0).cast("long"),
            lambda a, x: a * base + x,
        )
        bounds_new = F.when(
            (F.size(win_new) == w) & (h % mod == rem),
            F.concat(acc["bounds"], F.array(p_new)),
        ).otherwise(acc["bounds"])
        return F.struct(
            win_new.alias("win"),
            bounds_new.alias("bounds"),
            p_new.alias("p"),
        )

    zero = F.struct(
        F.array().cast("array<bigint>").alias("win"),
        F.array().cast("array<int>").alias("bounds"),
        F.lit(0).cast("int").alias("p"),
    )

    # Bracketing + chunk extraction live in the FINISH lambda, where
    # ``acc`` is the fold's materialized result: referencing
    # acc["bounds"] several times re-reads a value, while referencing
    # the aggregate EXPRESSION several times would re-run the whole
    # fold per reference (measured ~7x per row in the expression-level
    # formulation).  0 and len bracket the chunks; array_distinct
    # collapses len doubling as a boundary and the empty-text
    # degenerate ([0, 0] -> [0] -> zero chunks).
    empty = F.array().cast(
        "array<struct<start:bigint,chunk_len:bigint,digest:string>>"
    )

    def finish(acc):
        barr = F.array_sort(
            F.array_distinct(
                F.concat(F.array(F.lit(0)), acc["bounds"], F.array(n))
            )
        )
        chunks = F.zip_with(
            F.slice(barr, 1, F.size(barr) - 1),
            F.slice(barr, 2, F.size(barr) - 1),
            lambda s, e: F.struct(
                s.cast("long").alias("start"),
                (e - s).cast("long").alias("chunk_len"),
                F.md5(F.encode(t.substr(s + 1, e - s), "UTF-8")).alias(
                    "digest"
                ),
            ),
        )
        return F.when(F.size(barr) >= 2, chunks).otherwise(empty)

    return F.aggregate(codes, zero, merge, finish)


def window_hash_sql(text: str, i: str, w: int = 8, base: int = 33) -> str:
    """DuckDB twin of the per-position hash over ``substr`` —
    character semantics match Spark's (both operate on codepoints)."""
    terms = [
        f"CAST(ascii(substr({text}, {i} - {j}, 1)) AS BIGINT)"
        f" * {base ** j}"
        for j in range(w)
    ]
    return "(" + " + ".join(terms) + ")"
