"""Raw-source adapters — Spark-first equivalents of Hedera's file-format
machinery (reference: java/main/org/hedera/io/input/
WikiRevisionTextInputFormat.java + util/ByteMatcher.java +
util/SeekableInputStream.java for split-aware XML dump reading;
pig/load/ClueWeb09WarcLoader.java for WARC; pig/load/FileNameLoader.java;
pig/utils/XML2JSON.pig for dump flattening).

Hedera spends thousands of lines on byte-level split alignment so Hadoop
mappers can start mid-dump. Spark-first, record splitting is the `lineSep`
option on the text source (each `</page>`/WARC-header delimited blob is a
row, splittable at scale) and parsing is the declarative `from_xml` /
regexp expression layer — Catalyst keeps it JVM-side and prunes unused
fields. The output schema matches the reference's flattened JSON revision
schema (WIKIREVISION.md §3.1): page_id, page_title, page_namespace,
rev_id, parent_id, timestamp, user, user_id, comment, text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REVISION_XML_SCHEMA = (
    "title STRING, ns INT, id LONG, "
    "revision ARRAY<STRUCT<id: LONG, parentid: LONG, timestamp: STRING, "
    "contributor: STRUCT<username: STRING, id: LONG, ip: STRING>, "
    "comment: STRING, text: STRING>>"
)


def read_revision_xml(spark: SparkSession, path: str) -> DataFrame:
    """MediaWiki revision-history dump → one row per revision.

    Split on '</page>' so every task parses whole pages (the same record
    boundary Hedera's WikiRevisionTextInputFormat seeks to, minus the
    byte-matcher machinery); then declarative from_xml + explode of the
    page's revision array. Reference: io/input/WikiRevisionPageInputFormat.java
    (same emitted fields), WIKIREVISION.md.
    """
    pages = (
        spark.read.option("lineSep", "</page>")
        .text(path)
        .select(F.concat(F.col("value"), F.lit("</page>")).alias("raw"))
        .where(F.col("raw").contains("<page"))
        # keep only the <page>...</page> span so stray prolog/suffix text
        # (e.g. the <mediawiki> wrapper) never reaches the XML parser
        .select(
            F.regexp_extract("raw", r"(?s)(<page>.*</page>)", 1).alias("page_xml")
        )
        .where(F.col("page_xml") != "")
    )
    parsed = pages.select(
        F.from_xml("page_xml", REVISION_XML_SCHEMA).alias("p")
    )
    # malformed page blobs parse to a null struct / null id (PERMISSIVE
    # mode) — drop them instead of emitting ghost revisions; a real dump
    # pipeline counts these via the inverse filter
    parsed = parsed.where(F.col("p").isNotNull() & F.col("p.id").isNotNull())
    return parsed.select(
        F.col("p.id").alias("page_id"),
        F.col("p.title").alias("page_title"),
        F.col("p.ns").alias("page_namespace"),
        F.explode("p.revision").alias("r"),
    ).select(
        "page_id",
        "page_title",
        "page_namespace",
        F.col("r.id").alias("rev_id"),
        F.coalesce(F.col("r.parentid"), F.lit(0)).alias("parent_id"),
        F.to_timestamp(F.col("r.timestamp")).alias("timestamp"),
        F.coalesce(F.col("r.contributor.username"), F.col("r.contributor.ip")).alias(
            "user"
        ),
        F.coalesce(F.col("r.contributor.id"), F.lit(-1)).alias("user_id"),
        F.col("r.comment").alias("comment"),
        F.col("r.text").alias("text"),
    )


def xml_dump_to_json(spark: SparkSession, xml_path: str, out_path: str) -> None:
    """Flatten a revision XML dump to JSON-lines files — the XML2JSON.pig
    utility (one revision per line, reference schema)."""
    read_revision_xml(spark, xml_path).write.mode("overwrite").json(out_path)


def skip_non_articles(revisions: DataFrame) -> DataFrame:
    """The SKIP_NON_ARTICLES / org.hedera.input.onlyarticle switch:
    namespace 0 is the article namespace. Reference:
    io/input/WikiRevisionInputFormat.java, WIKIREVISION.md §1."""
    return revisions.where(F.col("page_namespace") == 0)


def filter_time_span(revisions: DataFrame, begin: str, end: str) -> DataFrame:
    """org.hedera.input.begintime/endtime filtering (ISO strings).
    Reference: WIKIREVISION.md §2, io/etl/IntervalRevisionETLReader.java."""
    return revisions.where(
        (F.col("timestamp") >= F.lit(begin)) & (F.col("timestamp") < F.lit(end))
    )


WARC_HEADER_SCHEMA_FIELDS = {
    "warc_type": r"WARC-Type:\s*(\S+)",
    "warc_target_uri": r"WARC-Target-URI:\s*(\S+)",
    "warc_date": r"WARC-Date:\s*(\S+)",
    "warc_record_id": r"WARC-Record-ID:\s*(\S+)",
    "content_length": r"Content-Length:\s*(\d+)",
}


def read_warc(spark: SparkSession, path: str, exact: bool = False) -> DataFrame:
    """WARC archive → one row per record with parsed headers + payload.

    Default (splittable fast path): record boundary = the 'WARC/' version
    line (lineSep split, so the format stays splittable); headers are
    regexp pulls; the payload is trimmed to Content-Length, the same
    boundary mechanism the reference ClueWeb09WarcLoader uses. Known
    limitation: a payload line that itself begins with 'WARC/' splits
    early — the Content-Length trim bounds the damage to that one record.

    exact=True: the reference's non-splittable sequential mode
    (pig/load/ClueWeb09WarcLoader.java marks the format non-splittable
    for exactly this reason) — one task per file, record boundaries by
    Content-Length BYTE accounting, so 'WARC/' inside a payload can
    never split a record. Arrow escape hatch (stateful byte scanning
    is not expressible relationally); scale = per-file parallelism,
    the same unit the reference's mapper gets."""
    if exact:
        return _read_warc_exact(spark, path)
    recs = (
        spark.read.option("lineSep", "\nWARC/")
        .text(path)
        .where(F.col("value").contains("WARC-Type"))
    )
    cols = [
        F.regexp_extract("value", pat, 1).alias(name)
        for name, pat in WARC_HEADER_SCHEMA_FIELDS.items()
    ]
    # payload = everything after the blank line ending the header block
    payload = F.regexp_extract("value", r"(?s)\r?\n\r?\n(.*)$", 1).alias("raw_payload")
    df = recs.select(*cols, payload).withColumn(
        "content_length", F.col("content_length").cast("long")
    )
    return df.select(
        *WARC_HEADER_SCHEMA_FIELDS.keys(),
        F.when(
            F.col("content_length").isNotNull(),
            F.col("raw_payload").substr(F.lit(1), F.col("content_length")),
        )
        .otherwise(F.col("raw_payload"))
        .alias("payload"),
    )


WARC_EXACT_SCHEMA = (
    "warc_type string, warc_target_uri string, warc_date string, "
    "warc_record_id string, content_length long, payload string"
)


def _read_warc_exact(spark: SparkSession, path: str) -> DataFrame:
    """Sequential per-file WARC scan: consume exactly Content-Length
    payload bytes after each header block, then seek the next 'WARC/'
    version line. Byte-exact against adversarial payloads (fixture: a
    payload line beginning with 'WARC/')."""
    import re
    from collections.abc import Iterator

    import pandas as pd

    header_res = {
        name: re.compile(pat) for name, pat in WARC_HEADER_SCHEMA_FIELDS.items()
    }

    def scan(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        cols = [*WARC_HEADER_SCHEMA_FIELDS.keys(), "payload"]
        for pdf in batches:
            rows: list[tuple] = []
            for content in pdf["content"]:
                data = bytes(content)
                i = 0
                while True:
                    j = data.find(b"WARC/", i)
                    if j < 0:
                        break
                    ends = [
                        (e, 4) for e in [data.find(b"\r\n\r\n", j)] if e >= 0
                    ] + [(e, 2) for e in [data.find(b"\n\n", j)] if e >= 0]
                    if not ends:
                        break
                    he, seplen = min(ends)
                    header = data[j:he].decode("utf-8", errors="replace")
                    fields = {
                        name: (m.group(1) if (m := rex.search(header)) else "")
                        for name, rex in header_res.items()
                    }
                    if fields["content_length"]:
                        n = int(fields["content_length"])
                        payload = data[he + seplen : he + seplen + n]
                        i = he + seplen + n
                    else:
                        # headerless length (warcinfo etc.): next version line
                        nxt = data.find(b"WARC/", he + seplen)
                        payload = data[he + seplen : nxt if nxt >= 0 else len(data)]
                        i = he + seplen + len(payload)
                    if "WARC-Type" in header:
                        rows.append(
                            (
                                fields["warc_type"],
                                fields["warc_target_uri"],
                                fields["warc_date"],
                                fields["warc_record_id"],
                                int(fields["content_length"])
                                if fields["content_length"]
                                else None,
                                payload.decode("utf-8", errors="replace"),
                            )
                        )
            yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(scan, schema=WARC_EXACT_SCHEMA)


def read_filenames(spark: SparkSession, path: str) -> DataFrame:
    """Directory listing as a DataFrame — FileNameLoader parity. Uses the
    binaryFile source's metadata columns (content dropped: column pruning
    means the bytes are never read). Reference: pig/load/FileNameLoader.java."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(path)
        .select("path", "length", "modificationTime")
    )


def read_json_revisions(spark: SparkSession, path: str) -> DataFrame:
    """Processed JSON revision files (the reference's post-XML2JSON world;
    pig scripts load these with elephant-bird JsonLoader)."""
    return spark.read.json(path)


# pagecounts-ez raw dump parsing (mapreduce/PreprocessEZPageviews.java):
# line = "<project> <title> <total> <compactTs>"; compactTs = comma-joined
# day segments "<DayChar><HourChar><count><HourChar><count>...", DayChar
# 'A'..'_' = day 0..30 (consecutive ASCII, so ascii-65 covers the
# reference's A-Z plus [\]^_ special cases in one expression), HourChar
# 'A'..'X' = hour 0..23.
EZ_SKIP_PREFIXES = (
    "Category:", "File:", "Wikipedia:", "User:", "Special:", "Portal:",
    "Talk:", "Help:", "Template:", "Translate:", "http://", "https://",
)
EZ_SKIP_SUFFIXES = (
    ".html", ".jpg", ".txt", ".gif", ".css", ".bmp", ".php", ".svg",
    ".ogg", ".ogv", ".webm",
)


def read_pageviews_ez(
    spark: SparkSession, path: str, project: str = "en.z"
) -> DataFrame:
    """Raw pagecounts-ez dump → (title, day_of_month, hour, views, total)
    rows, the hourly fan-out PreprocessEZPageviews.java's mapper decodes —
    entirely with built-in string/array functions (no Python): project
    filter, the reference's namespace/extension skip heuristics, title
    normalization (anchor/query cut, underscore/quote trim, first-letter
    capitalization), then the compact time-series decode as a double
    explode (day segments, then hour/count pairs)."""
    lines = spark.read.text(path).where(
        F.col("value").startswith(project + " ")
    )
    parts = F.split("value", " ", 4)
    df = lines.select(
        parts.getItem(1).alias("raw_title"),
        parts.getItem(2).cast("long").alias("total"),
        parts.getItem(3).alias("compact_ts"),
    ).where(F.col("compact_ts").isNotNull() & (F.length("raw_title") <= 50))
    for p in EZ_SKIP_PREFIXES:
        df = df.where(~F.col("raw_title").startswith(p))
    for s in EZ_SKIP_SUFFIXES:
        df = df.where(~F.lower(F.col("raw_title")).endswith(s))
    norm = df.withColumn("t", F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("raw_title", r"[#&].*$", ""), r"^[_#]+|_+$", ""
        ),
        r"^'''|'''$|^''|''$|^\"|\"$", "",
    )).where(F.col("t") != "").select(
        F.concat(
            F.upper(F.substring("t", 1, 1)),
            F.substring("t", 2, 1_000_000),
        ).alias("title"),
        "total",
        "compact_ts",
    )
    seg = norm.select(
        "title",
        "total",
        F.explode(F.split("compact_ts", ",")).alias("seg"),
    ).where(F.col("seg") != "")
    pairs = seg.select(
        "title",
        "total",
        (F.ascii(F.substring("seg", 1, 1)) - 65 + 1).alias("day_of_month"),
        F.explode(
            F.expr(r"regexp_extract_all(substring(seg, 2), '([A-X])([0-9]+)', 0)")
        ).alias("hv"),
    )
    return pairs.select(
        "title",
        "day_of_month",
        (F.ascii(F.substring("hv", 1, 1)) - 65).alias("hour"),
        F.expr("CAST(substring(hv, 2) AS BIGINT)").alias("views"),
        "total",
    )


def read_evolved_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet lake whose files span SCHEMA GENERATIONS —
    mergeSchema unions the per-file footers, so files written before a
    column existed surface it as NULL instead of failing the scan.

    The reference's dumps have the same property across MediaWiki export
    versions (WIKIREVISION.md: export-0.x schema drift handled in
    io/input/WikiRevisionInputFormat.java's tolerant parser); a 100 TB
    lake accretes columns the same way, and re-writing history on every
    schema change is not an option. mergeSchema costs one footer read
    per file at planning time — data pages are untouched — and pairs
    with the dynamic-partition-overwrite sinks (streaming/sink.py),
    which never rewrite old generations."""
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


COMMON_LOG_PATTERN = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "([^"]*)" (\S+) (\S+)'
)


def read_common_log(spark: SparkSession, path: str) -> DataFrame:
    """Apache Common Log Format → typed columns, one row per request.

    Reference parity: java/experiments/com/manning/hip/common/
    ApacheCommonLogParser.java + ApacheCommonLogReader.java +
    CommonLogEntry.java (CommonLogInputFormat.java wires them to
    Hadoop). The reference tokenizes with a CSV-style char scanner and
    re-parses the bracketed time with SimpleDateFormat per record;
    Spark-first this is ONE regexp over the text source — splittable
    (newline records), JVM-side, and column-pruned, so a query that
    reads only `status` never materializes the request line.

    Field mapping matches CommonLogEntry: remote_address, remote_logname,
    user_id, time (raw, as the reference keeps it), request_line, status
    code + object size as nullable longs ('-' → NULL, the reference's
    isNull convention), the request line split into method/resource/
    protocol, and epoch — the reference's SimpleDateFormat parse — as
    epoch_ms via to_timestamp on the dd/MMM/yyyy:HH:mm:ss Z layout
    (unparseable time → NULL epoch, same as the swallowed
    ParseException). Bad-line tolerance: a line the pattern cannot
    anchor yields empty group(0) and is dropped, mirroring the reader's
    skip-on-null-entry loop."""
    return parse_common_log(spark.read.text(path))


def parse_common_log(lines: DataFrame) -> DataFrame:
    """The Common Log parse as a pure transform over a `value: string`
    frame — shared verbatim by the batch reader above and the streaming
    tail reader (streaming/logs.stream_common_log), so both sides parse
    identically by construction."""
    lines = lines.where(F.col("value") != "")
    m = F.regexp_extract("value", COMMON_LOG_PATTERN, 0)
    g = lines.where(m != "").select(
        *[
            F.regexp_extract("value", COMMON_LOG_PATTERN, i).alias(c)
            for i, c in enumerate(
                ["remote_address", "remote_logname", "user_id", "time",
                 "request_line", "status_raw", "size_raw"],
                start=1,
            )
        ]
    )
    nullif = lambda c: F.when(F.col(c) != "-", F.col(c))  # noqa: E731
    req = F.split("request_line", " ")
    return g.select(
        nullif("remote_address").alias("remote_address"),
        nullif("remote_logname").alias("remote_logname"),
        nullif("user_id").alias("user_id"),
        "time",
        nullif("request_line").alias("request_line"),
        nullif("status_raw").cast("long").alias("status_code"),
        nullif("size_raw").cast("long").alias("obj_size"),
        F.when(F.size(req) >= 3, req.getItem(0)).alias("method"),
        F.when(F.size(req) >= 3, req.getItem(1)).alias("resource"),
        F.when(F.size(req) >= 3, req.getItem(2)).alias("protocol"),
        (
            # try_: unparseable time → NULL epoch even under ANSI mode,
            # matching the reference's swallowed ParseException (its
            # SimpleDateFormat uses 12-hour 'hh' — a latent bug; Common
            # Log times are 24-hour, so HH here)
            F.unix_timestamp(
                F.expr("try_to_timestamp(time, 'dd/MMM/yyyy:HH:mm:ss Z')")
            ) * 1000
        ).alias("epoch_ms"),
    )
