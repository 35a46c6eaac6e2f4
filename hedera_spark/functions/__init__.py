"""Group E — scalar function parity with Hedera's Pig eval UDFs
(SURVEY.md §2.E). Reference: java/main/org/hedera/pig/eval/
UnixToYYYYMMdd.java, YYYYMMddHHToYYYYMMdd.java, OneDayMore.java,
UnixToElasticTime.java, wikipedia/ExtractTemplate.java,
wikipedia/ExtractDomain.java, wikipedia/CutLast.java.

Each Pig EvalFunc becomes a Column expression factory — composable inside
any DataFrame plan and fully codegen'd (the reference pays a JVM call per
tuple; these are vectorized expressions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unix_to_yyyymmdd(col) -> Column:
    """Unix seconds → 'yyyyMMdd' string. Ref: pig/eval/UnixToYYYYMMdd.java."""
    return F.date_format(F.timestamp_seconds(F.col(col) if isinstance(col, str) else col), "yyyyMMdd")


def ts_to_yyyymmdd(col) -> Column:
    """Timestamp → 'yyyyMMdd' (the YYYYMMddHH→YYYYMMdd truncation).
    Ref: pig/eval/YYYYMMddHHToYYYYMMdd.java."""
    return F.date_format(col, "yyyyMMdd")


def one_day_more(col) -> Column:
    """'yyyyMMdd' of the following day. Ref: pig/eval/OneDayMore.java."""
    return F.date_format(F.date_add(F.to_date(col), 1), "yyyyMMdd")


def unix_to_elastic_time(col) -> Column:
    """ISO-8601 'yyyy-MM-dd'T'HH:mm:ss' (ElasticSearch time format).
    Ref: pig/eval/UnixToElasticTime.java."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")


def extract_prop(col, key: str) -> Column:
    """Typed field out of a JSON payload — the template-parameter
    extraction analog. Ref: pig/eval/wikipedia/ExtractTemplate.java."""
    return F.get_json_object(col, f"$.{key}")


def extract_domain(col) -> Column:
    """Leading alphabetic 'domain' of a structured identifier.
    Ref: pig/eval/wikipedia/ExtractDomain.java."""
    return F.regexp_extract(col, "^([a-zA-Z]+)", 1)


def cut_last(col) -> Column:
    """Drop the final character. Ref: pig/eval/wikipedia/CutLast.java."""
    c = F.col(col) if isinstance(col, str) else col
    return c.substr(F.lit(1), F.length(c) - 1)


def extract_links(col) -> Column:
    """All [[wiki link]] targets (text before any | alias) as an array.
    Ref: io/LinkProfile.java, io/etl/RevisionLinkInputFormat.java,
    mapreduce/Json2Anchor.java (link mining from markup)."""
    return F.expr(
        f"transform(regexp_extract_all({col}, '\\\\[\\\\[([^\\\\]|]+)(?:\\\\|[^\\\\]]*)?\\\\]\\\\]', 1),"
        " x -> trim(x))"
    )


def extract_references(col) -> Column:
    """All <ref>...</ref> payloads as an array.
    Ref: mapreduce/ExtractReferences.java."""
    return F.expr(
        f"regexp_extract_all({col}, '<ref[^>/]*>(.*?)</ref>', 1)"
    )


def strip_markup(col) -> Column:
    """Plain text from MediaWiki markup: drop templates, keep link aliases,
    drop refs/tags/emphasis. A declarative regexp-chain statement of
    util/MediaWikiProcessor.java (which wraps bliki + jsoup); heavy corner
    cases (nested templates) are out of scope exactly as they are flaky in
    the reference."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"\{\{[^{}]*\}\}", " ")  # templates (one level)
    c = F.regexp_replace(c, r"<ref[^>/]*>.*?</ref>", " ")  # references
    c = F.regexp_replace(c, r"<[^>]+>", " ")  # html tags
    c = F.regexp_replace(c, r"\[\[(?:[^\]|]*\|)?([^\]|]*)\]\]", "$1")  # links -> alias
    c = F.regexp_replace(c, r"'{2,}", "")  # bold/italic quotes
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)
