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
    mapreduce/Json2Anchor.java (link mining from markup),
    pignlproc/markup/AnnotatingMarkupParser.java (getWikiLinks).

    Innermost-first: a link nested inside a file caption
    ([[File:x.jpg|thumb|A [[cat]] photo]]) is extracted as 'cat' — the
    outer bracket pair, whose body still contains brackets, never
    matches, which is exactly bliki's behavior (imageNodeToText renders
    the caption children; the image target itself is not a wikilink).
    File:/Image:/Category: targets of simple links are filtered for the
    same reason — the reference collects article anchors, images and
    categories ride separate channels."""
    pat = "\\\\[\\\\[([^\\\\[\\\\]|]+)(?:\\\\|[^\\\\[\\\\]]*)?\\\\]\\\\]"
    # namespace match is case-insensitive, like MediaWiki itself (and like
    # the sibling strip_markup's [Cc]ategory handling) — '[[file:X]]' is an
    # image link, not an article anchor (r5 ADVICE)
    return F.expr(
        f"filter(transform(regexp_extract_all({col}, '{pat}', 1), x -> trim(x)),"
        " x -> NOT (lower(x) LIKE 'file:%' OR lower(x) LIKE 'image:%'"
        " OR lower(x) LIKE 'category:%'))"
    )


def extract_redirect(col) -> Column:
    """Redirect target of a page, or NULL for non-redirects. Matches the
    reference's English pattern '^#REDIRECT [[target]]' exactly
    (pignlproc/markup/AnnotatingMarkupParser.java REDIRECT_PATTERNS,
    'en' entry) — anchored at the start, case as published."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_extract(c, r"^#REDIRECT \[\[([^\]]*)\]\]", 1)
    return F.when(t != "", t)


def title_to_uri(col, language_code: str = "en") -> Column:
    """Wikipedia URI of a page title: spaces to underscores, URL-encoded
    (AnnotatingMarkupParser.titleToUri)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.lit(f"http://{language_code}.wikipedia.org/wiki/"),
        F.url_encode(F.regexp_replace(c, " ", "_")),
    )


def extract_references(col) -> Column:
    """All <ref>...</ref> payloads as an array.
    Ref: mapreduce/ExtractReferences.java."""
    return F.expr(
        f"regexp_extract_all({col}, '<ref[^>/]*>(.*?)</ref>', 1)"
    )


TEMPLATE_DEPTH = 5  # nesting levels unrolled ({{a|{{b|{{c}}}}}} needs 3)
LINK_DEPTH = 3  # link-in-caption nesting levels unrolled


def strip_markup(col) -> Column:
    """Plain text from MediaWiki markup: drop templates (NESTED up to
    TEMPLATE_DEPTH levels, innermost-first), drop wiki tables and
    category links, strip the #REDIRECT directive (the target title
    remains as text, the way a redirect page reads), render links to
    their display text (last |-segment, so [[a|b]] -> b AND a file
    caption [[File:x|thumb|cap]] -> cap, unrolled LINK_DEPTH levels for
    links nested in captions), drop refs/tags/emphasis. A declarative
    regexp-chain statement of util/MediaWikiProcessor.java /
    pignlproc/markup/AnnotatingMarkupParser.java (bliki + jsoup): each
    unrolled level is one more regexp_replace in the SAME codegen'd
    projection — fixed cost, no loop, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"^#REDIRECT ", "")  # redirect directive
    for _ in range(TEMPLATE_DEPTH):  # nested templates, innermost-first
        c = F.regexp_replace(c, r"\{\{[^{}]*\}\}", " ")
    c = F.regexp_replace(c, r"(?s)\{\|.*?\|\}", " ")  # wiki tables
    c = F.regexp_replace(c, r"<ref[^>/]*>.*?</ref>", " ")  # references
    c = F.regexp_replace(c, r"<[^>]+>", " ")  # html tags
    c = F.regexp_replace(c, r"\[\[[Cc]ategory:[^\]]*\]\]", " ")  # categories
    for _ in range(LINK_DEPTH):  # links -> display text, innermost-first
        c = F.regexp_replace(c, r"\[\[(?:[^\[\]|]*\|)*([^\[\]|]*)\]\]", "$1")
    c = F.regexp_replace(c, r"'{2,}", "")  # bold/italic quotes
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)
