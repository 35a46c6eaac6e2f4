"""Unit tests for the scalar function family (Pig eval UDF parity),
especially the markup processors."""

from __future__ import annotations

from pyspark.sql import functions as F

MARKUP = (
    "{{Infobox|name=x}} The '''quick''' [[brown fox|fox]] jumps"
    "<ref name=a>Smith 2001</ref> over [[lazy dog]].<br/>"
)


def test_extract_links(spark):
    from hedera_spark.functions import extract_links

    df = spark.createDataFrame([(MARKUP,)], "text string")
    links = df.select(extract_links("text").alias("l")).first()["l"]
    assert links == ["brown fox", "lazy dog"]


def test_extract_references(spark):
    from hedera_spark.functions import extract_references

    df = spark.createDataFrame([(MARKUP,)], "text string")
    refs = df.select(extract_references("text").alias("r")).first()["r"]
    assert refs == ["Smith 2001"]


def test_strip_markup(spark):
    from hedera_spark.functions import strip_markup

    df = spark.createDataFrame([(MARKUP,)], "text string")
    plain = df.select(strip_markup("text").alias("p")).first()["p"]
    assert plain == "The quick fox jumps over lazy dog."


def test_time_functions(spark):
    from hedera_spark import functions as hf

    df = spark.createDataFrame([(1704067200,)], "unix long")  # 2024-01-01 UTC
    row = df.select(
        hf.unix_to_yyyymmdd("unix").alias("ymd"),
        hf.one_day_more(F.timestamp_seconds(F.col("unix"))).alias("next"),
    ).first()
    assert row["ymd"] == "20240101"
    assert row["next"] == "20240102"


def test_extract_domain_and_cut_last(spark):
    from hedera_spark.functions import cut_last, extract_domain

    df = spark.createDataFrame([("src42",)], "source string")
    row = df.select(
        extract_domain(F.col("source")).alias("d"),
        cut_last("source").alias("c"),
    ).first()
    assert row["d"] == "src"
    assert row["c"] == "src4"


ADVERSARIAL = [
    # nested templates, 3 deep (the {{refn|...{{harvnb|...}}...}} shape
    # from the reference's TestBliki fixture)
    (
        "x {{refn|group=nb|plural is {{unicode|{{big|a}}}}s}} y",
        "x y",
        [],
    ),
    # template containing a template-escaped pipe ({{!}}) inside another
    # template argument
    (
        "{{Two other uses|the letter|the article|English articles{{!}}articles}} A letter.",
        "A letter.",
        [],
    ),
    # file link with caption carrying a nested link: the caption renders,
    # the inner link is the only anchor, the image target is not
    (
        "see [[File:A cursiva.gif|thumb|140px|Different [[glyphs]] here.]] end",
        "see Different glyphs here. end",
        ["glyphs"],
    ),
    # redirect page: directive stripped from text, target is a link,
    # extract_redirect yields the target
    (
        "#REDIRECT [[Latin alpha]]",
        "Latin alpha",
        ["Latin alpha"],
    ),
    # category links vanish entirely; multi-pipe link keeps the LAST
    # segment; table blocks drop
    (
        "[[Category:Vowel letters]] [[English alphabet#Letter names|named]] "
        "{| class=\"wikitable\" |- ! Egyptian |} tail",
        "named tail",
        ["English alphabet#Letter names"],
    ),
    # namespace filter is case-INsensitive (MediaWiki semantics, r5
    # ADVICE): a lowercase file link renders its caption but is not an
    # article anchor
    (
        "a [[file:X.gif|thumb|cap]] b",
        "a cap b",
        [],
    ),
    # lowercase category: strip_markup's [Cc]ategory drop and the anchor
    # filter now agree
    (
        "a [[category:Xyz]] b",
        "a b",
        [],
    ),
    # leading space inside the target: the anchor filter applies AFTER
    # trim, so '[[ Category:Xyz]]' is still no anchor (strip_markup's
    # category regex requires the bracket-adjacent form, so the link
    # renders as text)
    (
        "a [[ Category:Xyz]] b",
        "a Category:Xyz b",
        [],
    ),
]


def test_strip_markup_adversarial_fixtures(spark):
    from hedera_spark.functions import strip_markup

    df = spark.createDataFrame(
        [(i, m) for i, (m, _, _) in enumerate(ADVERSARIAL)], "i long, text string"
    )
    got = {
        r["i"]: r["p"]
        for r in df.select("i", strip_markup("text").alias("p")).collect()
    }
    for i, (_, want_text, _) in enumerate(ADVERSARIAL):
        assert got[i] == want_text, (i, got[i])


def test_extract_links_adversarial_fixtures(spark):
    from hedera_spark.functions import extract_links

    df = spark.createDataFrame(
        [(i, m) for i, (m, _, _) in enumerate(ADVERSARIAL)], "i long, text string"
    )
    got = {
        r["i"]: r["l"]
        for r in df.select("i", extract_links("text").alias("l")).collect()
    }
    for i, (_, _, want_links) in enumerate(ADVERSARIAL):
        assert got[i] == want_links, (i, got[i])


def test_extract_redirect_and_uri(spark):
    from hedera_spark.functions import extract_redirect, title_to_uri

    df = spark.createDataFrame(
        [
            ("#REDIRECT [[Latin alpha]]",),
            ("#REDIRECT [[A (musical note)]]",),
            ("not a redirect [[Latin alpha]]",),
            ("text first #REDIRECT [[X]]",),  # not anchored -> no redirect
        ],
        "text string",
    )
    rows = df.select(
        extract_redirect("text").alias("r"),
        title_to_uri(extract_redirect("text")).alias("uri"),
    ).collect()
    assert [r["r"] for r in rows] == [
        "Latin alpha",
        "A (musical note)",
        None,
        None,
    ]
    assert rows[0]["uri"] == "http://en.wikipedia.org/wiki/Latin_alpha"
    # URL-encoding matches java.net.URLEncoder for spaces/parens
    assert rows[1]["uri"] == "http://en.wikipedia.org/wiki/A_%28musical_note%29"
