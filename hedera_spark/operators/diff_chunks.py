"""Chunk-level revision diffs — full parity with the reference's
RevisionDiff model (reference: io/input/WikiRevisionDiffInputFormat.java +
io/RevisionDiff.java, which run java-diff-utils between consecutive
revisions and emit typed chunks INSERT/DELETE/CHANGE with the original and
revised text).

The set-based `rev_diff` operator covers the aggregate view; this one
emits the actual edit script. Sequence alignment (longest-matching-block
diffing) is genuinely not expressible in relational algebra, so this is
the designed use of the Arrow escape hatch: `applyInPandas` over page
groups — each group arrives sorted driver-defined, pairs are formed
in-memory per page, and difflib (same greedy longest-match family as the
reference's diffutils) produces opcodes. Registered rows-only (no SQL
oracle can replicate the alignment), which the driver records as the
weaker check by design.

Scale: one shuffle on page_id; per-group work is O(revisions-per-page x
diff cost) — the same distribution as every other page-window operator,
so skewed mega-pages are the AQE/salting concern, not the operator.
"""

from __future__ import annotations

import difflib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from hedera_spark.sources.tables import load_table

CHUNK_SCHEMA = (
    "page_id string, doc_id long, prev_id long, op string, "
    "a_text string, b_text string"
)


def _diff_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id")
    out: list[tuple] = []
    prev_id, prev_toks = None, None
    for doc_id, text, source in zip(pdf["doc_id"], pdf["text"], pdf["source"]):
        toks = text.split(" ")
        if prev_toks is not None:
            sm = difflib.SequenceMatcher(a=prev_toks, b=toks, autojunk=False)
            for op, i1, i2, j1, j2 in sm.get_opcodes():
                if op == "equal":
                    continue
                out.append(
                    (
                        source,
                        doc_id,
                        prev_id,
                        {"replace": "CHANGE", "delete": "DELETE", "insert": "INSERT"}[op],
                        " ".join(prev_toks[i1:i2]),
                        " ".join(toks[j1:j2]),
                    )
                )
        prev_id, prev_toks = doc_id, toks
    return pd.DataFrame(
        out, columns=["page_id", "doc_id", "prev_id", "op", "a_text", "b_text"]
    )


def rev_diff_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit script between consecutive snapshots of each page:
    (page, rev, prev_rev, INSERT|DELETE|CHANGE, original, revised)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text")
    return docs.groupBy("source").applyInPandas(_diff_group, schema=CHUNK_SCHEMA)
