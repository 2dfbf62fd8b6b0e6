"""HTML -> text extraction: the first step of every web-crawl training
pipeline (CommonCrawl WARC -> WET). Pure-stdlib html.parser over
Arrow-batched mapInPandas; the block model is jusText/Readability-
shaped: split the DOM into text blocks at block-level tags, drop
script/style/head subtrees outright, then drop link-dense blocks
(navigation/footer chrome) by a link-density threshold.

At 100 TB this is a narrow map over (doc_id, html) — no shuffle, the
html column never leaves the task, and parquet column pruning keeps
unrelated scans cheap. Reference parity note: dgraph has no HTML
surface; this belongs to the training-data-pipeline extension tier.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EXTRACT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("n_blocks", LongType()),
        StructField("n_links", LongType()),
        StructField("link_density", DoubleType()),
    ]
)

_SKIP_SUBTREES = {"script", "style", "noscript", "template", "head",
                  "svg", "iframe"}
_BLOCK_TAGS = {"p", "div", "section", "article", "li", "br", "h1", "h2",
               "h3", "h4", "h5", "h6", "tr", "td", "th", "blockquote",
               "pre", "nav", "footer", "header", "aside", "ul", "ol",
               "table", "body", "main", "figcaption"}


class _BlockParser(HTMLParser):
    """Collect (text, chars_in_links, n_links) per block."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._links = 0
        self._skip_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        txt = " ".join("".join(self._parts).split())
        if txt or self._links:
            self.blocks.append((txt, self._link_chars, self._links))
        self._parts = []
        self._link_chars = 0
        self._links = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
            self._links += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._anchor_depth:
            self._link_chars += len("".join(data.split()))


def extract_text_py(html_doc: str,
                    max_link_density: float = 0.5) -> tuple[str, int, int,
                                                            float]:
    """(text, n_kept_blocks, n_links_total, doc_link_density). Blocks
    whose in-anchor character share exceeds ``max_link_density`` are
    chrome (nav/footer link lists) and are dropped from the text."""
    p = _BlockParser()
    p.feed(html_doc or "")
    p.close()
    p._flush()
    kept = []
    total_chars = total_link_chars = n_links = 0
    for txt, link_chars, links in p.blocks:
        n_links += links
        chars = len("".join(txt.split()))
        total_chars += chars
        total_link_chars += min(link_chars, chars)
        density = (link_chars / chars) if chars else 1.0
        if txt and density <= max_link_density:
            kept.append(txt)
    doc_density = (total_link_chars / total_chars) if total_chars else 0.0
    return " ".join(kept), len(kept), n_links, doc_density


def html_extract(docs: DataFrame, html_col: str = "html",
                 id_col: str = "doc_id",
                 max_link_density: float = 0.5) -> DataFrame:
    """docs(id, html) -> (doc_id, text, n_blocks, n_links,
    link_density), Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "text": [], "n_blocks": [],
                   "n_links": [], "link_density": []}
            for did, doc in zip(pdf[id_col], pdf[html_col]):
                txt, nb, nl, dens = extract_text_py(doc, max_link_density)
                out["doc_id"].append(did)
                out["text"].append(txt)
                out["n_blocks"].append(nb)
                out["n_links"].append(nl)
                out["link_density"].append(dens)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    from dgraph_spark.operators.dedup import compute_spread

    # compute_spread: stdlib HTML parsing is CPU-bound Python; a
    # one-file page table otherwise parses on a single task (round 10;
    # no-op at crawl scale where WARC inputs are thousands of files)
    return compute_spread(
        docs.select(F.col(id_col).alias(id_col), F.col(html_col))
    ).mapInPandas(run, EXTRACT_SCHEMA)


def html_table_from_docs(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Wrap each document's text in a REAL HTML page with chrome the
    extractor must strip: a <head> with <script>/<style> payloads, a
    link-only <nav> with (id % 5 + 1) anchors, the body text as <p>
    paragraphs of 12 words, and a link-only footer. The extractor's
    output is then closed-form: the text back (whitespace-collapsed,
    chrome dropped), n_links = (id % 5 + 1) + 1."""
    import html as _html

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "html": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                d = int(did)
                words = (text or "").split()
                paras = [" ".join(words[i:i + 12])
                         for i in range(0, len(words), 12)] or [""]
                nav = "".join(f'<li><a href="/s{k}">sec {k}</a></li>'
                              for k in range(d % 5 + 1))
                body = "".join(
                    f"<p>{_html.escape(p)}</p>" for p in paras)
                page = (
                    "<!DOCTYPE html><html><head><title>doc</title>"
                    "<script>var x = '<p>not text</p>';</script>"
                    "<style>p { color: red }</style></head>"
                    f"<body><nav><ul>{nav}</ul></nav>"
                    f"<main>{body}</main>"
                    '<footer><a href="/about">about</a></footer>'
                    "</body></html>")
                out["doc_id"].append(d)
                out["html"].append(page)
            yield pd.DataFrame(out)

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        build, StructType([StructField("doc_id", LongType()),
                           StructField("html", StringType())]))
