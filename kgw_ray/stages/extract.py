"""HTML → text extraction (trafilatura-style main-content extraction).

The flagship analog of the reference's Transform-stage per-record parsers
(e.g. kgw/biomedicine/_hetionet.py:104-130 parse JSON → unified rows): a
stateful actor-pool ``map_batches`` stage that compiles its patterns once per
actor (``__init__``) and processes Arrow batches of raw HTML bytes.

Guarantee (BASELINE.json input_hint): for pages produced by
``kgw_ray.sources.pages.render_html`` the extracted text is byte-identical to
the original document text per url. Boilerplate (<script>, <style>, <nav>,
<aside>, <footer>) is discarded; only ``<div id="main">`` paragraph content
survives.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa


class HtmlExtract:
    """Actor-pool batch fn: pages(html: binary, ...) → +extracted_text.

    Use as ``ds.map_batches(HtmlExtract, batch_format="pyarrow",
    concurrency=N, batch_size=B)`` — regex compilation happens once per
    actor, not once per batch.
    """

    def __init__(self) -> None:
        self._para = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
        self._drop = re.compile(
            rb"<(script|style|nav|aside|footer)\b.*?</\1>", re.DOTALL
        )

    def extract_one(self, html_bytes: bytes) -> str:
        # fast path: locate the main div with C-level find and strip the
        # <p> tags with replace — valid because escaped text can contain no
        # '<' (html.escape rewrites &<>), so the only tag bytes inside the
        # div are the paragraph tags themselves. Joining paragraph contents
        # with no separator == deleting the tags. ~3× over regex findall;
        # byte-identity pinned by the page_text_extraction hash gate.
        i = html_bytes.find(b'<div id="main">')
        j = html_bytes.find(b"</div>", i) if i != -1 else -1
        if j != -1:
            content = html_bytes[i + 15 : j]
            raw = content.replace(b"<p>", b"").replace(b"</p>", b"")
            # residual '<' ⇒ the div held more than adjacent <p> blocks
            # (foreign markup) — same paragraph scan the regex path used
            if b"<" not in raw:
                return _html.unescape(raw.decode("utf-8"))
            frags = self._para.findall(content)
            return _html.unescape(b"".join(frags).decode("utf-8"))
        # fall back (foreign pages, no main div): strip boilerplate tags,
        # keep paragraph content anywhere
        html_bytes = self._drop.sub(b"", html_bytes)
        frags = self._para.findall(html_bytes)
        return _html.unescape(b"".join(frags).decode("utf-8"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Row loop is the MEASURED fast path here: the C-level bytes
        # find/slice in extract_one runs 25k pages in 0.20s where the
        # Arrow-kernel alternative (RE2 lazy-dotall div capture + literal
        # replaces) takes 0.97s — the non-greedy capture dominates. Pinned
        # by test_extract_batch_fastpath_equals_rowpath; don't re-vectorize
        # without beating the row loop on that benchmark.
        texts = [self.extract_one(h) for h in batch.column("html").to_pylist()]
        # drop the raw html immediately: carrying it downstream doubles the
        # bytes through the object store for every later stage (at 10^12
        # docs the raw-bytes column dominates block size)
        return batch.drop_columns(["html"]).append_column(
            "extracted_text", pa.array(texts, pa.string())
        )


_SINGLETON: HtmlExtract | None = None


def extract_batch(batch: pa.Table) -> pa.Table:
    """Task-map variant of ``HtmlExtract``: per-PROCESS singleton state.

    The extract state (three compiled regexes) is microseconds to build, so
    a task map with a lazily built process-wide singleton outperforms an
    actor pool — Ray reuses worker processes, giving actor-like warm state
    without pool-rampup/startup cost, and task scheduling scales elastically
    with the cluster. Reserve actor pools for HEAVY state (EntityLinker's
    KB index, model weights) where per-process duplication matters.
    """
    global _SINGLETON
    if _SINGLETON is None:
        _SINGLETON = HtmlExtract()
    return _SINGLETON(batch)
