"""Single-process reference-style baseline: the same extract→triples→dedup
work as the flagship, run the way the reference engine would (one Python
process, one pass, in-memory dicts — kgw's CreateSqliteFile shape,
SURVEY.md §3 EP2). Gives the 'reference single-node throughput' anchor that
robert-haas/kgw itself never published (BASELINE.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from kgw_ray.sources.pages import render_html
from kgw_ray.stages.extract import HtmlExtract
from kgw_ray.stages.triples import ENTITIES, RELATIONS


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    docs = t.to_pylist()
    hx = HtmlExtract()
    t0 = time.monotonic()
    triples: dict = {}
    for d in docs:
        html = render_html(d["doc_id"], d["source"], d["text"])
        text = hx.extract_one(html)
        toks = text.split(" ")
        for i in range(len(toks) - 2):
            if toks[i] in ENTITIES and toks[i + 1] in RELATIONS and toks[i + 2] in ENTITIES:
                key = (toks[i], toks[i + 1], toks[i + 2])
                if key not in triples:
                    triples[key] = [0, d["doc_id"]]
                triples[key][0] += 1
    sec = time.monotonic() - t0
    print(
        f"single-process: {len(docs)} docs, {len(triples)} distinct triples, "
        f"{sec:.2f}s, {len(docs)/sec:.1f} docs/sec"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
