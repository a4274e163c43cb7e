from kgw_ray.pipelines.webkg import (  # noqa: F401
    extracted_pages,
    triples_dataset,
    edges_from_triples,
    nodes_from_triples,
    build_webkg,
)
