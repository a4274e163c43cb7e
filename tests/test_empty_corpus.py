"""Empty-corpus smoke for this round's operators: a filter chain or a
partition can hand any stage zero rows — every query must return a typed
empty (or well-defined) result, never crash."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return str(d)


_OPS = [
    "webkg_wet_line_dedup",
    "text_ttr",
    "dedup_prefix_docs",
    "docs_span_corruption",
    "text_cooccurrence_lift",
    "docs_model_heuristic_confusion",
    "events_hll_registers",
    "events_daily_hll_trailing",
    "users_decayed_engagement",
    "users_activity_bitmap",
    "events_user_active_time",
    "events_hourly_dispersion",
    "events_top3_users_per_type",
    "events_markov_stationary",
    "embeddings_dim_stats",
]


@pytest.mark.parametrize("name", _OPS)
def test_runs_on_empty_corpus(name, empty_sf):
    from kgw_ray.pipelines.registry import QUERIES

    import ray.data as rd

    r = QUERIES[name](empty_sf)
    n = r.count() if isinstance(r, rd.Dataset) else len(r)
    assert n == 0, f"{name} produced rows from an empty corpus"
