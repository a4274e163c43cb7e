"""Regression pins for the hash-shuffle join's empty-block failure mode.

Ray 2.49's hash-shuffle join skips empty input blocks when scattering, so
an aggregator partition fed only by skipped blocks never learns that
side's schema and pyarrow raises ``ArrowInvalid ... FieldRef`` at
finalize. Chained joins on sparse keys and empty sides hit this in the
wild; ``large_join`` now compacts materialized sparse inputs and
short-circuits empty sides through the same pyarrow kernel."""

import pyarrow as pa
import ray.data as rd

from kgw_ray.stages.joins import large_join


def _ds(**cols):
    return rd.from_arrow(pa.table(cols))


def _empty(**types):
    return rd.from_arrow(
        pa.table({k: pa.array([], t) for k, t in types.items()})
    ).materialize()


def test_chained_join_sparse_keys(ray_session):
    """Join onto a join output whose blocks are mostly empty (the repro
    that crashed with FieldRef ArrowInvalid before compaction)."""
    pairs = _ds(a=["a", "b"], b=["b", "c"])
    dega = _ds(id=["a", "b", "c"], deg_a=[1, 2, 3])
    degb = _ds(id=["a", "b", "c"], deg_b=[1, 2, 3])
    j = large_join(
        pairs, dega, on=("a",), right_on=("id",), how="inner", num_partitions=4
    ).materialize()
    j2 = large_join(
        j, degb, on=("b",), right_on=("id",), how="inner", num_partitions=4
    )
    rows = sorted(j2.take_all(), key=lambda r: r["a"])
    assert rows == [
        {"a": "a", "b": "b", "deg_a": 1, "deg_b": 2},
        {"a": "b", "b": "c", "deg_a": 2, "deg_b": 3},
    ]


def test_inner_join_empty_left(ray_session):
    left = _empty(b=pa.string(), v=pa.int64())
    right = _ds(b=["a", "b"], w=[1, 2])
    out = large_join(left, right, on=("b",), how="inner")
    assert out.take_all() == []
    assert set(out.schema().names) == {"b", "v", "w"}


def test_inner_join_empty_right(ray_session):
    left = _ds(b=["a", "b"], v=[1, 2])
    right = _empty(b=pa.string(), w=pa.int64())
    out = large_join(left, right, on=("b",), how="inner")
    assert out.take_all() == []
    assert set(out.schema().names) == {"b", "v", "w"}


def test_left_outer_join_empty_right_null_pads(ray_session):
    left = _ds(b=["a", "b"], v=[1, 2])
    right = _empty(b=pa.string(), w=pa.int64())
    rows = sorted(
        large_join(left, right, on=("b",), how="left_outer").take_all(),
        key=lambda r: r["b"],
    )
    assert rows == [
        {"b": "a", "v": 1, "w": None},
        {"b": "b", "v": 2, "w": None},
    ]


def test_semi_anti_empty_sides(ray_session):
    left = _ds(b=["a", "b"], v=[1, 2])
    right = _empty(b=pa.string())
    assert large_join(left, right, on=("b",), how="left_semi").take_all() == []
    anti = large_join(left, right, on=("b",), how="left_anti").take_all()
    assert sorted(r["b"] for r in anti) == ["a", "b"]
    eleft = _empty(b=pa.string(), v=pa.int64())
    full = _ds(b=["a"], w=[9])
    assert large_join(eleft, full, on=("b",), how="left_semi").take_all() == []
    assert large_join(eleft, full, on=("b",), how="left_anti").take_all() == []
