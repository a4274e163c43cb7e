"""Unit tests for shared scalar functions (reference golden cases,
tests/test_shared.py:72-84)."""

from kgw_ray.functions.scalars import clean, filter_informative, is_informative_value


def test_is_informative_value():
    for val in [0, 1, -3.14, "a", " ", [], {}, [1], {"a": 1}, False, True]:
        assert is_informative_value(val)
    for val in [None, "", float("nan")]:
        assert not is_informative_value(val)


def test_clean_golden():
    assert clean(1) == "1"
    assert clean(3.14) == "3.14"
    assert clean("a c") == '"a c"'
    assert clean([1, 3.14, "a c"]) == r'"[1,3.14,\"a c\"]"'


def test_filter_informative_preserves_order():
    d = {"b": 1, "a": None, "c": "", "d": "x"}
    assert list(filter_informative(d).items()) == [("b", 1), ("d", "x")]
