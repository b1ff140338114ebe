"""Config freeze/merge semantics (reference:
test/selma_sanitizer_config_test.rb; lib/selma/sanitizer/config.rb)."""

from types import MappingProxyType

import pytest

from selma_spark.sanitizer import (
    BASIC,
    DEFAULT,
    RELAXED,
    RESTRICTED,
    deep_merge,
    freeze_config,
)


def _verify_deeply_frozen(v):
    if isinstance(v, MappingProxyType):
        with pytest.raises(TypeError):
            v["__x__"] = 1  # type: ignore[index]
        for x in v.values():
            _verify_deeply_frozen(x)
    elif isinstance(v, dict):
        raise AssertionError(f"mutable dict found: {v!r}")
    elif isinstance(v, list):
        raise AssertionError(f"mutable list found: {v!r}")
    elif isinstance(v, tuple):
        for x in v:
            _verify_deeply_frozen(x)


def test_built_in_configs_deeply_frozen():
    # reference test_built_in_configs_should_be_deeply_frozen
    for cfg in (DEFAULT, BASIC, RELAXED, RESTRICTED):
        _verify_deeply_frozen(cfg)


def test_freeze_config_preserves_values():
    a = {"one": {"one_one": [0, "1", "a"], "one_two": False}}
    b = freeze_config(a)
    assert b["one"]["one_one"] == (0, "1", "a")
    assert b["one"]["one_two"] is False
    _verify_deeply_frozen(b)


def test_deep_merge_nested_override():
    # reference test_should_deeply_merge_a_configuration_hash
    a = freeze_config(
        {"one": {"one_one": [0, "1", "a"], "one_two": False, "one_three": 7}}
    )
    b = freeze_config({"one": {"one_two": True, "one_three": 3}, "two": 2})
    c = deep_merge(a, b)
    assert c != dict(a) and c != dict(b)
    assert c["one"]["one_one"] == (0, "1", "a")
    assert c["one"]["one_two"] is True
    assert c["one"]["one_three"] == 3
    assert c["two"] == 2


def test_deep_merge_non_dict_raises():
    # reference test_should_raise_an_argumenterror_if_either_argument_is_not_a_hash
    with pytest.raises(TypeError):
        deep_merge("foo", {})
    with pytest.raises(TypeError):
        deep_merge({}, "foo")
