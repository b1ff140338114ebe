"""Golden config-matrix corpus (reference:
test/selma_sanitizer_elements_test.rb:82-168 metaprogrammed STRINGS/
PROTOCOLS tests). Byte-identical output is required."""

import pytest

from selma_spark import sanitizer as S
from selma_spark.rewriter import Rewriter

from golden_corpus import CONFIG_NAMES, PROTOCOLS, STRINGS

CONFIGS = {
    "default": S.DEFAULT,
    "restricted": S.RESTRICTED,
    "basic": S.BASIC,
    "relaxed": S.RELAXED,
}


@pytest.mark.parametrize("config", CONFIG_NAMES)
@pytest.mark.parametrize("case", sorted(STRINGS))
def test_strings_golden(case, config):
    data = STRINGS[case]
    got = Rewriter(sanitizer=CONFIGS[config]).rewrite(data["html"])
    assert got == data[config]


@pytest.mark.parametrize("config", CONFIG_NAMES)
@pytest.mark.parametrize("case", sorted(PROTOCOLS))
def test_protocols_golden(case, config):
    data = PROTOCOLS[case]
    got = Rewriter(sanitizer=CONFIGS[config]).rewrite(data["html"])
    assert got == data[config]


def test_default_sanitizer_used_when_kwarg_missing():
    # reference: rewriter.rs:94-103 + test/selma_sanitizer_test.rb:7-12
    assert Rewriter().rewrite(
        "<a href='https://google.com'>here is a neat site!</a>"
    ) == "here is a neat site!"
