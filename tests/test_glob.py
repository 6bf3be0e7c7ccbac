"""Glob→regex compilation (reference: utils/GlobPattern.java via Hadoop's
public GlobPattern) and next-level browse regex
(AbstractElasticIO.java:286-326)."""

import re

from blueflood_spark.functions.glob import anchored, glob_to_regex, next_level_regex


def matches(glob, s):
    return re.fullmatch(glob_to_regex(glob), s) is not None


def test_star():
    assert matches("foo.bar.*", "foo.bar.baz")
    assert matches("foo.bar.*", "foo.bar.baz.qux")  # * crosses levels
    assert not matches("foo.bar.*", "foo.baz")


def test_question_mark():
    assert matches("*.cpu.?ser", "web01.cpu.user")
    assert not matches("*.cpu.?ser", "web01.cpu.uuser")


def test_char_class():
    assert matches("foo.[bc]ar", "foo.bar")
    assert matches("foo.[bc]ar", "foo.car")
    assert not matches("foo.[bc]ar", "foo.dar")
    assert matches("foo.[!b]ar", "foo.car")
    assert not matches("foo.[!b]ar", "foo.bar")


def test_braces():
    assert matches("foo.{bar,baz}.q", "foo.bar.q")
    assert matches("foo.{bar,baz}.q", "foo.baz.q")
    assert not matches("foo.{bar,baz}.q", "foo.qux.q")


def test_regex_chars_escaped():
    assert matches("a.b", "a.b")
    assert not matches("a.b", "aXb")  # '.' is literal
    assert matches("a+b", "a+b")
    assert not matches("a+b", "aab")


def test_unclosed_errors():
    import pytest

    with pytest.raises(ValueError):
        glob_to_regex("foo[bar")
    with pytest.raises(ValueError):
        glob_to_regex("foo{bar")


def test_next_level_regex_doc_example():
    # AbstractElasticIO.java getMetricNames javadoc: metrics foo.bar.xxx and
    # foo.bar.baz.qux with query foo.bar.* → match both; foo.bar.baz.qux.x must not match
    rx = anchored(next_level_regex("foo.bar.*"))
    assert re.fullmatch(rx, "foo.bar.xxx")
    assert re.fullmatch(rx, "foo.bar.baz.qux")
    assert not re.fullmatch(rx, "foo.bar.baz.qux.x")


def test_next_level_regex_prefix_glob():
    # query foo.bar.b* → foo.bar.baz and foo.bar.baz.qux (javadoc example :305-310)
    rx = anchored(next_level_regex("foo.bar.b*"))
    assert re.fullmatch(rx, "foo.bar.baz")
    assert re.fullmatch(rx, "foo.bar.baz.qux")
    assert not re.fullmatch(rx, "foo.bar.xxx")


def test_next_level_single_token():
    # query=* grabs names with exactly two levels
    rx = anchored(next_level_regex("*"))
    assert re.fullmatch(rx, "foo.bar")
    assert not re.fullmatch(rx, "foo")
