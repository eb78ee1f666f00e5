"""validate-fields rule engine — the 8 scenarios of the reference's
test/stopfields.spec.js:45-137 re-expressed over array<string> pair
columns (semantics per lib/validate-fields.js:32-94)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.rules import field_rule_reasons


def _reasons(spark, other, preferred, rules, tag="830"):
    df = spark.createDataFrame(
        [(other, preferred)], "o array<string>, p array<string>"
    )
    return df.select(
        field_rule_reasons(tag, F.col("o"), F.col("p"), rules).alias("r")
    ).collect()[0]["r"]


RULES_SUPERSET = ["identical", "preferredIsSuperset"]
RULES_SUPERSET_NE = ["identical", "preferredIsSupersetExceptIfEmpty"]


def test_identical_short_circuits(spark):
    r = _reasons(spark, ["Foo Bar"], ["Foo Bar"], RULES_SUPERSET)
    assert r == []


def test_other_subset_of_preferred_ok(spark):
    # preferred ⊇ other: no reasons (preferred keeps everything)
    r = _reasons(spark, ["a b"], ["a b", "c d"], RULES_SUPERSET)
    assert r == []


def test_preferred_subset_of_other_two_reasons(spark):
    # preferred ⊂ other ⇒ both reasons (validate-fields.js:49,53)
    r = _reasons(spark, ["a b", "c d"], ["a b"], RULES_SUPERSET)
    assert r == [
        "Preferred record has stopfields that are a subset of the other "
        "record in field: 830",
        "Other is not subset: 830",
    ]


def test_normalization_insensitive_containment(spark):
    # containment under the normalizing comparator (record-utils.js:228-234)
    r = _reasons(spark, ["FOO--BAR!"], ["foo bar", "baz"], RULES_SUPERSET)
    assert r == []


def test_except_if_empty_allows_empty_preferred(spark):
    r = _reasons(spark, ["a"], [], RULES_SUPERSET_NE)
    assert r == []


def test_except_if_empty_rejects_nonempty_subset(spark):
    r = _reasons(spark, ["a", "b"], ["a"], RULES_SUPERSET_NE)
    assert r[0] == (
        "Preferred record has stopfields and they are a subset of the "
        "other record in field: 830"
    )


def test_neither_has(spark):
    # reference dispatch: the both-differ fallback (:68-71) and the
    # neitherHas branch (:74-82) are an if/else — both-present-and-differ
    # emits ONLY the fallback reason
    r = _reasons(spark, ["x"], ["y"], ["neitherHas"], tag="027")
    assert r == [
        "Both records have differing stop fields. Automated handling is "
        "not currently possible for: 027",
    ]
    # one side only ⇒ fallback can't fire ⇒ that side's presence reason
    r2 = _reasons(spark, ["x"], [], ["neitherHas"], tag="027")
    assert r2 == [
        "Other record has stop fields. Automated handling is not "
        "currently possible for: 027",
    ]


def test_neither_has_identical_multisets_fire_presence_reasons(spark):
    # identical multisets without the `identical` rule: the fallback's
    # !setsIdentical is false, so control falls to the else branch and
    # BOTH presence reasons fire (validate-fields.js:68-82)
    r = _reasons(spark, ["x"], ["x"], ["neitherHas"], tag="027")
    assert r == [
        "Other record has stop fields. Automated handling is not "
        "currently possible for: 027",
        "Preferred record has stop fields. Automated handling is "
        "not currently possible for: 027",
    ]


def test_other_has_identical_multisets_allowed_without_identical_rule(spark):
    # ["otherHas"] without `identical`: setsIdentical values don't trigger
    # the fallback (its !setsIdentical guard), and otherHas has no branch
    # of its own ⇒ can_merge stays true (validate-fields.js:66-71)
    r = _reasons(spark, ["x"], ["x"], ["otherHas"], tag="880")
    assert r == []


def test_superset_precedence_over_except_if_empty(spark):
    # else-if chain: when both superset rules are configured the
    # unconditional preferredIsSuperset wins (validate-fields.js:47-65),
    # so an empty preferred still yields both reasons
    r = _reasons(
        spark, ["a"], [],
        ["preferredIsSuperset", "preferredIsSupersetExceptIfEmpty"],
    )
    assert r == [
        "Preferred record has stopfields that are a subset of the other "
        "record in field: 830",
        "Other is not subset: 830",
    ]


def test_other_has_quirk_allows_other_only(spark):
    # `otherHas` has no branch in the reference — other-only presence OK
    r = _reasons(spark, ["x"], [], ["identical", "otherHas"], tag="880")
    assert r == []


def test_both_differ_fallback(spark):
    r = _reasons(spark, ["x"], ["y"], ["identical"], tag="240")
    assert r == [
        "Both records have differing stop fields. Automated handling is "
        "not currently possible for: 240"
    ]


def test_multiset_not_set_containment(spark):
    # ["a","a"] is NOT a subset of ["a"] as multisets (isSubset greedy
    # match-and-remove, record-utils.js:260-279)
    r = _reasons(spark, ["a", "a"], ["a"], RULES_SUPERSET)
    assert "Preferred record has stopfields that are a subset" in r[0]
    # and ["a"] ⊆ ["a","a"] holds
    r2 = _reasons(spark, ["a"], ["a", "a"], RULES_SUPERSET)
    assert r2 == []
