"""Config-driven stop-field rule engine (SURVEY.md §2.3.2).

Reimplements the semantics of the reference's validateFields
(lib/validate-fields.js:32-94) as generated Column expression trees over
pair rows. Rule vocabulary and precedence are preserved exactly:

* `identical`  — short-circuit success when the two sides' field
  multisets are exactly equal (validate-fields.js:41-45).
* `preferredIsSuperset` — two independent reasons: preferred's fields are
  a subset of other's (":49"), and other's fields are NOT a subset of
  preferred's (":53") — both under the normalizing comparator.
* `preferredIsSupersetExceptIfEmpty` — same, but only when preferred has
  the field at all (":56-65").
* `neitherHas` — one reason per side that has the field (":74-82").
* `onlyPreferredHas` — reason if other has the field (":84-88").
* `otherHas` — NO dedicated branch in the reference (quirk): it only
  receives the `identical` short-circuit and the both-present-and-differ
  fallback, i.e. other-only presence is allowed (":66-71").
* fallback — both present and different ⇒ "differing stop fields"
  (":68-71"), suppressed when any superset rule is configured.

A "field" here is an array<string> column per side (the web analogue of
a MARC tag's field list: canonical links, meta tags, tracking ids, ...).
Containment is multiset containment under a normalizing comparator —
the reference's isSubset greedy match-and-remove (lib/record-utils.js:
260-279) — implemented sort-array-wise for multiset exactness.

Reason strings reproduce the reference byte-for-byte (golden tests
compare exact messages, test/MergeUtilsMelinda.spec.js:184).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from dedup.normalize import normalize_text


def _norm_sorted(col: Column) -> Column:
    """Normalized multiset fingerprint of an array<string> field."""
    return F.array_sort(F.transform(col, normalize_text))


def _multiset_subset(sub: Column, sup: Column) -> Column:
    """sub ⊆ sup as multisets of normalized values.

    Multiset containment holds iff for every distinct value v,
    count(sub, v) <= count(sup, v). Expressed with higher-order
    functions only (no shuffle, no UDF).
    """
    nsub, nsup = _norm_sorted(sub), _norm_sorted(sup)
    return F.forall(
        F.array_distinct(nsub),
        lambda v: F.size(F.filter(nsub, lambda x: x == v))
        <= F.size(F.filter(nsup, lambda x: x == v)),
    )


def _multisets_identical(a: Column, b: Column) -> Column:
    """Exact multiset equality (un-normalized values, like the reference's
    `identical` check which uses fieldComparator / exact values,
    validate-fields.js:41 via setsIdentical)."""
    return F.array_sort(F.coalesce(a, F.array())) == F.array_sort(
        F.coalesce(b, F.array())
    )


def field_rule_reasons(
    tag: str, other: Column, preferred: Column, rules: list[str]
) -> Column:
    """array<string> of reasons for one configured field, preserving the
    reference's rule precedence. `other`/`preferred` are array<string>
    columns (null ⇒ absent)."""
    o = F.coalesce(other, F.array())
    p = F.coalesce(preferred, F.array())
    o_has, p_has = F.size(o) > 0, F.size(p) > 0
    identical = _multisets_identical(o, p)

    reasons: list[Column] = []

    # The reference's rule dispatch is an else-if chain
    # (validate-fields.js:47-91): preferredIsSuperset wins over
    # preferredIsSupersetExceptIfEmpty, and the fallback branch (both
    # present AND not setsIdentical) is mutually exclusive with
    # neitherHas/onlyPreferredHas, which live in its else.
    if "preferredIsSuperset" in rules:
        p_subset_of_o = _multiset_subset(p, o)
        o_subset_of_p = _multiset_subset(o, p)
        reasons.append(
            F.when(
                p_subset_of_o,
                F.lit(
                    "Preferred record has stopfields that are a subset of the "
                    f"other record in field: {tag}"
                ),
            )
        )
        reasons.append(F.when(~o_subset_of_p, F.lit(f"Other is not subset: {tag}")))
    elif "preferredIsSupersetExceptIfEmpty" in rules:
        p_subset_of_o = _multiset_subset(p, o)
        o_subset_of_p = _multiset_subset(o, p)
        reasons.append(
            F.when(
                p_has & p_subset_of_o,
                F.lit(
                    "Preferred record has stopfields and they are a subset of "
                    f"the other record in field: {tag}"
                ),
            )
        )
        reasons.append(
            F.when(p_has & ~o_subset_of_p, F.lit(f"Other is not subset: {tag}"))
        )
    else:
        # both-present-and-differ fallback (validate-fields.js:68-71);
        # !setsIdentical is part of the condition, and the presence rules
        # fire only when the fallback doesn't (the reference's inner else)
        differing = o_has & p_has & ~identical
        reasons.append(
            F.when(
                differing,
                F.lit(
                    "Both records have differing stop fields. Automated "
                    f"handling is not currently possible for: {tag}"
                ),
            )
        )
        if "neitherHas" in rules:
            reasons.append(
                F.when(
                    ~differing & o_has,
                    F.lit(
                        "Other record has stop fields. Automated handling is not "
                        f"currently possible for: {tag}"
                    ),
                )
            )
            reasons.append(
                F.when(
                    ~differing & p_has,
                    F.lit(
                        "Preferred record has stop fields. Automated handling is "
                        f"not currently possible for: {tag}"
                    ),
                )
            )
        if "onlyPreferredHas" in rules:
            reasons.append(
                F.when(
                    ~differing & o_has,
                    F.lit(
                        "Other record has stop fields. Automated handling is not "
                        f"currently possible for: {tag}"
                    ),
                )
            )

    combined = F.filter(
        F.array(*reasons), lambda r: r.isNotNull()
    ) if reasons else F.array().cast("array<string>")

    # `identical` short-circuits every other rule (validate-fields.js:41-45)
    if "identical" in rules:
        return F.when(identical, F.array().cast("array<string>")).otherwise(combined)
    return combined


def validate_fields_reasons(
    config: dict[str, list[str]],
    other_cols: dict[str, Column],
    preferred_cols: dict[str, Column],
) -> Column:
    """Concatenated reasons across every configured field — the rebuild's
    checkFieldRequirements (mergeability-validators.js:101-107)."""
    parts = [
        field_rule_reasons(tag, other_cols[tag], preferred_cols[tag], rules)
        for tag, rules in sorted(config.items())
    ]
    if not parts:
        return F.array().cast("array<string>")
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out
