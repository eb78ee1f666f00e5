"""inferTypeAndCount — the reference's physical-extent parser
(lib/record-utils.js:415-478) as a pure function + a vectorized pandas
UDF returning struct<type:string, count:int>.

Semantics preserved from the reference:
  * explicit volume counts: 'N volumes|vol|nid|v.' → ('volume', N)
    (record-utils.js:423-429)
  * page aliases: trailing 'p'/'s'/'pages'/'sivua' tokens rewrite to
    'pages' (record-utils.js:431,450-459 XRegExp unicode-aware)
  * implicit single volume: roman-numeral prefix or '<digits>[,] pages'
    patterns → ('volume', 1) (record-utils.js:420-421,461-475)
  * anything else → None (both-sides-None with differing raw strings ⇒
    'Could not infer' in the validator, mergeability-validators.js:165)
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

# ^-anchored like the reference's VOLUMES regexes (record-utils.js:423-428):
# a roman-numeral preface wins over an embedded volume count, so
# 'XV, 2 vol.' is ('volume', 1) via the preface rule, not ('volume', 2)
_EXPLICIT_VOL = re.compile(
    r"^(\d+)\s*(?:volumes?|vol\.?|nid\.?|v\.)", re.IGNORECASE
)
# trailing page-alias token: '514 s.' / '514 p' / '514 pages' / 'sivua'
_PAGES_ALIAS = re.compile(
    r"(\d+)\s*,?\s*(?:pages?|sivua|s\.?|p\.?)(?:$|[\s:;(\[])", re.IGNORECASE
)
_ROMAN_PREFIX = re.compile(r"^[ivxlcdm]+[\s,.:]", re.IGNORECASE)
_NUM_PAGES = re.compile(r"^(?:\[?\d+\]?,?\s*)+$")


def infer_type_and_count(value: str | None) -> tuple[str, int] | None:
    if value is None:
        return None
    s = value.strip()
    if not s:
        return None
    m = _EXPLICIT_VOL.search(s)
    if m:
        return ("volume", int(m.group(1)))
    # strip trailing punctuation/qualifiers for the implicit patterns
    core = re.sub(r"[\s:;+]+$", "", s)
    if _PAGES_ALIAS.search(core + " "):
        return ("volume", 1)
    if _ROMAN_PREFIX.match(core):
        return ("volume", 1)
    if _NUM_PAGES.match(re.sub(r"(pages?|sivua|s\.?|p\.?)$", "", core).strip()):
        return ("volume", 1)
    return None


_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("count", T.IntegerType(), True),
    ]
)


@F.pandas_udf(_STRUCT)
def infer_type_and_count_udf(values: pd.Series) -> pd.DataFrame:
    parsed = values.map(infer_type_and_count)
    return pd.DataFrame(
        {
            "type": parsed.map(lambda t: t[0] if t else None),
            "count": parsed.map(lambda t: t[1] if t else None).astype("Int32"),
        }
    )


def extent_mismatch_reason(
    a_raw: Column, b_raw: Column, a: Column, b: Column
) -> Column:
    """same300TypeAndCount (mergeability-validators.js:152-178) as an
    array<string> reasons column. a_* = preferred side, b_* = other side;
    a/b are the pre-inferred struct<type,count> columns (null type ⇔
    uninferrable or raw null).

    Reference control flow, preserved exactly:
      * both raw values null → no check at all;
      * raw values equal     → no check;
      * raw differ, BOTH inferences fail → 'Could not infer …';
      * raw differ, exactly one inference fails → allowed (no reason);
      * raw differ, both infer → type mismatch, else count mismatch —
        the reference throws at the first failure, so ONE reason max.
    """
    active = (a_raw.isNotNull() | b_raw.isNotNull()) & ~a_raw.eqNullSafe(b_raw)
    a_ok, b_ok = a["type"].isNotNull(), b["type"].isNotNull()
    reason = (
        F.when(
            ~a_ok & ~b_ok, F.lit("Could not infer the meaning of 300a.")
        )
        .when(
            a_ok & b_ok & (b["type"] != a["type"]),
            F.concat(
                F.lit("Inferred record types differ (from field 300a): + "),
                b["type"],
                F.lit(" - "),
                a["type"],
            ),
        )
        .when(
            a_ok & b_ok & (b["count"] != a["count"]),
            F.concat(
                F.lit(
                    "Records have different inferred count of types "
                    "(from field 300a): "
                ),
                b["count"].cast("string"),
                F.lit(" - "),
                a["count"].cast("string"),
            ),
        )
    )
    return F.when(active & reason.isNotNull(), F.array(reason)).otherwise(
        F.array().cast("array<string>")
    )
