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

_EXPLICIT_VOL = re.compile(
    r"(?:^|\D)(\d+)\s*(?:volumes?|vol\.?|nid\.?|v\.)(?:$|[^\w])", re.IGNORECASE
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


def extent_mismatch_reason(a: Column, b: Column) -> Column:
    """Pair predicate for the same300TypeAndCount validator
    (mergeability-validators.js:152-178): both sides inferred structs;
    emits the reference's exact reason strings."""
    both_null = a.isNull() & b.isNull()
    return F.when(
        both_null, F.array(F.lit("Could not infer the meaning of 300a."))
    ).otherwise(
        F.concat(
            F.when(
                a["type"] != b["type"],
                F.array(
                    F.concat(
                        F.lit(
                            "Inferred record types differ (from field 300a): + "
                        ),
                        b["type"],
                        F.lit(" - "),
                        a["type"],
                    )
                ),
            ).otherwise(F.array().cast("array<string>")),
            F.when(
                (a["type"] == b["type"]) & (a["count"] != b["count"]),
                F.array(
                    F.concat(
                        F.lit(
                            "Records have different inferred count of types "
                            "(from field 300a): "
                        ),
                        b["count"].cast("string"),
                        F.lit(" - "),
                        a["count"].cast("string"),
                    )
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
