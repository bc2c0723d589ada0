"""Config-driven record-compliance evaluator (reference:
fhir_compliance_pack/main.py:44-120).

The reference walks every record in python applying a field-mapping
config: required presence, enum membership, anchored regex, ISO-date
parseability, boolean-like lexical form — a record is valid iff every
applicable check passes; per-record completeness = fraction of mapped
fields present.  Here the whole config compiles into ONE wide Column
expression set — a single scan with partial/final aggregation, no
per-record python.

Semantics kept exactly:
* a mapped field whose source column is absent contributes "not present"
  to every record (reference maps it to None);
* "present" = non-null AND stringified-trim != '' ;
* enum/pattern/date/boolean checks apply ONLY when present (an absent
  optional field never invalidates);
* validity_ratio = valid/total (round 4), score = round 2,
  completeness = mean per-record present-fraction (round 4).

Deviation (documented): the reference's ISO-date test is python
``datetime.fromisoformat``; the JVM path accepts the common ISO forms
via a ``try_to_timestamp`` cascade ('yyyy-MM-dd', 'yyyy-MM-dd HH:mm:ss',
ISO-T variants).  Exotic ISO-8601 inputs (week dates, ordinal dates)
would need the pandas-UDF slow path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from packs_spark.functions.text import is_boolean_like

_ISO_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
]


def _is_iso_date(s: Column) -> Column:
    return F.coalesce(
        *[F.try_to_timestamp(s, F.lit(fmt)) for fmt in _ISO_FORMATS]
    ).isNotNull()


def compliance_summary(
    df: DataFrame,
    field_mappings: dict[str, str],
    required_fields: list[str] | None = None,
    enums: dict[str, list[str]] | None = None,
    patterns: dict[str, str] | None = None,
    date_fields: list[str] | None = None,
    boolean_fields: list[str] | None = None,
) -> DataFrame:
    """One-row summary: (total_records, valid_records, validity_ratio,
    score, completeness)."""
    required = set(required_fields or ())
    enums = enums or {}
    patterns = patterns or {}
    dates = set(date_fields or ())
    bools = set(boolean_fields or ())

    valid = F.lit(True)
    present_count = F.lit(0)
    for field, col in field_mappings.items():
        if col in df.columns:
            s = F.col(col).cast("string")
            present = F.col(col).isNotNull() & (F.trim(s) != "")
        else:
            s = F.lit(None).cast("string")
            present = F.lit(False)
        if field in required:
            valid = valid & present
        if field in enums:
            ok = F.lit(False)
            for v in enums[field]:
                ok = ok | (s == F.lit(v))
            valid = valid & (~present | ok)
        if field in patterns:
            # reference uses re.match: anchored at the start
            rx = patterns[field]
            rx = rx if rx.startswith("^") else "^" + rx
            valid = valid & (~present | s.rlike(rx))
        if field in dates:
            valid = valid & (~present | _is_iso_date(s))
        if field in bools:
            valid = valid & (~present | is_boolean_like(s))
        present_count = present_count + present.cast("int")

    n_fields = max(len(field_mappings), 1)
    total = F.count(F.lit(1))
    n_valid = F.sum(valid.cast("long"))
    # mean per-record completeness = Σ present_count / (n_fields · total):
    # an integer sum divided once — exactly the reference's mean of
    # per-record fractions, but reduction-order independent
    sum_present = F.sum(present_count.cast("long"))
    return df.agg(
        total.alias("total_records"),
        n_valid.alias("valid_records"),
        F.round(n_valid / total, 4).alias("validity_ratio"),
        F.round(n_valid / total, 2).alias("score"),
        F.round(sum_present / (F.lit(n_fields) * total), 4).alias(
            "completeness"
        ),
    )
