"""Expectation-suite evaluation — the engine-native replacement for the
reference's third-party check dispatchers:

* great_expectations_pack/main.py:40-57 — GX ``expect_*`` method dispatch
  from ``pack_conf.json["job"]["expectations"]``; score = passed/total
  (``:58``), each result an envelope ``{expectation, success}``;
* soda_pack/main.py:53-67 + checks.yaml — SodaCL checks
  (``row_count > 0`` style) over the same frame.

Both are config-driven pass/fail rules over one dataset, so they share one
evaluator here.  Design for scale: the WHOLE suite is compiled into a
single ``df.agg(...)`` pass (one scan, partial aggregation per partition,
no shuffles beyond the final merge); schema-level expectations never touch
data at all.

Supported expectation_types (the public GX names the reference dispatches
by ``getattr``):
  table:  expect_table_row_count_to_be_between,
          expect_table_column_count_to_be_between,
          expect_table_columns_to_match_set
  column: expect_column_values_to_not_be_null,
          expect_column_values_to_be_null,
          expect_column_values_to_be_between,
          expect_column_values_to_be_in_set,
          expect_column_values_to_not_be_in_set,
          expect_column_values_to_match_regex,
          expect_column_values_to_not_match_regex,
          expect_column_values_to_match_strftime_format,
          expect_column_values_to_be_unique,
          expect_column_distinct_values_to_be_in_set,
          expect_column_distinct_values_to_equal_set,
          expect_column_distinct_values_to_contain_set,
          expect_column_unique_value_count_to_be_between,
          expect_column_proportion_of_unique_values_to_be_between,
          expect_column_mean_to_be_between,
          expect_column_median_to_be_between,
          expect_column_quantile_values_to_be_between,
          expect_column_min_to_be_between,
          expect_column_max_to_be_between,
          expect_column_sum_to_be_between,
          expect_column_stdev_to_be_between,
          expect_column_value_lengths_to_be_between,
          expect_column_pair_values_a_to_be_greater_than_b,
          expect_column_pair_values_to_be_equal,
          expect_compound_columns_to_be_unique,
          expect_table_row_count_to_equal,
          expect_column_most_common_value_to_be_in_set,
          expect_column_values_to_match_like_pattern,
          expect_column_values_to_not_match_like_pattern,
          expect_column_value_z_scores_to_be_less_than (single-pass via
            extreme-z = max(max-mean, mean-min)/std; mostly=1 only),
          expect_column_values_to_be_of_type,
          expect_column_values_to_be_in_type_list (schema-level, no data
            pass),
          expect_table_column_count_to_equal,
          expect_column_value_lengths_to_equal,
          expect_column_values_to_match_regex_list (match_on any/all),
          expect_column_values_to_not_match_regex_list,
          expect_column_values_to_be_json_parseable,
          expect_column_values_to_be_dateutil_parseable (deterministic
            subset: ISO casts + the reference's sniffable format table),
          expect_multicolumn_sum_to_equal,
          expect_select_column_values_to_be_unique_within_record,
          expect_column_pair_values_to_be_in_set
Row-level expectations honour GX's ``mostly`` (fraction of non-null rows
that must satisfy the predicate; default 1.0).

SodaCL checks are translated to the same internal form by
``parse_sodacl``: ``row_count > 0``, ``missing_count(col) = 0``,
``duplicate_count(col) < N``, ``min/max/avg/sum(col) <op> N``.

dqops-catalog checks (dqops-checks-reference.md) ride the same pass via
the ``dqops:`` prefix — see :func:`compile_dqops`:
  WHITESPACE §18: empty_text / whitespace_text / null_placeholder_text /
                  text_surrounded_by_whitespace, each _found (max_count)
                  and _percent (max_percent) variants
  DATETIME  §9:   date_values_in_future_percent, date_in_range_percent,
                  text_match_date_format_percent
  UNIQUENESS §17: distinct_count, distinct_percent, duplicate_count,
                  duplicate_percent (the static checks; the *_change /
                  *_anomaly variants need a metric history — that lives
                  in events_metric_history_delta / volume_anomaly_events)

**Extension point**: the reference dispatches ANY ``expect_*`` name via
``getattr`` on a GX validator (great_expectations_pack/main.py:45-47);
here each type is a branch in :func:`compile_expectation` producing a
``_Compiled`` (aggregate expressions + a verdict closure).  Adding a GX
type = adding one branch that emits its aggregate columns; it then rides
the same single-pass ``df.agg``.  The catalog above covers every type
the reference's shipped configs exercise plus the common-usage GX
column/table expectations; positional types
(values_to_be_increasing/decreasing) are deliberately absent — GX
defines them over row order, which a distributed frame does not have.
"""

from __future__ import annotations

import operator
import re
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from packs_spark.functions.datesniff import DATE_REGEX_TABLE

_OPS = {
    ">": operator.gt,
    ">=": operator.ge,
    "<": operator.lt,
    "<=": operator.le,
    "=": operator.eq,
    "==": operator.eq,
    "!=": operator.ne,
}


@dataclass
class _Compiled:
    """One expectation compiled to aggregate columns + a driver-side
    verdict over the collected values."""

    label: str
    column: str | None
    aggs: list[Column] = field(default_factory=list)  # named c{i}_{j}
    # verdict(values: list) -> bool, evaluated on the single collected row
    verdict: object = None


def _between(value, lo, hi) -> bool:
    if value is None:
        return False
    return (lo is None or value >= lo) and (hi is None or value <= hi)


def _pct_at_most(mx: float):
    """Verdict over [count, total]: count/total percent <= mx.  An empty
    column passes vacuously (0 violations <= any max)."""
    return lambda v, mx=mx: (v[1] or 0) == 0 or 100.0 * (v[0] or 0) / v[1] <= mx


def _pct_at_least(mn: float):
    """Verdict over [count, total]: count/total percent >= mn.  An empty
    column fails (no evidence the minimum is met)."""
    return lambda v, mn=mn: (v[1] or 0) > 0 and 100.0 * (v[0] or 0) / v[1] >= mn


def _ratio_pred(
    label: str,
    column: str | None,
    pred: Column,
    cond: Column,
    idx: int,
    mostly: float,
) -> _Compiled:
    """ok/n scaffolding shared by the multi-column row expectations:
    n counts rows satisfying ``cond`` (the complement of GX's
    ignore_row_if), ok those also satisfying ``pred``; verdict is
    ok/n >= mostly with a vacuous pass when no row qualifies."""
    ok = F.sum((cond & pred).cast("long")).alias(f"c{idx}_ok")
    n = F.sum(cond.cast("long")).alias(f"c{idx}_n")
    return _Compiled(
        label,
        column,
        [ok, n],
        lambda v, m=mostly: (v[1] or 0) == 0 or (v[0] or 0) / v[1] >= m,
    )


def _mostly_pred(pred: Column, col: Column, idx: int, mostly: float) -> _Compiled:
    """Row-level expectation: fraction of NON-NULL rows satisfying pred
    must be >= mostly (GX ignores nulls for value expectations except
    not_be_null itself)."""
    ok = F.sum((pred & col.isNotNull()).cast("long")).alias(f"c{idx}_ok")
    nn = F.sum(col.isNotNull().cast("long")).alias(f"c{idx}_nn")
    return _Compiled(
        label="",
        column=None,
        aggs=[ok, nn],
        verdict=lambda v, m=mostly: (v[1] or 0) == 0 or (v[0] or 0) / v[1] >= m,
    )


_STRFTIME_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss",
    "%j": "DDD", "%p": "a", "%%": "%",
}


def _strftime_to_java(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%":
            d = fmt[i : i + 2]
            if d not in _STRFTIME_TO_JAVA:
                raise ValueError(
                    f"unsupported strftime directive {d!r} in "
                    f"expect_column_values_to_match_strftime_format "
                    f"format {fmt!r}"
                )
            out.append(_STRFTIME_TO_JAVA[d])
            i += 2
        else:
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            lit = fmt[i:j]
            # quote any literal run containing characters java.time does
            # not treat as plain literals: letters (pattern chars), the
            # quote itself, optional-section brackets [ ], and the
            # reserved # { } — leaving them bare silently changes the
            # pattern ([..] = optional section) or throws at build time
            if any(ch.isalpha() or ch in "'[]#{}" for ch in lit):
                out.append("'" + lit.replace("'", "''") + "'")
            else:
                out.append(lit)
            i = j
    return "".join(out)


_TYPE_ALIASES = {
    "int": {"int", "bigint", "smallint", "tinyint"},
    "int64": {"bigint"},
    "integertype": {"int"},
    "longtype": {"bigint"},
    "float": {"float", "double"},
    "float64": {"double"},
    "doubletype": {"double"},
    "str": {"string"},
    "stringtype": {"string"},
    "object": {"string"},
    "bool": {"boolean"},
    "booleantype": {"boolean"},
}


def _spark_type_matches(have: str, want: str) -> bool:
    """GX type_ name (pandas/GX/Spark spelling) vs a Spark simple dtype."""
    return have == want or have in _TYPE_ALIASES.get(want, set())


def compile_expectation(df: DataFrame, idx: int, exp: dict) -> _Compiled:
    etype = exp["expectation_type"]
    kw = exp.get("kwargs", {})
    col_name = kw.get("column")
    c = F.col(col_name) if col_name else None
    mostly = float(kw.get("mostly", 1.0))

    if etype == "expect_table_row_count_to_be_between":
        lo, hi = kw.get("min_value"), kw.get("max_value")
        out = _Compiled(
            etype,
            None,
            [F.count(F.lit(1)).alias(f"c{idx}_n")],
            lambda v, lo=lo, hi=hi: _between(v[0], lo, hi),
        )
    elif etype == "expect_table_columns_to_match_set":
        want = set(kw.get("column_set", []))
        have = set(df.columns)
        exact = bool(kw.get("exact_match", True))
        success = have == want if exact else want <= have
        out = _Compiled(etype, None, [], lambda v, s=success: s)
    elif etype == "expect_column_values_to_not_be_null":
        ok = F.sum(c.isNotNull().cast("long")).alias(f"c{idx}_ok")
        n = F.count(F.lit(1)).alias(f"c{idx}_n")
        out = _Compiled(
            etype,
            col_name,
            [ok, n],
            lambda v, m=mostly: (v[1] or 0) == 0 or (v[0] or 0) / v[1] >= m,
        )
    elif etype == "expect_column_values_to_be_between":
        lo, hi = kw.get("min_value"), kw.get("max_value")
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (c >= F.lit(lo))
        if hi is not None:
            pred = pred & (c <= F.lit(hi))
        out = _mostly_pred(pred, c, idx, mostly)
    elif etype == "expect_column_values_to_be_in_set":
        vals = list(kw.get("value_set", []))
        # Or-chain, not Column.isin — wide InSet lists JIT pathologically
        pred = F.lit(False)
        for val in vals:
            pred = pred | (c == F.lit(val))
        out = _mostly_pred(pred, c, idx, mostly)
    elif etype == "expect_column_values_to_match_regex":
        out = _mostly_pred(c.cast("string").rlike(kw["regex"]), c, idx, mostly)
    elif etype == "expect_column_values_to_be_unique":
        # unique-fraction = countDistinct-only-once / non-null; exact via
        # two aggregates (count, countDistinct) + a duplicate-aware term is
        # not expressible in one; GX counts rows whose value occurs once.
        # count(*) - count over window is a shuffle; instead:
        #   unique_rows = 2*countDistinct - count_nonnull  is WRONG with
        # multiplicity>2, so use the exact form below (distinct + total +
        # sum of per-value min(cnt-1,1)) via a groupBy subaggregate only
        # when mostly < 1; for the common mostly=1.0 case
        # countDistinct == count_nonnull suffices (no duplicates at all).
        nn = F.count(c).alias(f"c{idx}_nn")
        nd = F.countDistinct(c).alias(f"c{idx}_nd")
        if mostly >= 1.0:
            out = _Compiled(
                etype,
                col_name,
                [nn, nd],
                lambda v: (v[0] or 0) == (v[1] or 0),
            )
        else:
            raise NotImplementedError(
                "expect_column_values_to_be_unique with mostly<1 needs the "
                "groupBy path; use duplicates operators instead"
            )
    elif etype in (
        "expect_column_mean_to_be_between",
        "expect_column_min_to_be_between",
        "expect_column_max_to_be_between",
        "expect_column_sum_to_be_between",
        "expect_column_stdev_to_be_between",
    ):
        fn = {
            "mean": F.avg,
            "min": F.min,
            "max": F.max,
            "sum": F.sum,
            "stdev": F.stddev_samp,  # GX stdev = sample stddev
        }[etype.split("_")[2]]
        lo, hi = kw.get("min_value"), kw.get("max_value")
        out = _Compiled(
            etype,
            col_name,
            [fn(c).alias(f"c{idx}_v")],
            lambda v, lo=lo, hi=hi: _between(v[0], lo, hi),
        )
    elif etype == "expect_column_value_lengths_to_be_between":
        lo, hi = kw.get("min_value"), kw.get("max_value")
        ln = F.length(c.cast("string"))
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (ln >= F.lit(lo))
        if hi is not None:
            pred = pred & (ln <= F.lit(hi))
        out = _mostly_pred(pred, c, idx, mostly)
    elif etype == "expect_column_values_to_be_null":
        ok = F.sum(c.isNull().cast("long")).alias(f"c{idx}_ok")
        n = F.count(F.lit(1)).alias(f"c{idx}_n")
        out = _Compiled(
            etype,
            col_name,
            [ok, n],
            lambda v, m=mostly: (v[1] or 0) == 0 or (v[0] or 0) / v[1] >= m,
        )
    elif etype == "expect_column_values_to_not_match_regex":
        out = _mostly_pred(
            ~c.cast("string").rlike(kw["regex"]), c, idx, mostly
        )
    elif etype == "expect_column_values_to_not_be_in_set":
        pred = F.lit(True)
        for val in list(kw.get("value_set", [])):
            pred = pred & (c != F.lit(val))
        out = _mostly_pred(pred, c, idx, mostly)
    elif etype == "expect_column_values_to_match_strftime_format":
        # GX takes a C strftime format; translate it onto Spark's
        # java.time pattern and validate via try_to_timestamp (NULL on
        # mismatch).  Literal runs containing letters are quoted (an
        # unquoted 'T' is an unknown java.time pattern letter) and an
        # untranslatable directive raises instead of silently producing
        # a pattern that fails every row.
        out = _mostly_pred(
            F.try_to_timestamp(
                c.cast("string"), F.lit(_strftime_to_java(kw["strftime_format"]))
            ).isNotNull(),
            c, idx, mostly,
        )
    elif etype == "expect_column_distinct_values_to_be_in_set":
        # every distinct value ∈ set ⇔ no value outside the set
        pred = F.lit(False)
        for val in list(kw.get("value_set", [])):
            pred = pred | (c == F.lit(val))
        bad = F.sum((c.isNotNull() & ~pred).cast("long")).alias(f"c{idx}_bad")
        out = _Compiled(etype, col_name, [bad], lambda v: (v[0] or 0) == 0)
    elif etype in (
        "expect_column_distinct_values_to_equal_set",
        "expect_column_distinct_values_to_contain_set",
    ):
        want = set(kw.get("value_set", []))
        eq = etype.endswith("equal_set")
        out = _Compiled(
            etype,
            col_name,
            [F.collect_set(c).alias(f"c{idx}_s")],
            lambda v, w=want, e=eq: (
                set(v[0] or []) == w if e else w <= set(v[0] or [])
            ),
        )
    elif etype == "expect_column_unique_value_count_to_be_between":
        lo, hi = kw.get("min_value"), kw.get("max_value")
        out = _Compiled(
            etype,
            col_name,
            [F.countDistinct(c).alias(f"c{idx}_nd")],
            lambda v, lo=lo, hi=hi: _between(v[0], lo, hi),
        )
    elif etype == "expect_column_proportion_of_unique_values_to_be_between":
        lo, hi = kw.get("min_value"), kw.get("max_value")
        out = _Compiled(
            etype,
            col_name,
            [F.countDistinct(c).alias(f"c{idx}_nd"),
             F.count(c).alias(f"c{idx}_nn")],
            lambda v, lo=lo, hi=hi: _between(
                (v[0] or 0) / v[1] if v[1] else None, lo, hi
            ),
        )
    elif etype == "expect_column_median_to_be_between":
        lo, hi = kw.get("min_value"), kw.get("max_value")
        out = _Compiled(
            etype,
            col_name,
            [F.expr(f"percentile({col_name}, 0.5)").alias(f"c{idx}_med")],
            lambda v, lo=lo, hi=hi: _between(v[0], lo, hi),
        )
    elif etype == "expect_column_quantile_values_to_be_between":
        qr = kw["quantile_ranges"]
        probs, ranges = qr["quantiles"], qr["value_ranges"]
        arr = ", ".join(str(p) for p in probs)
        out = _Compiled(
            etype,
            col_name,
            [F.expr(f"percentile({col_name}, array({arr}))").alias(
                f"c{idx}_qs"
            )],
            lambda v, rs=ranges: v[0] is not None
            and all(_between(q, lo, hi) for q, (lo, hi) in zip(v[0], rs)),
        )
    elif etype == "expect_column_pair_values_a_to_be_greater_than_b":
        a, b = F.col(kw["column_A"]), F.col(kw["column_B"])
        pred = a >= b if kw.get("or_equal") else a > b
        # GX pair default ignore_row_if="both_values_are_missing": a
        # half-null pair IS evaluated (and can never satisfy pred)
        any_nn = a.isNotNull() | b.isNotNull()
        out = _ratio_pred(
            etype, f"{kw['column_A']}~{kw['column_B']}",
            a.isNotNull() & b.isNotNull() & pred, any_nn, idx, mostly,
        )
    elif etype == "expect_compound_columns_to_be_unique":
        cols = [F.col(x) for x in kw["column_list"]]
        nn = F.count(F.lit(1)).alias(f"c{idx}_n")
        nd = F.countDistinct(F.struct(*cols)).alias(f"c{idx}_nd")
        out = _Compiled(
            etype,
            ",".join(kw["column_list"]),
            [nn, nd],
            lambda v: (v[0] or 0) == (v[1] or 0),
        )
    elif etype == "expect_table_column_count_to_be_between":
        lo, hi = kw.get("min_value"), kw.get("max_value")
        n_cols = len(df.columns)
        out = _Compiled(
            etype, None, [], lambda v, s=_between(n_cols, lo, hi): s
        )
    elif etype == "expect_table_row_count_to_equal":
        want = kw["value"]
        out = _Compiled(
            etype,
            None,
            [F.count(F.lit(1)).alias(f"c{idx}_n")],
            lambda v, w=want: (v[0] or 0) == w,
        )
    elif etype == "expect_column_most_common_value_to_be_in_set":
        # Spark's mode() picks one value on ties (as does the GX pandas
        # backend's head-of-modes when ties_okay is unset); callers who
        # care about ties should pass a value_set covering the tie group.
        # An empty / all-NULL column has no mode (mode() → NULL) and
        # FAILS: GX raises on no data, this engine's convention is a
        # contained failed row instead of an aborted suite
        want = set(kw.get("value_set", []))
        out = _Compiled(
            etype,
            col_name,
            [F.mode(c).alias(f"c{idx}_m")],
            lambda v, w=want: v[0] in w,
        )
    elif etype == "expect_column_pair_values_to_be_equal":
        a, b = F.col(kw["column_A"]), F.col(kw["column_B"])
        # ignore_row_if="both_values_are_missing" (GX pair default):
        # (x, NULL) is evaluated and counts unexpected
        out = _ratio_pred(
            etype, f"{kw['column_A']}~{kw['column_B']}",
            a.isNotNull() & b.isNotNull() & (a == b),
            a.isNotNull() | b.isNotNull(), idx, mostly,
        )
    elif etype == "expect_column_values_to_match_like_pattern":
        out = _mostly_pred(
            c.cast("string").like(kw["like_pattern"]), c, idx, mostly
        )
    elif etype == "expect_column_values_to_not_match_like_pattern":
        out = _mostly_pred(
            ~c.cast("string").like(kw["like_pattern"]), c, idx, mostly
        )
    elif etype == "expect_column_values_to_be_in_type_list":
        have = dict(df.dtypes).get(col_name, "")
        ok_any = any(
            _spark_type_matches(have, str(t).lower())
            for t in kw.get("type_list", [])
        )
        out = _Compiled(etype, col_name, [], lambda v, s=ok_any: s)
    elif etype == "expect_column_value_z_scores_to_be_less_than":
        # single-pass formulation: with mostly=1 the extreme z-score is
        # max(max-mean, mean-min)/std (double-sided) or (max-mean)/std,
        # so min/max/avg/stddev aggregates suffice — no second scan.
        # mostly<1 would need per-row z-scores (two passes); contained.
        if mostly < 1.0:
            raise NotImplementedError(
                "expect_column_value_z_scores_to_be_less_than with "
                "mostly<1 needs a second pass; unsupported"
            )
        thr = float(kw["threshold"])
        double = bool(kw.get("double_sided", True))
        aggs = [
            F.min(c).alias(f"c{idx}_mn"),
            F.max(c).alias(f"c{idx}_mx"),
            F.avg(c).alias(f"c{idx}_av"),
            F.stddev_samp(c).alias(f"c{idx}_sd"),
        ]

        def _z_verdict(v, thr=thr, double=double):
            mn, mx, av, sd = v
            if mn is None or sd is None:
                return True  # empty or single-row column: no z outliers
            if sd == 0:
                return True
            z = (mx - av) / sd
            if double:
                z = max(z, (av - mn) / sd)
            return z < thr

        out = _Compiled(etype, col_name, aggs, _z_verdict)
    elif etype == "expect_column_values_to_be_of_type":
        # schema-level: no data pass (GX type_ names map onto Spark's)
        want = str(kw.get("type_", "")).lower()
        have = dict(df.dtypes).get(col_name, "")
        ok = _spark_type_matches(have, want)
        out = _Compiled(etype, col_name, [], lambda v, s=ok: s)
    elif etype == "expect_table_column_count_to_equal":
        want = int(kw["value"])
        out = _Compiled(
            etype, None, [], lambda v, s=(len(df.columns) == want): s
        )
    elif etype == "expect_column_value_lengths_to_equal":
        want = int(kw["value"])
        out = _mostly_pred(
            F.length(c.cast("string")) == F.lit(want), c, idx, mostly
        )
    elif etype == "expect_column_values_to_match_regex_list":
        pats = list(kw["regex_list"])
        match_on = str(kw.get("match_on", "any")).lower()
        s = c.cast("string")
        pred = F.lit(match_on == "all")
        for p in pats:
            pred = (
                (pred & s.rlike(p)) if match_on == "all" else (pred | s.rlike(p))
            )
        out = _mostly_pred(pred, c, idx, mostly)
    elif etype == "expect_column_values_to_not_match_regex_list":
        s = c.cast("string")
        pred = F.lit(True)
        for p in kw["regex_list"]:
            pred = pred & ~s.rlike(p)
        out = _mostly_pred(pred, c, idx, mostly)
    elif etype == "expect_column_values_to_be_json_parseable":
        # get_json_object('$') echoes the document iff it parses as JSON —
        # a JVM-side parseability probe with no UDF and no schema binding
        out = _mostly_pred(
            F.get_json_object(c.cast("string"), "$").isNotNull(),
            c, idx, mostly,
        )
    elif etype == "expect_column_values_to_be_dateutil_parseable":
        # engine twin of dateutil.parse: a plain timestamp/date cast
        # (ISO shapes) coalesced with the reference's sniffable format
        # table (timeliness_pack/main.py:26-61 — the same cascade as the
        # F9 mixed-format path).  Laxer dateutil inputs ("Jan 3 2020")
        # are not claimed; this is the documented, deterministic subset
        s = c.cast("string")
        # try_cast, not cast: ANSI mode throws on malformed datetime input
        parsed = F.coalesce(
            s.try_cast("timestamp"),
            s.try_cast("date").cast("timestamp"),
            *[F.try_to_timestamp(s, F.lit(fmt))
              for _, fmt in DATE_REGEX_TABLE],
        )
        out = _mostly_pred(parsed.isNotNull(), c, idx, mostly)
    elif etype == "expect_multicolumn_sum_to_equal":
        cols = [F.col(x) for x in kw["column_list"]]
        want = kw["sum_total"]
        # ignore_row_if="all_values_are_missing" (GX default): a
        # partially-null row IS evaluated, with the GX pandas backend's
        # NaN-skipping sum — (4, NULL) sums to 4
        any_nn = F.lit(False)
        total = F.lit(0)
        for x in cols:
            any_nn = any_nn | x.isNotNull()
            total = total + F.coalesce(x, F.lit(0))
        out = _ratio_pred(
            etype, ",".join(kw["column_list"]),
            total == F.lit(want), any_nn, idx, mostly,
        )
    elif etype == "expect_select_column_values_to_be_unique_within_record":
        # per-row distinctness of the selected columns; rows where every
        # selected value is NULL are ignored (GX ignore_row_if default
        # "all_values_are_missing").  array_distinct collapses duplicate
        # NULLs, so a row with two NULLs and a value counts as having a
        # duplicate — matching GX's pandas NaN behavior
        cols = [F.col(x) for x in kw["column_list"]]
        arr = F.array(*cols)
        any_nn = F.lit(False)
        for x in cols:
            any_nn = any_nn | x.isNotNull()
        distinct_ok = F.size(F.array_distinct(arr)) == len(cols)
        out = _ratio_pred(
            etype, ",".join(kw["column_list"]), distinct_ok, any_nn,
            idx, mostly,
        )
    elif etype == "expect_column_pair_values_to_be_in_set":
        a, b = F.col(kw["column_A"]), F.col(kw["column_B"])
        # Or-chain over the pair set (same InSet-JIT rationale as
        # values_to_be_in_set); ignore_row_if="both_values_are_missing"
        # — a half-null pair is evaluated and can never be in the set
        pred = F.lit(False)
        for pa, pb in kw["value_pairs_set"]:
            pred = pred | ((a == F.lit(pa)) & (b == F.lit(pb)))
        out = _ratio_pred(
            etype, f"{kw['column_A']}~{kw['column_B']}",
            a.isNotNull() & b.isNotNull() & pred,
            a.isNotNull() | b.isNotNull(), idx, mostly,
        )
    else:
        # reference behavior: silently skip unknown expectations
        # (great_expectations_pack/main.py:45-46 `if not hasattr: continue`)
        out = _Compiled(etype, col_name, [], None)
    out.label = etype
    # pair/compound branches set a composite column label in the
    # constructor; only fill in the plain kwargs column when unset
    if out.column is None:
        out.column = col_name
    return out


_SODA_AGG = re.compile(
    r"^\s*(row_count|missing_count|duplicate_count|min|max|avg|sum)"
    r"(?:\(\s*([A-Za-z0-9_]+)\s*\))?\s*(>=|<=|!=|==|=|>|<)\s*(-?[\d.]+)\s*$"
)


def parse_sodacl(check: str) -> dict:
    """Translate a SodaCL-style scalar check ("row_count > 0",
    "duplicate_count(col) = 0") into the internal expectation form."""
    m = _SODA_AGG.match(check)
    if not m:
        raise ValueError(f"unsupported SodaCL check: {check!r}")
    metric, col, op, rhs = m.groups()
    return {
        "expectation_type": f"soda:{metric}",
        "kwargs": {"column": col, "op": op, "value": float(rhs)},
        "_raw": check,
    }


def compile_soda(df: DataFrame, idx: int, exp: dict) -> _Compiled:
    kw = exp["kwargs"]
    metric = exp["expectation_type"].split(":", 1)[1]
    col, op, rhs = kw.get("column"), _OPS[kw["op"]], kw["value"]
    c = F.col(col) if col else None
    if metric == "row_count":
        aggs = [F.count(F.lit(1)).alias(f"c{idx}_v")]
        verdict = lambda v: op(v[0] or 0, rhs)  # noqa: E731
    elif metric == "missing_count":
        aggs = [F.sum(c.isNull().cast("long")).alias(f"c{idx}_v")]
        verdict = lambda v: op(v[0] or 0, rhs)  # noqa: E731
    elif metric == "duplicate_count":
        # Σ max(cnt-1, 0) without a groupBy = count_nonnull - countDistinct
        aggs = [
            F.count(c).alias(f"c{idx}_nn"),
            F.countDistinct(c).alias(f"c{idx}_nd"),
        ]
        verdict = lambda v: op((v[0] or 0) - (v[1] or 0), rhs)  # noqa: E731
    else:
        fn = {"min": F.min, "max": F.max, "avg": F.avg, "sum": F.sum}[metric]
        aggs = [fn(c).alias(f"c{idx}_v")]
        verdict = lambda v: v[0] is not None and op(v[0], rhs)  # noqa: E731
    return _Compiled(exp.get("_raw", metric), col, aggs, verdict)


def compile_dqops(df: DataFrame, idx: int, exp: dict) -> _Compiled:
    """dqops-catalog checks (dqops-checks-reference.md — WHITESPACE §18,
    DATETIME §9, UNIQUENESS §17) compiled onto the same single-pass agg.

    Check names use the ``dqops:`` prefix (``dqops:empty_text_found``).
    Percent checks follow the dqops 0–100 scale; denominators are NON-NULL
    row counts (the text_validation pack's convention — NULLs are counted
    by the NULLS family, not double-counted here).  An empty column passes
    max-bounded checks (0 ≤ max) and fails min-bounded ones.

    ``date_values_in_future_percent`` accepts an optional ``now`` kwarg
    (ISO timestamp) so tests and cross-engine oracles stay deterministic;
    production callers omit it and get ``current_timestamp()``.
    """
    from packs_spark.functions import text as TX

    kw = exp.get("kwargs", {})
    check = exp["expectation_type"].split(":", 1)[1]
    col_name = kw.get("column")
    # every dqops check here is column-level; without this, a missing
    # column would either silently PASS (text predicates against a None
    # operand are NULL for every row) or raise a PySpark error class the
    # suite containment doesn't catch
    if not col_name:
        raise ValueError(f"dqops check {check!r} requires a 'column' kwarg")
    c = F.col(col_name)
    label = exp["expectation_type"]

    _TEXT_PREDS = {
        "empty_text": TX.is_empty,
        "whitespace_text": TX.is_whitespace_only,
        "null_placeholder_text": TX.is_null_placeholder,
        "text_surrounded_by_whitespace": TX.is_surrounded_by_whitespace,
    }
    for base, predf in _TEXT_PREDS.items():
        if check == f"{base}_found":
            mx = kw.get("max_count", 0)
            return _Compiled(
                label, col_name,
                [TX.count_if(predf(c)).alias(f"c{idx}_v")],
                lambda v, mx=mx: (v[0] or 0) <= mx,
            )
        if check == f"{base}_percent":
            mx = float(kw.get("max_percent", 0.0))
            return _Compiled(
                label, col_name,
                [TX.count_if(predf(c)).alias(f"c{idx}_v"),
                 F.count(c).alias(f"c{idx}_nn")],
                _pct_at_most(mx),
            )

    if check == "date_values_in_future_percent":
        if "now" in kw:
            # validate eagerly: an unparseable 'now' must surface as a
            # failed row (via the suite containment), not compile to
            # cast(NULL) whose `ts > NULL` predicate silently passes
            # every dataset (non-ANSI) or throws at runtime (ANSI)
            datetime.fromisoformat(str(kw["now"]))
            now = F.lit(kw["now"]).cast("timestamp")
        else:
            now = F.current_timestamp()
        ts = c.cast("timestamp")
        mx = float(kw.get("max_percent", 0.0))
        return _Compiled(
            label, col_name,
            [TX.count_if(ts > now).alias(f"c{idx}_v"),
             F.count(ts).alias(f"c{idx}_nn")],
            _pct_at_most(mx),
        )
    if check == "date_in_range_percent":
        d = c.cast("date")
        lo = F.lit(kw["min_date"]).cast("date")
        hi = F.lit(kw["max_date"]).cast("date")
        mn = float(kw.get("min_percent", 100.0))
        return _Compiled(
            label, col_name,
            [TX.count_if((d >= lo) & (d <= hi)).alias(f"c{idx}_v"),
             F.count(d).alias(f"c{idx}_nn")],
            _pct_at_least(mn),
        )
    if check == "text_match_date_format_percent":
        fmt = _strftime_to_java(kw["date_format"])
        ok = F.try_to_timestamp(c.cast("string"), F.lit(fmt)).isNotNull()
        mn = float(kw.get("min_percent", 100.0))
        return _Compiled(
            label, col_name,
            [TX.count_if(c.isNotNull() & ok).alias(f"c{idx}_v"),
             F.count(c).alias(f"c{idx}_nn")],
            _pct_at_least(mn),
        )

    if check == "distinct_count":
        lo, hi = kw.get("min_value"), kw.get("max_value")
        return _Compiled(
            label, col_name,
            [F.countDistinct(c).alias(f"c{idx}_nd")],
            lambda v, lo=lo, hi=hi: _between(v[0] or 0, lo, hi),
        )
    if check == "distinct_percent":
        lo = kw.get("min_percent")
        hi = kw.get("max_percent")
        return _Compiled(
            label, col_name,
            [F.countDistinct(c).alias(f"c{idx}_nd"),
             F.count(c).alias(f"c{idx}_nn")],
            lambda v, lo=lo, hi=hi: (v[1] or 0) > 0
            and _between(100.0 * (v[0] or 0) / v[1], lo, hi),
        )
    if check == "duplicate_count":
        mx = kw.get("max_count", 0)
        return _Compiled(
            label, col_name,
            [F.count(c).alias(f"c{idx}_nn"),
             F.countDistinct(c).alias(f"c{idx}_nd")],
            lambda v, mx=mx: (v[0] or 0) - (v[1] or 0) <= mx,
        )
    if check == "duplicate_percent":
        mx = float(kw.get("max_percent", 0.0))
        return _Compiled(
            label, col_name,
            [F.count(c).alias(f"c{idx}_nn"),
             F.countDistinct(c).alias(f"c{idx}_nd")],
            lambda v, mx=mx: (v[0] or 0) == 0
            or 100.0 * ((v[0] or 0) - (v[1] or 0)) / v[0] <= mx,
        )
    raise ValueError(f"unsupported dqops check: {check!r}")


def evaluate_suite(df: DataFrame, expectations: list[dict]) -> list[dict]:
    """Evaluate the whole suite in ONE aggregation pass.  Returns
    [{expectation, column, success}] in suite order (skipped/unknown
    expectations omitted, matching the reference's `continue`)."""
    compiled: list[_Compiled] = []
    for i, exp in enumerate(expectations):
        try:
            etype = exp["expectation_type"]
            if etype.startswith("soda:"):
                compiled.append(compile_soda(df, i, exp))
            elif etype.startswith("dqops:"):
                compiled.append(compile_dqops(df, i, exp))
            else:
                compiled.append(compile_expectation(df, i, exp))
        except (ValueError, KeyError, NotImplementedError, TypeError,
                AttributeError):
            # one uncompilable expectation (an unmapped strftime directive
            # like %f, an unsupported SodaCL check, a malformed kwargs
            # dict, a non-numeric threshold → TypeError, a non-dict
            # expectation entry → AttributeError) must not abort the whole
            # suite run — record it as failed and keep evaluating the rest
            # (the reference's dispatch likewise skips what it can't
            # handle).  .get here: the missing key may BE expectation_type
            # itself, and the fallback must not re-raise from inside the
            # containment
            get = exp.get if isinstance(exp, dict) else (lambda *_: None)
            kwargs = get("kwargs")
            compiled.append(
                _Compiled(
                    str(get("expectation_type") or "<missing type>"),
                    kwargs.get("column") if isinstance(kwargs, dict) else None,
                    [],
                    lambda v: False,
                )
            )

    all_aggs = [a for comp in compiled for a in comp.aggs]
    try:
        row = df.agg(*all_aggs).collect()[0] if all_aggs else None
        values = []
        pos = 0
        for comp in compiled:
            values.append([row[pos + j] for j in range(len(comp.aggs))])
            pos += len(comp.aggs)
    except AnalysisException:
        # one expression that compiled but fails analysis (e.g. a
        # value_set entry whose literal type mismatches the column:
        # `cat = array('a')`) must not kill the fused single-pass agg —
        # fall back to per-expectation aggregation so only the offending
        # expectation fails.  Error path only: the fused plan stays the
        # fast path
        values = []
        for comp in compiled:
            try:
                r = df.agg(*comp.aggs).collect()[0] if comp.aggs else None
                values.append([r[j] for j in range(len(comp.aggs))])
            except AnalysisException:
                values.append(None)

    results = []
    for comp, vals in zip(compiled, values):
        if comp.verdict is None:
            continue  # unknown expectation — reference skips it
        if vals is None:
            success = False  # this expectation's own aggs failed analysis
        else:
            try:
                success = bool(comp.verdict(vals))
            except (TypeError, ValueError, ZeroDivisionError, KeyError):
                # verdict-time errors (e.g. a string min_value compared
                # to a numeric aggregate) are contained per-expectation,
                # same as compile-time ones — one bad bound must not kill
                # the suite
                success = False
        results.append(
            {
                "expectation": comp.label,
                "column": comp.column,
                "success": success,
            }
        )
    return results


def suite_results_df(df: DataFrame, expectations: list[dict]) -> DataFrame:
    """Per-expectation results as a DataFrame, with the dataset-level
    suite score (passed/total rounded 2 — reference
    great_expectations_pack/main.py:58) on every row."""
    res = evaluate_suite(df, expectations)
    total = len(res)
    passed = sum(r["success"] for r in res)
    score = 1.0 if total == 0 else round(passed / total, 2)
    spark = df.sparkSession
    rows = [
        (i, r["expectation"], r["column"], r["success"], score)
        for i, r in enumerate(res)
    ]
    return spark.createDataFrame(
        rows,
        "idx int, expectation string, column string, success boolean, "
        "suite_score double",
    )
