"""Expectation-suite + SodaCL evaluator tests (SURVEY §2.4 A17/A18)."""

import pandas as pd

from packs_spark.operators.expectations import (
    evaluate_suite,
    parse_sodacl,
    suite_results_df,
)


def _df(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "cat": ["a", "b", "a", "c", None],
            "val": [10.0, 20.0, None, 40.0, 50.0],
        }
    )
    return spark.createDataFrame(pdf)


def test_gx_expectations(spark):
    df = _df(spark)
    res = evaluate_suite(
        df,
        [
            {"expectation_type": "expect_table_row_count_to_be_between",
             "kwargs": {"min_value": 1, "max_value": 10}},
            {"expectation_type": "expect_table_columns_to_match_set",
             "kwargs": {"column_set": ["id", "cat", "val"],
                        "exact_match": True}},
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "cat"}},               # 4/5 → fail
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "cat", "mostly": 0.8}},  # 0.8 → pass
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "val", "min_value": 0, "max_value": 45}},
            # nulls ignored: 3 of 4 non-null vals in [0,45] → 0.75
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "val", "min_value": 0, "max_value": 45,
                        "mostly": 0.75}},
            {"expectation_type": "expect_column_values_to_be_in_set",
             "kwargs": {"column": "cat", "value_set": ["a", "b", "c"]}},
            {"expectation_type": "expect_column_values_to_be_unique",
             "kwargs": {"column": "id"}},
            {"expectation_type": "expect_column_values_to_be_unique",
             "kwargs": {"column": "cat"}},               # 'a' twice → fail
            {"expectation_type": "expect_column_mean_to_be_between",
             "kwargs": {"column": "val", "min_value": 29, "max_value": 31}},
            {"expectation_type": "expect_no_such_thing", "kwargs": {}},
        ],
    )
    got = [(r["expectation"], r["success"]) for r in res]
    assert got == [
        ("expect_table_row_count_to_be_between", True),
        ("expect_table_columns_to_match_set", True),
        ("expect_column_values_to_not_be_null", False),
        ("expect_column_values_to_not_be_null", True),
        ("expect_column_values_to_be_between", False),
        ("expect_column_values_to_be_between", True),
        ("expect_column_values_to_be_in_set", True),
        ("expect_column_values_to_be_unique", True),
        ("expect_column_values_to_be_unique", False),
        ("expect_column_mean_to_be_between", True),
        # unknown expectation skipped, reference `continue` semantics
    ]


def test_sodacl_parse_and_eval(spark):
    df = _df(spark)
    checks = [
        "row_count > 0",
        "missing_count(val) = 1",
        "duplicate_count(cat) = 1",  # 'a' ×2 → 4 non-null − 3 distinct = 1
        "min(val) >= 10",
        "max(val) < 50",  # 50 → fail
        "avg(val) = 30",
        "sum(id) = 15",
    ]
    res = evaluate_suite(df, [parse_sodacl(c) for c in checks])
    assert [r["success"] for r in res] == [
        True, True, True, True, False, True, True,
    ]
    assert res[4]["expectation"] == "max(val) < 50"


def test_suite_score_df(spark):
    df = _df(spark)
    out = suite_results_df(
        df,
        [
            {"expectation_type": "expect_table_row_count_to_be_between",
             "kwargs": {"min_value": 1}},
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "cat"}},
        ],
    ).collect()
    assert len(out) == 2
    assert all(r.suite_score == 0.5 for r in out)


def test_gx_new_types(spark):
    df = _df(spark)
    res = evaluate_suite(
        df,
        [
            {"expectation_type": "expect_column_sum_to_be_between",
             "kwargs": {"column": "val", "min_value": 100, "max_value": 200}},
            {"expectation_type": "expect_column_sum_to_be_between",
             "kwargs": {"column": "val", "min_value": 1000}},
            {"expectation_type": "expect_column_stdev_to_be_between",
             "kwargs": {"column": "val", "min_value": 1, "max_value": 100}},
            {"expectation_type": "expect_column_value_lengths_to_be_between",
             "kwargs": {"column": "cat", "min_value": 1, "max_value": 1}},
            {"expectation_type": "expect_column_value_lengths_to_be_between",
             "kwargs": {"column": "cat", "min_value": 2, "max_value": 5}},
            {"expectation_type": "expect_column_values_to_be_of_type",
             "kwargs": {"column": "id", "type_": "int64"}},
            {"expectation_type": "expect_column_values_to_be_of_type",
             "kwargs": {"column": "id", "type_": "str"}},
        ],
    )
    ok = [r["success"] for r in res]
    # sum(val)=120 in [100,200]; not >=1000; stdev ~17.8 in [1,100];
    # all cat lengths are 1; none in [2,5]; id is int64 not str
    assert ok == [True, False, True, True, False, True, False]


def test_gx_round3_types(spark):
    df = _df(spark)
    res = evaluate_suite(
        df,
        [
            {"expectation_type": "expect_column_values_to_be_null",
             "kwargs": {"column": "cat", "mostly": 0.2}},
            {"expectation_type": "expect_column_values_to_be_null",
             "kwargs": {"column": "cat"}},
            {"expectation_type": "expect_column_values_to_not_match_regex",
             "kwargs": {"column": "cat", "regex": "^z"}},
            {"expectation_type": "expect_column_values_to_not_match_regex",
             "kwargs": {"column": "cat", "regex": "^a"}},
            {"expectation_type": "expect_column_values_to_not_be_in_set",
             "kwargs": {"column": "cat", "value_set": ["x", "y"]}},
            {"expectation_type": "expect_column_values_to_not_be_in_set",
             "kwargs": {"column": "cat", "value_set": ["a"]}},
            {"expectation_type": "expect_column_distinct_values_to_be_in_set",
             "kwargs": {"column": "cat", "value_set": ["a", "b", "c", "d"]}},
            {"expectation_type": "expect_column_distinct_values_to_be_in_set",
             "kwargs": {"column": "cat", "value_set": ["a", "b"]}},
            {"expectation_type":
                 "expect_column_distinct_values_to_equal_set",
             "kwargs": {"column": "cat", "value_set": ["a", "b", "c"]}},
            {"expectation_type":
                 "expect_column_distinct_values_to_contain_set",
             "kwargs": {"column": "cat", "value_set": ["a", "b"]}},
            {"expectation_type":
                 "expect_column_distinct_values_to_contain_set",
             "kwargs": {"column": "cat", "value_set": ["a", "z"]}},
            {"expectation_type":
                 "expect_column_unique_value_count_to_be_between",
             "kwargs": {"column": "cat", "min_value": 3, "max_value": 3}},
            {"expectation_type":
                 "expect_column_proportion_of_unique_values_to_be_between",
             "kwargs": {"column": "cat", "min_value": 0.7,
                        "max_value": 0.8}},
            {"expectation_type": "expect_column_median_to_be_between",
             "kwargs": {"column": "val", "min_value": 20, "max_value": 40}},
            {"expectation_type":
                 "expect_column_quantile_values_to_be_between",
             "kwargs": {"column": "val", "quantile_ranges": {
                 "quantiles": [0.25, 0.75],
                 "value_ranges": [[10, 20], [40, 50]]}}},
            {"expectation_type":
                 "expect_column_quantile_values_to_be_between",
             "kwargs": {"column": "val", "quantile_ranges": {
                 "quantiles": [0.25], "value_ranges": [[45, 50]]}}},
            {"expectation_type":
                 "expect_column_pair_values_a_to_be_greater_than_b",
             "kwargs": {"column_A": "val", "column_B": "id"}},
            {"expectation_type": "expect_compound_columns_to_be_unique",
             "kwargs": {"column_list": ["id", "cat"]}},
            {"expectation_type": "expect_table_column_count_to_be_between",
             "kwargs": {"min_value": 3, "max_value": 3}},
            {"expectation_type": "expect_table_column_count_to_be_between",
             "kwargs": {"min_value": 5}},
            {"expectation_type":
                 "expect_column_values_to_match_strftime_format",
             "kwargs": {"column": "cat", "strftime_format": "%Y-%m-%d",
                        "mostly": 0.01}},
        ],
    )
    ok = [r["success"] for r in res]
    assert ok == [
        True,   # 1/5 rows null >= 0.2
        False,  # not all null
        True,   # nothing starts with z
        False,  # 'a' matches ^a (2 of 4 non-null)
        True,   # no x/y values
        False,  # 'a' present
        True,   # {a,b,c} ⊆ {a,b,c,d}
        False,  # 'c' outside {a,b}
        True,   # distinct == {a,b,c}
        True,   # contains {a,b}
        False,  # 'z' missing
        True,   # 3 distinct
        True,   # 3 distinct / 4 non-null = 0.75
        True,   # median(10,20,40,50) = 30
        True,   # q25=17.5∈[10,20] (cont), q75=42.5∈[40,50]
        False,  # q25 not in [45,50]
        False,  # (None, 3) counts unexpected (both_values_are_missing
                # is the only ignored shape) -> 4/5 < 1.0
        True,   # (id,cat) pairs unique
        True,   # exactly 3 columns
        False,  # fewer than 5 columns
        False,  # no cat value parses as a date
    ]


def test_uncompilable_expectation_fails_without_killing_suite(spark):
    """An unmapped strftime directive (%f) or unsupported SodaCL check
    records success=False for that expectation; the rest of the suite
    still evaluates (ADVICE r3: one bad format string aborted the run)."""
    res = evaluate_suite(
        _df(spark),
        [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "id"}},
            {"expectation_type":
                 "expect_column_values_to_match_strftime_format",
             "kwargs": {"column": "cat",
                        "strftime_format": "%Y-%m-%d %H:%M:%S.%f"}},
            {"expectation_type": "soda:freshness_using_nonsense",
             "kwargs": {}},
            {"expectation_type": "expect_table_row_count_to_be_between",
             "kwargs": {"min_value": 1}},
        ],
    )
    assert [r["success"] for r in res] == [True, False, False, True]


def test_dqops_checks(spark):
    """dqops-catalog checks (dqops: prefix): WHITESPACE found/percent,
    DATETIME future/range/format, UNIQUENESS distinct/duplicate — all in
    the same single-pass agg as the GX types."""
    pdf = pd.DataFrame(
        {
            "txt": ["ok", "", "  ", " pad ", "n/a", None],
            "ts": ["2020-01-05 00:00:00", "2020-06-01 00:00:00",
                   "2099-01-01 00:00:00", None, "2020-03-01 00:00:00",
                   "2020-04-01 00:00:00"],
            "k": [1, 2, 2, 3, 4, 4],
        }
    )
    df = spark.createDataFrame(pdf)
    res = evaluate_suite(
        df,
        [
            {"expectation_type": "dqops:empty_text_found",
             "kwargs": {"column": "txt", "max_count": 0}},       # 1 empty
            {"expectation_type": "dqops:empty_text_found",
             "kwargs": {"column": "txt", "max_count": 1}},
            {"expectation_type": "dqops:whitespace_text_found",
             "kwargs": {"column": "txt", "max_count": 0}},       # "  "
            {"expectation_type": "dqops:null_placeholder_text_percent",
             "kwargs": {"column": "txt", "max_percent": 20.0}},  # 1/5 = 20%
            {"expectation_type":
                 "dqops:text_surrounded_by_whitespace_found",
             "kwargs": {"column": "txt", "max_count": 1}},  # "  "+" pad "=2
            {"expectation_type": "dqops:date_values_in_future_percent",
             "kwargs": {"column": "ts", "max_percent": 0.0,
                        "now": "2030-01-01 00:00:00"}},     # 2099 is future
            {"expectation_type": "dqops:date_values_in_future_percent",
             "kwargs": {"column": "ts", "max_percent": 20.0,
                        "now": "2030-01-01 00:00:00"}},     # 1/5 = 20%
            {"expectation_type": "dqops:date_in_range_percent",
             "kwargs": {"column": "ts", "min_date": "2020-01-01",
                        "max_date": "2020-12-31", "min_percent": 80.0}},
            {"expectation_type": "dqops:text_match_date_format_percent",
             "kwargs": {"column": "ts",
                        "date_format": "%Y-%m-%d %H:%M:%S",
                        "min_percent": 100.0}},
            {"expectation_type": "dqops:distinct_count",
             "kwargs": {"column": "k", "min_value": 4, "max_value": 4}},
            {"expectation_type": "dqops:distinct_percent",
             "kwargs": {"column": "k", "min_percent": 60.0,
                        "max_percent": 70.0}},              # 4/6 = 66.7%
            {"expectation_type": "dqops:duplicate_count",
             "kwargs": {"column": "k", "max_count": 1}},    # 6-4 = 2 dups
            {"expectation_type": "dqops:duplicate_percent",
             "kwargs": {"column": "k", "max_percent": 40.0}},  # 33.3%
            {"expectation_type": "dqops:not_a_real_check",
             "kwargs": {"column": "k"}},                    # contained fail
        ],
    )
    assert [r["success"] for r in res] == [
        False, True, False, True, False,
        False, True, True, True,
        True, True, False, True,
        False,
    ]


def test_malformed_expectations_are_contained(spark):
    """Review findings: a dqops check without a column, a dict without
    expectation_type, and an unknown dqops name all record success=False
    without aborting the suite (and without silently passing)."""
    res = evaluate_suite(
        _df(spark),
        [
            {"expectation_type": "dqops:empty_text_found",
             "kwargs": {"max_count": 0}},          # no column -> fail
            {"expectation_type": "dqops:distinct_count",
             "kwargs": {"min_value": 1}},          # no column -> fail
            {"kwargs": {"column": "id"}},          # no type -> fail
            {"expectation_type": "expect_table_row_count_to_be_between",
             "kwargs": {"min_value": 1}},
        ],
    )
    assert [r["success"] for r in res] == [False, False, False, True]
    assert res[2]["expectation"] == "<missing type>"


def test_gx_round4_types(spark):
    """Tranche-2 GX types: row_count_to_equal, most_common_value,
    pair_equal, LIKE patterns, type_list, single-pass z-scores."""
    res = evaluate_suite(
        _df(spark),
        [
            {"expectation_type": "expect_table_row_count_to_equal",
             "kwargs": {"value": 5}},
            {"expectation_type": "expect_table_row_count_to_equal",
             "kwargs": {"value": 4}},
            {"expectation_type":
                 "expect_column_most_common_value_to_be_in_set",
             "kwargs": {"column": "cat", "value_set": ["a"]}},  # mode=a
            {"expectation_type":
                 "expect_column_most_common_value_to_be_in_set",
             "kwargs": {"column": "cat", "value_set": ["b", "c"]}},
            {"expectation_type": "expect_column_pair_values_to_be_equal",
             "kwargs": {"column_A": "id", "column_B": "id"}},
            {"expectation_type": "expect_column_pair_values_to_be_equal",
             "kwargs": {"column_A": "id", "column_B": "val"}},
            {"expectation_type":
                 "expect_column_values_to_match_like_pattern",
             "kwargs": {"column": "cat", "like_pattern": "_"}},  # all 1-char
            {"expectation_type":
                 "expect_column_values_to_not_match_like_pattern",
             "kwargs": {"column": "cat", "like_pattern": "a%"}},  # 'a' matches
            {"expectation_type": "expect_column_values_to_be_in_type_list",
             "kwargs": {"column": "val", "type_list": ["float64", "int"]}},
            {"expectation_type": "expect_column_values_to_be_in_type_list",
             "kwargs": {"column": "val", "type_list": ["str"]}},
            # val = 10,20,40,50: mean 30, sd ~18.26, extreme z ~1.095
            {"expectation_type":
                 "expect_column_value_z_scores_to_be_less_than",
             "kwargs": {"column": "val", "threshold": 2.0}},
            {"expectation_type":
                 "expect_column_value_z_scores_to_be_less_than",
             "kwargs": {"column": "val", "threshold": 1.0}},
            # mostly<1 is a contained NotImplementedError -> failed row
            {"expectation_type":
                 "expect_column_value_z_scores_to_be_less_than",
             "kwargs": {"column": "val", "threshold": 2.0, "mostly": 0.5}},
        ],
    )
    assert [r["success"] for r in res] == [
        True, False, True, False, True, False,
        True, False, True, False,
        True, False, False,
    ]


def test_review_round4_containment_holes(spark):
    """TypeErrors (bad kwarg types), non-dict entries, verdict-time type
    clashes, and an unparseable 'now' are all contained as failed rows —
    none may abort the suite (review findings, round 4)."""
    df = _df(spark)
    res = evaluate_suite(
        df,
        [
            # compile-time TypeError: float(None)
            {"expectation_type":
                 "expect_column_value_z_scores_to_be_less_than",
             "kwargs": {"column": "val", "threshold": None}},
            # compile-time TypeError: unhashable value_set entry
            {"expectation_type": "expect_column_values_to_be_in_set",
             "kwargs": {"column": "cat", "value_set": [["a"]]}},
            # non-dict expectation entry entirely
            "expect_column_values_to_not_be_null",
            # verdict-time TypeError: str bound vs numeric count
            {"expectation_type": "expect_table_row_count_to_be_between",
             "kwargs": {"min_value": "one"}},
            # unparseable fixed 'now' must FAIL, not silently pass via
            # cast(NULL) comparison
            {"expectation_type": "dqops:date_values_in_future_percent",
             "kwargs": {"column": "cat", "max_percent": 100.0,
                        "now": "2035-13-99"}},
            # control: a good check after all the bad ones still runs
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "id"}},
        ],
    )
    assert [r["success"] for r in res] == [
        False, False, False, False, False, True,
    ]


def test_mode_of_all_null_column_is_contained_failure(spark):
    """mode() of an empty/all-NULL column is NULL: the expectation fails
    (documented divergence: GX raises on no data, this engine records a
    contained failed row)."""
    pdf = pd.DataFrame({"x": [None, None, None]}).astype("object")
    df = spark.createDataFrame(pdf, "x string")
    res = evaluate_suite(
        df,
        [{"expectation_type":
              "expect_column_most_common_value_to_be_in_set",
          "kwargs": {"column": "x", "value_set": ["a"]}}],
    )
    assert res == [
        {"expectation": "expect_column_most_common_value_to_be_in_set",
         "column": "x", "success": False}
    ]


def test_gx_round4_tranche3_types(spark):
    """Tranche-3 GX types: column_count_to_equal, value_lengths_to_equal,
    regex lists, JSON/date parseability, multicolumn sum, within-record
    uniqueness, pair-in-set."""
    pdf = pd.DataFrame(
        {
            "a": [1, 2, 3, 4],
            "b": [9, 8, 7, 6],
            "code": ["ab", "cd", "ef", "gh"],
            "js": ['{"k":1}', "[1,2]", "not json", None],
            "dt": ["2020-01-02", "01/03/2020", "nope", "2020-01-02 03:04:05"],
        }
    )
    df = spark.createDataFrame(pdf)
    res = evaluate_suite(
        df,
        [
            {"expectation_type": "expect_table_column_count_to_equal",
             "kwargs": {"value": 5}},
            {"expectation_type": "expect_table_column_count_to_equal",
             "kwargs": {"value": 4}},
            {"expectation_type": "expect_column_value_lengths_to_equal",
             "kwargs": {"column": "code", "value": 2}},
            {"expectation_type": "expect_column_value_lengths_to_equal",
             "kwargs": {"column": "code", "value": 3}},
            # any-of: every code matches one of the two patterns
            {"expectation_type": "expect_column_values_to_match_regex_list",
             "kwargs": {"column": "code",
                        "regex_list": ["^[a-d]+$", "^[e-h]+$"]}},
            # all-of: none matches both
            {"expectation_type": "expect_column_values_to_match_regex_list",
             "kwargs": {"column": "code", "match_on": "all",
                        "regex_list": ["^[a-d]+$", "^[e-h]+$"]}},
            {"expectation_type":
                 "expect_column_values_to_not_match_regex_list",
             "kwargs": {"column": "code", "regex_list": ["^zz$", "^yy$"]}},
            # 2 of 3 non-null js values parse -> mostly 0.6 passes, 0.9 fails
            {"expectation_type": "expect_column_values_to_be_json_parseable",
             "kwargs": {"column": "js", "mostly": 0.6}},
            {"expectation_type": "expect_column_values_to_be_json_parseable",
             "kwargs": {"column": "js", "mostly": 0.9}},
            # 3 of 4 dt values parse (ISO date, MM/dd/yyyy, ISO ts)
            {"expectation_type":
                 "expect_column_values_to_be_dateutil_parseable",
             "kwargs": {"column": "dt", "mostly": 0.75}},
            {"expectation_type":
                 "expect_column_values_to_be_dateutil_parseable",
             "kwargs": {"column": "dt"}},
            # a+b = 10 on every row
            {"expectation_type": "expect_multicolumn_sum_to_equal",
             "kwargs": {"column_list": ["a", "b"], "sum_total": 10}},
            {"expectation_type": "expect_multicolumn_sum_to_equal",
             "kwargs": {"column_list": ["a", "b"], "sum_total": 11}},
            # a != b on every row
            {"expectation_type":
                 "expect_select_column_values_to_be_unique_within_record",
             "kwargs": {"column_list": ["a", "b"]}},
            # code duplicated within record -> fails
            {"expectation_type":
                 "expect_select_column_values_to_be_unique_within_record",
             "kwargs": {"column_list": ["code", "code"]}},
            {"expectation_type": "expect_column_pair_values_to_be_in_set",
             "kwargs": {"column_A": "a", "column_B": "b",
                        "value_pairs_set": [[1, 9], [2, 8], [3, 7], [4, 6]]}},
            {"expectation_type": "expect_column_pair_values_to_be_in_set",
             "kwargs": {"column_A": "a", "column_B": "b",
                        "value_pairs_set": [[1, 9]], "mostly": 0.25}},
        ],
    )
    assert [r["success"] for r in res] == [
        True, False,          # column count
        True, False,          # lengths equal
        True, False, True,    # regex lists
        True, False,          # json parseable
        True, False,          # dateutil parseable
        True, False,          # multicolumn sum
        True, False,          # unique within record
        True, True,           # pair in set
    ]


def test_multicolumn_null_semantics_match_gx_defaults(spark):
    """GX ignore_row_if defaults: multicolumn sum uses
    all_values_are_missing (a partially-null row IS evaluated, with the
    pandas backend's NaN-skipping sum), pair ops use
    both_values_are_missing (a half-null pair is evaluated and counts
    unexpected)."""
    pdf = pd.DataFrame(
        {
            "a": [4.0, 2.0, None, None],
            "b": [1.0, 3.0, 5.0, None],
        }
    )
    df = spark.createDataFrame(pdf)
    res = evaluate_suite(
        df,
        [
            # rows evaluated: (4,1)=5 ok, (2,3)=5 ok, (None,5)=5 ok
            # (NaN-skipping sum); all-null row ignored -> PASS
            {"expectation_type": "expect_multicolumn_sum_to_equal",
             "kwargs": {"column_list": ["a", "b"], "sum_total": 5}},
            # half-null pair (None,5) is evaluated and not in set -> only
            # 2 of 3 qualifying rows pass
            {"expectation_type": "expect_column_pair_values_to_be_in_set",
             "kwargs": {"column_A": "a", "column_B": "b",
                        "value_pairs_set": [[4.0, 1.0], [2.0, 3.0]]}},
            {"expectation_type": "expect_column_pair_values_to_be_in_set",
             "kwargs": {"column_A": "a", "column_B": "b",
                        "value_pairs_set": [[4.0, 1.0], [2.0, 3.0]],
                        "mostly": 0.66}},
            # same contract for pair equality: (None,5) counts unexpected
            {"expectation_type": "expect_column_pair_values_to_be_equal",
             "kwargs": {"column_A": "a", "column_B": "a"}},
            {"expectation_type":
                 "expect_column_pair_values_a_to_be_greater_than_b",
             "kwargs": {"column_A": "a", "column_B": "b", "mostly": 0.3}},
        ],
    )
    assert [r["success"] for r in res] == [True, False, True, True, True]
