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
