#!/usr/bin/env python3
"""Self-test of check_oracle.py's type-faithfulness (r15 ask #3).

The r12–r14 driver reds were invisible to the old checker BY
CONSTRUCTION: both sides were fetched through one DuckDB connection,
so int64 and int128 (or Decimal) stringified identically. This test
rebuilds the exact failure shape — a Spark-side BIGINT dump vs an
oracle whose final SELECT is an un-cast sum(BIGINT) (→ HUGEINT) — and
asserts the checker now REDS it, plus the green control (cast oracle)
and the unit seams (type_class / compare_types).

Usage: python3 scripts/test_check_oracle.py   (exit 0 = all pass)
"""
import contextlib
import io
import json
import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle  # noqa: E402


def test_type_class():
    assert check_oracle.type_class("BIGINT") == "int"
    assert check_oracle.type_class("INTEGER") == "int"
    assert check_oracle.type_class("HUGEINT") == "HUGEINT"
    assert check_oracle.type_class("DECIMAL(38,0)") == "DECIMAL"
    assert check_oracle.type_class("DOUBLE") == "float"
    assert check_oracle.type_class("BIGINT[]") == "int[]"
    assert check_oracle.type_class("HUGEINT[]") == "HUGEINT[]"


def test_compare_types():
    # int widths are one class; HUGEINT/DECIMAL never are
    assert check_oracle.compare_types(
        ["a"], ["INTEGER"], ["a"], ["BIGINT"]) == []
    assert check_oracle.compare_types(
        ["a"], ["BIGINT"], ["a"], ["HUGEINT"]) == \
        [("a", "int", "HUGEINT")]
    assert check_oracle.compare_types(
        ["a"], ["BIGINT"], ["a"], ["DECIMAL(38,0)"]) == \
        [("a", "int", "DECIMAL")]


def run_main(sf_dir, out_dir):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = check_oracle.main(sf_dir, out_dir)
    return rc, buf.getvalue()


def test_end_to_end():
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp, "sf")
        out = os.path.join(tmp, "out")
        os.makedirs(sf)
        os.makedirs(os.path.join(out, "q_sum"))
        con = duckdb.connect()
        con.execute(
            "COPY (SELECT CAST(r AS BIGINT) AS l_quantity "
            "FROM range(5) t(r)) "
            f"TO '{sf}/lineitem.parquet' (FORMAT PARQUET)")
        # the "Spark" dump: the correct BIGINT value 0+1+2+3+4 = 10
        con.execute(
            "COPY (SELECT CAST(10 AS BIGINT) AS s) "
            f"TO '{out}/q_sum/part-0.parquet' (FORMAT PARQUET)")

        # RED case: un-cast sum(BIGINT) → HUGEINT oracle (the q233
        # driver-red shape; values identical, only the width differs)
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump({"q_sum":
                       "SELECT sum(l_quantity) AS s FROM lineitem"}, f)
        rc, text = run_main(sf, out)
        assert rc == 1, f"un-cast HUGEINT sum must red locally:\n{text}"
        assert "result-TYPE divergence" in text, text

        # GREEN control: the cast oracle passes (same values)
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump({"q_sum": "SELECT CAST(sum(l_quantity) AS BIGINT)"
                                " AS s FROM lineitem"}, f)
        rc, text = run_main(sf, out)
        assert rc == 0, f"cast BIGINT sum must stay green:\n{text}"
        assert "PASS q_sum" in text, text


if __name__ == "__main__":
    test_type_class()
    test_compare_types()
    test_end_to_end()
    print("check_oracle self-test: all pass "
          "(un-cast HUGEINT sum reds locally)")
