"""Z-order layout: the skipping property itself — per-file parquet
footer stats must exclude most files for selective predicates on BOTH
z-ordered columns, where a single-column sort only ever skips on its
own column."""

import os

import pyarrow.parquet as pq

from reactivedb_spark.operators import layout


def _file_ranges(path, col):
    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        lo = min(md.row_group(i).column(_col_idx(md, col)).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(_col_idx(md, col)).statistics.max
                 for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _col_idx(md, name):
    schema = md.schema.to_arrow_schema()
    return schema.get_field_index(name)


def _skippable(ranges, lo, hi):
    """Files whose [min, max] cannot contain values in [lo, hi]."""
    return sum(1 for (mn, mx) in ranges if mx < lo or mn > hi)


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    # a 64x64 grid: x and y independent
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    zpath = str(tmp_path / "zorder")
    layout.zorder_write(df, "x", "y", zpath, n_files=16)

    xr = _file_ranges(zpath, "x")
    yr = _file_ranges(zpath, "y")
    assert len(xr) == 16
    # a 1/8-wide predicate on either dimension must exclude >= half the
    # files from footer stats alone
    assert _skippable(xr, 0, 7) >= 8, xr
    assert _skippable(yr, 0, 7) >= 8, yr

    # contrast: x-only sort gives perfect x skipping but ZERO y skipping
    spath = str(tmp_path / "xsort")
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(spath))
    assert _skippable(_file_ranges(spath, "x"), 0, 7) >= 12
    assert _skippable(_file_ranges(spath, "y"), 0, 7) == 0

    # layout never changes content
    back = spark.read.parquet(zpath)
    assert back.count() == 64 * 64
    assert back.columns == ["x", "y", "payload"] or set(back.columns) == {"x", "y", "payload"}
    assert "_z" not in back.columns


def test_zvalue_is_pure_column_math(spark):
    df = spark.createDataFrame([(0, 0), (1, 1)], "a long, b long")
    plan = layout.zvalue(df, "a", "b")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
