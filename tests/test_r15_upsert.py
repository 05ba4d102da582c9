"""Round-15 upsert staged-write optimizations (sources/writers.py):

- touched partitions with no live directory skip the merge entirely —
  the staged write is a pure write of updates and untouched partitions'
  files stay byte-identical (the bounded-rewrite contract, now provable
  at file granularity for the all-new-partition batch);
- live touched partitions are located with a LITERAL partition
  predicate (static pruning) instead of a broadcast semi-join — same
  merge result, including NULL partition values and day-grain values
  that partition type inference reads back as DATE;
- partition value types whose str() rendering differs from Spark's
  string cast (bool/float) fall back to the join path and still merge
  exactly.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.sources.writers import (
    _literal_ok,
    upsert_by_key,
)


def _listing(tdir: Path) -> dict[str, tuple[int, int]]:
    return {
        str(p.relative_to(tdir)): (p.stat().st_size, p.stat().st_mtime_ns)
        for p in tdir.rglob("*")
        if p.is_file() and not p.name.startswith(("_", "."))
    }


def _rows(spark, wh, table):
    # partition type inference may read day-grain strings back as DATE
    # and ints back as INT; normalize through a string cast
    return {
        tuple(r)
        for r in spark.read.parquet(str(Path(wh) / table))
        .select("k", "v", F.col("p").cast("string").alias("p"))
        .collect()
    }


def test_all_new_partitions_leave_live_files_untouched(spark, tmp_path):
    wh = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], "k int, v string, p string"
    )
    upsert_by_key(spark, base, wh, "t", ["k"], ["p"])
    before = _listing(tmp_path / "t")
    # batch touches only a partition the table has never seen
    upd = spark.createDataFrame([(3, "c", "2024-01-03")], "k int, v string, p string")
    upsert_by_key(spark, upd, wh, "t", ["k"], ["p"])
    after = _listing(tmp_path / "t")
    kept = {f: s for f, s in after.items() if not f.startswith("p=2024-01-03")}
    assert kept == before, "live partitions must keep their exact files"
    assert _rows(spark, wh, "t") == {
        (1, "a", "2024-01-01"),
        (2, "b", "2024-01-02"),
        (3, "c", "2024-01-03"),
    }


def test_literal_pruned_merge_replaces_and_inserts(spark, tmp_path):
    wh = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02"), (9, "z", None)],
        "k int, v string, p string",
    )
    upsert_by_key(spark, base, wh, "t", ["k"], ["p"])
    # mix: replace k=1 in a live partition, insert into a new one,
    # and replace the NULL-partition row (isNull branch of the literal
    # predicate)
    upd = spark.createDataFrame(
        [(1, "a2", "2024-01-01"), (4, "d", "2024-01-04"), (9, "z2", None)],
        "k int, v string, p string",
    )
    upsert_by_key(spark, upd, wh, "t", ["k"], ["p"])
    assert _rows(spark, wh, "t") == {
        (1, "a2", "2024-01-01"),
        (2, "b", "2024-01-02"),
        (4, "d", "2024-01-04"),
        (9, "z2", None),
    }


def test_untouched_live_partition_files_stable_under_merge(spark, tmp_path):
    wh = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], "k int, v string, p string"
    )
    upsert_by_key(spark, base, wh, "t", ["k"], ["p"])
    before = _listing(tmp_path / "t")
    upd = spark.createDataFrame([(1, "a2", "2024-01-01")], "k int, v string, p string")
    upsert_by_key(spark, upd, wh, "t", ["k"], ["p"])
    after = _listing(tmp_path / "t")
    assert {f: s for f, s in after.items() if f.startswith("p=2024-01-02")} == {
        f: s for f, s in before.items() if f.startswith("p=2024-01-02")
    }
    assert _rows(spark, wh, "t") == {
        (1, "a2", "2024-01-01"),
        (2, "b", "2024-01-02"),
    }


def test_int_bucket_partition_literal_merge(spark, tmp_path):
    # int partition values read back as INT; the literal predicate
    # compares on the string cast — the agg sink's __p_bucket layout
    wh = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 3), (2, "b", 7)], "k int, v string, p int"
    )
    upsert_by_key(spark, base, wh, "t", ["k"], ["p"])
    upd = spark.createDataFrame([(1, "a2", 3), (5, "e", 11)], "k int, v string, p int")
    upsert_by_key(spark, upd, wh, "t", ["k"], ["p"])
    assert _rows(spark, wh, "t") == {(1, "a2", "3"), (2, "b", "7"), (5, "e", "11")}


def test_non_literal_partition_type_falls_back_and_merges(spark, tmp_path):
    # float partition values: str(0.5) vs cast-to-string rendering is
    # not guaranteed identical in general, so the literal path must
    # decline (falls back to the broadcast semi-join) and the merge
    # must still be exact
    wh = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5)], "k int, v string, p double"
    )
    upsert_by_key(spark, base, wh, "t", ["k"], ["p"])
    upd = spark.createDataFrame([(1, "a2", 0.5)], "k int, v string, p double")
    upsert_by_key(spark, upd, wh, "t", ["k"], ["p"])
    assert _rows(spark, wh, "t") == {(1, "a2", "0.5"), (2, "b", "1.5")}


def test_literal_ok_type_gate():
    import datetime as dt

    class R(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    assert _literal_ok([R(p="x"), R(p=None), R(p=3)], ["p"])
    assert _literal_ok([R(p=dt.date(2024, 1, 5))], ["p"])
    assert not _literal_ok([R(p=True)], ["p"])  # 'True' vs 'true'
    assert not _literal_ok([R(p=0.5)], ["p"])
    assert not _literal_ok([R(p=dt.datetime(2024, 1, 5))], ["p"])


def test_key_moves_partition_unstable_path(spark, tmp_path):
    # stable_partitions=False: a key that moved partitions must have
    # its stale copy removed from the OLD partition (the prior-location
    # scan feeds the touched set; exercises the literal path end to end
    # with prior rows whose partition value came from the read-back
    # side)
    wh = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], "k int, v string, p string"
    )
    upsert_by_key(spark, base, wh, "t", ["k"], ["p"])
    upd = spark.createDataFrame([(1, "a2", "2024-01-05")], "k int, v string, p string")
    upsert_by_key(spark, upd, wh, "t", ["k"], ["p"], stable_partitions=False)
    assert _rows(spark, wh, "t") == {
        (1, "a2", "2024-01-05"),
        (2, "b", "2024-01-02"),
    }


def test_special_char_partition_values_literal_merge(spark, tmp_path):
    # hive escapes '=' and spaces in dirnames; the live-set listing
    # unquotes them, so the literal path must still locate and merge
    # the partition correctly
    wh = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", "x y=z"), (2, "b", "plain")], "k int, v string, p string"
    )
    upsert_by_key(spark, base, wh, "t", ["k"], ["p"])
    upd = spark.createDataFrame([(1, "a2", "x y=z")], "k int, v string, p string")
    upsert_by_key(spark, upd, wh, "t", ["k"], ["p"])
    assert _rows(spark, wh, "t") == {(1, "a2", "x y=z"), (2, "b", "plain")}
