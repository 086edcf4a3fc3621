"""Small-file compaction: sizing rule, content preservation, and the
streaming-sink (batch_id=N) layout fold."""

import glob

from flight_delays_progetto_big_data_2024_spark.sources.maintenance import (
    compact_parquet,
    plan_compaction,
)


def _parquet_files(path: str) -> list[str]:
    return glob.glob(f"{path}/**/*.parquet", recursive=True)


def test_plan_compaction_sizing():
    mb = 1024 * 1024
    assert plan_compaction(0) == 1  # empty input still needs one file
    assert plan_compaction(100 * mb, target_file_mb=128) == 1
    assert plan_compaction(129 * mb, target_file_mb=128) == 2
    assert plan_compaction(1000 * mb, target_file_mb=128) == 8
    assert plan_compaction(1000 * mb, 128, compression_ratio=0.5) == 4


def test_compact_many_small_files_preserves_content(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "frag")
    events.repartition(40).write.parquet(path)
    assert len(_parquet_files(path)) == 40

    before = events.count()
    n_out = compact_parquet(spark, path, target_file_mb=128)
    files = _parquet_files(path)
    assert n_out == 1 and len(files) == 1

    after = spark.read.parquet(path)
    assert after.count() == before
    assert after.exceptAll(spark.read.parquet(f"{sf_dir}/events.parquet")).count() == 0


def test_compact_folds_batch_partition_layout(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "sink")
    for batch_id in range(3):
        events.limit(10).write.parquet(f"{path}/batch_id={batch_id}")

    compact_parquet(spark, path, target_file_mb=128)
    out = spark.read.parquet(path)
    # directory column survives as data; all three batches present
    assert out.count() == 30
    assert {r["batch_id"] for r in out.select("batch_id").distinct().collect()} == {
        0,
        1,
        2,
    }


def test_compact_splits_when_over_target(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "split")
    events.repartition(20).write.parquet(path)
    # tiny target forces multiple output files
    n_out = compact_parquet(spark, path, target_file_mb=1)
    files = _parquet_files(path)
    assert n_out >= 1 and len(files) == n_out
    assert spark.read.parquet(path).count() == events.count()
