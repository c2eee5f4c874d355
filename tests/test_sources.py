"""Sources & sinks: landed-JSON ingestion parity with the reference's
extract stage, corrupt-record routing, and partitioned append sinks with
partition pruning."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.etl import PAYLOAD_SCHEMA, parse_payloads
from bitcoinminingetl_spark.sources.json_source import land_payload, read_landed_json
from bitcoinminingetl_spark.sources.sink import append_events_by_day


def test_land_and_read_payloads(spark, tmp_path):
    landing = str(tmp_path / "landing")
    land_payload(
        {"spider_ts": 1609459200, "price_data": {"USD": 50000, "time": 1609459200}},
        landing,
    )
    land_payload(
        {
            "spider_ts": 1609459230,
            "hash_rate_data": {"currentHashrate": 1e8, "currentDifficulty": 1.5e7},
        },
        landing,
    )
    df = read_landed_json(spark, landing, PAYLOAD_SCHEMA)
    assert df.count() == 2
    parsed = parse_payloads(df.select(F.to_json(F.struct("*")).alias("payload")))
    kinds = {r.kind for r in parsed.collect()}
    assert kinds == {"price", "hashrate"}


def test_corrupt_records_are_routed_not_fatal(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "good.json").write_text(
        json.dumps({"spider_ts": 1, "price_data": {"USD": 2, "time": 3}}) + "\n"
    )
    (landing / "bad.json").write_text("{not valid json!!\n")
    clean = read_landed_json(spark, str(landing), PAYLOAD_SCHEMA)
    assert clean.count() == 1  # bad line dropped, job alive
    kept = read_landed_json(spark, str(landing), PAYLOAD_SCHEMA, keep_corrupt=True)
    assert kept.filter(F.col("_corrupt_record").isNotNull()).count() == 1


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    events = table(spark, sf_dir, "events").limit(500)
    append_events_by_day(events, out)
    back = spark.read.parquet(out)
    assert back.count() == 500
    one_day = back.filter(F.col("ds") == "2024-01-01")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the ds filter must land in PartitionFilters,
    # not a post-scan Filter
    assert "PartitionFilters" in plan and "ds" in plan.split("PartitionFilters")[1][:200]
    # append is additive
    append_events_by_day(events, out)
    assert spark.read.parquet(out).count() == 1000


def test_compact_small_files(spark, sf_dir, tmp_path):
    """Many small appended files collapse to ~target-sized files with
    identical content."""
    from bitcoinminingetl_spark.catalog import table
    from bitcoinminingetl_spark.sources.sink import compact_small_files

    out = str(tmp_path / "frag")
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    # simulate micro-batch appends: 8 tiny writes
    for i in range(8):
        ev.filter(F.col("event_id") % 8 == i).repartition(3).write.mode(
            "append"
        ).parquet(out)
    import glob

    before = len(glob.glob(f"{out}/*.parquet"))
    rows_before = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    n = compact_small_files(spark, out, target_file_bytes=10 * 1024 * 1024)
    after = len(glob.glob(f"{out}/*.parquet"))
    assert after == n
    assert after < before
    assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == rows_before


def test_compaction_plan_bins_small_files(spark, sf_dir, tmp_path):
    """q_compaction_plan (the PLANNING twin of compact_small_files'
    rewrite): on a deliberately fragmented date-partitioned layout it
    must (a) conserve rows, (b) never merge across ds partitions,
    (c) collapse every partition to ONE worthwhile bin under a huge
    target, and (d) under a tiny target respect the next-fit bound —
    each bin's bytes stay below target + one largest file."""
    from bitcoinminingetl_spark.operators import scans

    frag = str(tmp_path / "frag_by_day")
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
        .filter(F.col("ds").isin("2024-01-05", "2024-01-06"))
    )
    for i in range(4):  # micro-batch appends: 4 x 3 tiny files per ds
        ev.filter(F.col("event_id") % 4 == i).repartition(3).write.mode(
            "append"
        ).partitionBy("ds").parquet(frag)
    fake_sf = str(tmp_path / "fake_sf")
    scans._PARTITIONED_LAYOUTS[fake_sf] = frag
    try:
        total_rows = spark.read.parquet(frag).count()

        plan = scans.q_compaction_plan(
            spark, fake_sf, target_bytes=1 << 40
        ).collect()
        assert {r.ds for r in plan} == {"2024-01-05", "2024-01-06"}
        assert all(r.bin == 0 for r in plan)  # one bin per partition
        assert all(r.n_files > 1 and r.rewrite_worthwhile for r in plan)
        assert sum(r.total_rows for r in plan) == total_rows

        sizes = sorted(
            r.b
            for r in spark.read.parquet(frag)
            .select(
                F.col("_metadata.file_path").alias("f"),
                F.col("_metadata.file_size").alias("b"),
            )
            .groupBy("f")
            .agg(F.max("b").alias("b"))
            .collect()
        )
        # target just above the median file: at least half the files are
        # candidates, the rest are ALREADY compacted and must be excluded
        tiny = sizes[len(sizes) // 2] + 1
        small = [s for s in sizes if s < tiny]
        plan2 = scans.q_compaction_plan(
            spark, fake_sf, target_bytes=tiny
        ).collect()
        assert plan2
        assert len(plan2) > len(plan)  # tiny target -> more bins
        assert sum(r.n_files for r in plan2) == len(small)  # big files skipped
        assert all(r.total_bytes < tiny + max(small) for r in plan2)

        # a target at the smallest file size leaves NO candidates
        assert (
            scans.q_compaction_plan(
                spark, fake_sf, target_bytes=sizes[0]
            ).count()
            == 0
        )
        import pytest

        with pytest.raises(ValueError, match="positive"):
            scans.q_compaction_plan(spark, fake_sf, target_bytes=0)
    finally:
        scans._PARTITIONED_LAYOUTS.pop(fake_sf, None)


def test_zorder_layout_prunes_multi_column(spark, sf_dir, tmp_path):
    """Z-ordered files carry tight min/max envelopes on BOTH clustered
    columns: a two-predicate filter touches fewer files than on a
    hash-shuffled layout with the same file count, and content is
    identical."""
    from bitcoinminingetl_spark.catalog import table
    from bitcoinminingetl_spark.sources.layout import write_zordered

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    z_path, r_path = str(tmp_path / "zorder"), str(tmp_path / "random")
    write_zordered(ev, z_path, ["user_id", "value"], n_files=8)
    ev.repartition(8).write.mode("overwrite").parquet(r_path)

    pred = (F.col("user_id") <= 2) & (F.col("value") <= 50)

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_files, r_files = files_touched(z_path), files_touched(r_path)
    assert z_files < r_files, f"z-order touched {z_files} vs random {r_files}"
    # layout must not change content
    a = sorted(tuple(r) for r in spark.read.parquet(z_path).collect())
    b = sorted(tuple(r) for r in ev.collect())
    assert a == b


def test_csv_round_trip_failfast(spark, sf_dir, tmp_path):
    """CSV write -> schema-first FAILFAST read returns identical rows."""
    from bitcoinminingetl_spark.catalog import table
    from bitcoinminingetl_spark.sources.formats import read_csv, write_csv

    nation = table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, nation.schema)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_orc_round_trip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC write -> read preserves rows; predicates reach the ORC scan."""
    from bitcoinminingetl_spark.catalog import table
    from bitcoinminingetl_spark.sources.formats import read_orc, write_orc

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    plan = (
        back.filter("o_totalprice > 100000")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan


def test_jdbc_append_options_shape():
    from bitcoinminingetl_spark.sources.formats import jdbc_append_options

    opts = jdbc_append_options(
        "jdbc:mysql://db:3306/mining", "price", "u", "p", batchsize=500
    )
    assert opts["dbtable"] == "price"
    assert opts["batchsize"] == "500"
    assert opts["isolationLevel"] == "READ_COMMITTED"


def test_python_datasource_matches_native_reader(spark, tmp_path):
    """The Spark-4 Python data source (landed_ticks) must return the
    same rows as the native JSON reader over the same landing dir —
    partition-per-file iteration, flat projection, corrupt-file
    swallowing."""
    from bitcoinminingetl_spark.sources.python_source import LandedTickDataSource

    landing = str(tmp_path / "landing")
    land_payload(
        {"spider_ts": 1609459200, "price_data": {"USD": 50000, "time": 1609459200}},
        landing,
    )
    land_payload(
        {
            "spider_ts": 1609459230,
            "hash_rate_data": {"currentHashrate": 1e8, "currentDifficulty": 1.5e7},
        },
        landing,
    )
    with open(landing + "/corrupt-1.json", "w") as f:
        f.write("{nope")

    spark.dataSource.register(LandedTickDataSource)
    got = (
        spark.read.format("landed_ticks")
        .option("path", landing)
        .load()
        .orderBy("spider_ts")
        .collect()
    )
    native = (
        read_landed_json(spark, landing, PAYLOAD_SCHEMA)
        .select(
            "spider_ts",
            F.col("price_data.USD").alias("usd"),
            F.col("price_data.time").alias("price_time"),
            F.col("hash_rate_data.currentHashrate").alias("hashrate"),
            F.col("hash_rate_data.currentDifficulty").alias("difficulty"),
        )
        .orderBy("spider_ts")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in native]
    assert len(got) == 2  # corrupt file contributed nothing


def test_python_datasource_streams_incrementally(spark, tmp_path):
    """The landed_ticks stream reader must consume each landed file
    exactly once across microbatches: offsets are consumed-file counts,
    so files landed between triggers appear in the next batch and never
    again."""
    from bitcoinminingetl_spark.sources.python_source import LandedTickDataSource

    landing = str(tmp_path / "landing")
    land_payload(
        {"spider_ts": 1, "price_data": {"USD": 100, "time": 1}}, landing
    )
    land_payload(
        {"spider_ts": 2, "price_data": {"USD": 200, "time": 2}}, landing
    )

    spark.dataSource.register(LandedTickDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once() -> list[int]:
        q = (
            spark.readStream.format("landed_ticks")
            .option("path", landing)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return sorted(r.spider_ts for r in spark.read.parquet(out).collect())

    assert run_once() == [1, 2]

    land_payload(
        {"spider_ts": 3, "price_data": {"USD": 300, "time": 3}}, landing
    )
    # same checkpoint -> the restarted query resumes from offset {"n": 2}
    # and must append ONLY the newly landed file (list, not set: a replay
    # of files 1-2 would show as duplicates)
    assert run_once() == [1, 2, 3]


def test_retention_sweep_drops_only_expired_partitions(spark, sf_dir, tmp_path):
    """The TTL sweep removes exactly the ds= partitions older than the
    cutoff, leaves fresh and unparseable entries untouched, and survivors
    stay readable with partition pruning intact."""
    from bitcoinminingetl_spark.catalog import table
    from bitcoinminingetl_spark.sources.sink import (
        append_events_by_day,
        retention_sweep,
    )

    path = str(tmp_path / "events_sink")
    events = table(spark, sf_dir, "events").limit(2000)
    append_events_by_day(events, path)
    import os

    parts = sorted(e for e in os.listdir(path) if e.startswith("ds="))
    assert len(parts) > 3
    # keep the newest 2 days relative to the max partition date
    newest = parts[-1][3:]
    dropped = retention_sweep(path, keep_days=1, today=newest)
    remaining = sorted(e for e in os.listdir(path) if e.startswith("ds="))
    assert dropped == parts[:-2] and remaining == parts[-2:]
    # survivors still readable; row counts match a filtered re-read
    kept_days = {e[3:] for e in remaining}
    got = spark.read.parquet(path).count()
    expected = (
        events.withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
        .filter(F.col("ds").isin(*kept_days))
        .count()
    )
    assert got == expected > 0
    # idempotent: second sweep drops nothing
    assert retention_sweep(path, keep_days=1, today=newest) == []


def test_compaction_plan_and_rewrite_agree_on_zero_row_files(
    spark, sf_dir, tmp_path
):
    """r7 VERDICT item 3: the planner used a row-level (_metadata)
    inventory that could not see ZERO-ROW parquet files, while the
    rewrite twin works from a listing and sweeps them — the pair
    disagreed on inventory. With the binaryFile-listing inventory the
    plan must count every physical file (a planted empty one included,
    at rows=0), and the rewrite must sweep it, with the two agreeing on
    the small-file set."""
    import glob
    import shutil

    from bitcoinminingetl_spark.catalog import table
    from bitcoinminingetl_spark.operators import scans
    from bitcoinminingetl_spark.sources.sink import compact_small_files

    frag = str(tmp_path / "frag_zero")
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
        .filter(F.col("ds") == "2024-01-05")
    )
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).repartition(2).write.mode(
            "append"
        ).partitionBy("ds").parquet(frag)

    # plant a ZERO-ROW parquet file (same schema, no rows) in the
    # partition dir — the shape a failed/empty micro-batch leaves behind
    empty_dir = str(tmp_path / "empty_part")
    ev.drop("ds").filter(F.lit(False)).coalesce(1).write.parquet(empty_dir)
    src = glob.glob(f"{empty_dir}/*.parquet")[0]
    shutil.copy(src, f"{frag}/ds=2024-01-05/part-zero-row.parquet")

    all_files = glob.glob(f"{frag}/ds=2024-01-05/*.parquet")
    data_rows = spark.read.parquet(frag).count()

    fake_sf = str(tmp_path / "fake_sf_zero")
    scans._PARTITIONED_LAYOUTS[fake_sf] = frag
    try:
        plan = scans.q_compaction_plan(
            spark, fake_sf, target_bytes=1 << 40
        ).collect()
        # inventory parity: the plan sees EVERY physical file, the
        # zero-row plant included, and conserves data rows (plant = 0)
        assert sum(r.n_files for r in plan) == len(all_files)
        assert sum(r.total_rows for r in plan) == data_rows
        assert all(r.rewrite_worthwhile for r in plan)
    finally:
        scans._PARTITIONED_LAYOUTS.pop(fake_sf, None)

    # the rewrite the plan directs sweeps the zero-row file: content
    # identical, no empty files remain
    compact_small_files(spark, frag, target_file_bytes=1 << 40)
    assert spark.read.parquet(frag).count() == data_rows
    remaining = glob.glob(f"{frag}/**/*.parquet", recursive=True)
    per_file_rows = {
        r.f: r.n
        for r in spark.read.parquet(frag)
        .groupBy(F.col("_metadata.file_path").alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every remaining physical file carries rows (zero-row plant gone)
    assert len(per_file_rows) == len(remaining)
    assert all(n > 0 for n in per_file_rows.values())


def test_compaction_plan_execution_matches_predicted_bins(
    spark, sf_dir, tmp_path
):
    """r10 VERDICT item 6: execute the compaction plan on a planted
    fragmented layout and assert the resulting layout matches the
    plan's predicted merge groups EXACTLY — every rewrite_worthwhile
    (ds, bin) collapses to one file carrying precisely that bin's
    planned row total, every single-file bin keeps its original file
    untouched, the per-partition file count equals the plan's bin
    count, and no data row is lost or duplicated. Byte totals are NOT
    asserted (parquet re-encoding changes compression framing); rows
    and file identity are the exact contract."""
    import glob

    from pyspark.sql import functions as SF

    from bitcoinminingetl_spark.catalog import table
    from bitcoinminingetl_spark.operators import scans
    from bitcoinminingetl_spark.sources.sink import compact_by_plan

    frag = str(tmp_path / "frag_exec")
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .withColumn("ds", SF.date_format("ts", "yyyy-MM-dd"))
        .filter(SF.col("ds").isin("2024-01-05", "2024-01-06"))
    )
    # 3 appends x repartition(2) -> up to 6 small files per ds directory
    for i in range(3):
        ev.filter(SF.col("event_id") % 3 == i).repartition(2).write.mode(
            "append"
        ).partitionBy("ds").parquet(frag)

    original_files = set(glob.glob(f"{frag}/**/*.parquet", recursive=True))
    data_rows = spark.read.parquet(frag).count()
    sizes = sorted(__import__("os").path.getsize(f) for f in original_files)
    # target ~2.5 median files: forces MULTIPLE bins per partition, with
    # at least one multi-file (rewrite) bin — and possibly single-file
    # (skip) bins, exercising both plan decisions
    target = int(sizes[len(sizes) // 2] * 2.5)

    fake_sf = str(tmp_path / "fake_sf_exec")
    scans._PARTITIONED_LAYOUTS[fake_sf] = frag
    try:
        bins = scans.compaction_file_bins(spark, fake_sf, target)
        plan = {
            (r.ds, r.bin): r
            for r in scans.q_compaction_plan(
                spark, fake_sf, target_bytes=target
            ).collect()
        }
        to_merge = {k for k, r in plan.items() if r.rewrite_worthwhile}
        to_skip = {k for k, r in plan.items() if not r.rewrite_worthwhile}
        assert to_merge, "planted layout produced no multi-file bin"

        skip_files = {
            r.file
            for r in bins.collect()
            if (r.ds, int(r.bin)) in to_skip
        }

        merged = compact_by_plan(spark, frag, bins)
    finally:
        scans._PARTITIONED_LAYOUTS.pop(fake_sf, None)

    # executed groups == planned rewrite groups, nothing more or less
    assert set(merged) == to_merge

    from urllib.parse import urlparse

    remaining = set(glob.glob(f"{frag}/**/*.parquet", recursive=True))
    # skip-bins' files untouched; merged bins' originals gone
    for f in skip_files:
        assert urlparse(f).path in remaining
    # layout shape matches the plan exactly: one file per bin
    for ds in {k[0] for k in plan}:
        n_bins = sum(1 for k in plan if k[0] == ds)
        assert len(glob.glob(f"{frag}/ds={ds}/*.parquet")) == n_bins

    # each merged file carries EXACTLY its bin's planned row total
    for key, dest in merged.items():
        assert spark.read.parquet(dest).count() == plan[key].total_rows

    # conservation: no row lost or duplicated across the rewrite
    assert spark.read.parquet(frag).count() == data_rows


def test_compact_by_plan_crash_safe_and_escaped_names(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r11 ADVICE: compact_by_plan used to move the merged file in
    BEFORE deleting the originals — a crash in between duplicated the
    bin's rows for every reader, unhealably. The rewrite tombstones the
    originals first (dot-prefixed: invisible to Spark, bytes intact),
    then commits the merged file with one rename; `recover_compaction`
    replays each group's outcome from the tombstone suffix. This test
    (a) plants a space-named file and asserts the plan counts its rows
    (the binaryFile-path vs percent-encoded _metadata.file_path join
    mismatch booked 0 rows for it before), then injects a crash
    (b) between tombstoning and the merged-file move, and
    (c) between the move and tombstone deletion — asserting at every
    point that NO reader ever sees a duplicated row, and that recovery
    restores (b) and finishes (c)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as SF

    from bitcoinminingetl_spark.operators import scans
    from bitcoinminingetl_spark.sources.sink import (
        _TOMB_SEP,
        compact_by_plan,
        recover_compaction,
    )

    frag = str(tmp_path / "frag_crash")
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .withColumn("ds", SF.date_format("ts", "yyyy-MM-dd"))
        .filter(SF.col("ds").isin("2024-01-05", "2024-01-06"))
    )
    for i in range(2):
        ev.filter(SF.col("event_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).partitionBy("ds").parquet(frag)
    # (a) files whose names need URI escaping: copies of a real data
    # file — a space (encodes as %20) and a literal '%' (encodes as
    # %25; r12 ADVICE regression: an unconditional decode of a path
    # containing a raw '%' would raise on the malformed sequence)
    src = glob.glob(f"{frag}/ds=2024-01-05/*.parquet")[0]
    spaced = f"{frag}/ds=2024-01-05/part with space.parquet"
    shutil.copy(src, spaced)
    percented = f"{frag}/ds=2024-01-05/part with 100% literal.parquet"
    shutil.copy(src, percented)
    data_rows = spark.read.parquet(frag).count()
    assert data_rows > 0

    fake_sf = str(tmp_path / "fake_sf_crash")
    scans._PARTITIONED_LAYOUTS[fake_sf] = frag
    try:
        bins = scans.compaction_file_bins(spark, fake_sf, 1 << 40)
        spaced_rows = [
            r.rows for r in bins.collect() if "space" in r.file
        ]
        assert spaced_rows and spaced_rows[0] > 0
        percent_rows = [
            r.rows for r in bins.collect() if "100%" in r.file
        ]
        assert percent_rows and percent_rows[0] > 0

        # (b) crash between tombstoning and the merged-file move:
        # compact_by_plan processes groups in sorted order, so the
        # injected failure hits ds=2024-01-05; 2024-01-06 stays intact
        real_move = shutil.move

        def crashing_move(*a, **kw):
            raise OSError("injected crash before commit")

        monkeypatch.setattr(shutil, "move", crashing_move)
        try:
            compact_by_plan(spark, frag, bins)
            raise AssertionError("injected crash did not propagate")
        except OSError:
            pass
        monkeypatch.setattr(shutil, "move", real_move)
        # 01-05's rows are hidden (tombstoned), NEVER duplicated
        visible = spark.read.parquet(frag).count()
        assert visible < data_rows
        healed = recover_compaction(frag)
        assert healed["restored"] and not healed["dropped"]
        assert spark.read.parquet(frag).count() == data_rows
        assert os.path.exists(spaced)

        # (c) crash between the move and tombstone deletion
        real_remove = os.remove

        def failing_remove(p):
            if _TOMB_SEP in os.path.basename(str(p)):
                raise OSError("injected crash after commit")
            return real_remove(p)

        monkeypatch.setattr(os, "remove", failing_remove)
        bins = scans.compaction_file_bins(spark, fake_sf, 1 << 40)
        try:
            compact_by_plan(spark, frag, bins)
            raise AssertionError("injected crash did not propagate")
        except OSError:
            pass
        monkeypatch.setattr(os, "remove", real_remove)
        # 01-05 committed (merged visible, originals tombstoned),
        # 01-06 untouched: exact row conservation, no duplicates
        assert spark.read.parquet(frag).count() == data_rows
        leftover = [
            n
            for n in os.listdir(f"{frag}/ds=2024-01-05")
            if _TOMB_SEP in n
        ]
        assert leftover, "crash left no tombstones to recover"
        healed = recover_compaction(frag)
        assert healed["dropped"] and not healed["restored"]
        assert spark.read.parquet(frag).count() == data_rows

        # finish the job cleanly: every partition collapses to one file
        bins = scans.compaction_file_bins(spark, fake_sf, 1 << 40)
        compact_by_plan(spark, frag, bins)
        assert spark.read.parquet(frag).count() == data_rows
        for ds_dir in sorted(glob.glob(f"{frag}/ds=*")):
            files = [
                n for n in os.listdir(ds_dir) if not n.startswith(".")
            ]
            assert len(files) == 1, (ds_dir, files)
        # idempotent on a healthy layout
        assert recover_compaction(frag) == {"restored": [], "dropped": []}
    finally:
        scans._PARTITIONED_LAYOUTS.pop(fake_sf, None)
