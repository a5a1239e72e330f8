"""Persisted-index incremental twins: value parity with the in-memory
originals, plan-asserted bucket pruning ("SelectedBucketsCount: x out of N"
on the on-disk index scan, no hash exchange on the index join key), and the
physical skipping contract MEASURED from the written bucket files with
pyarrow — each derived bucket key lives in exactly one file, so an isin
probe can skip every file outside its key set."""

from __future__ import annotations

import os
import re

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tf_idf_using_mapreduce_spark.operators import dedup, multimodal, persisted


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _executed_plan(df) -> str:
    df.collect()  # finalize AQE so the plan shows the real scan nodes
    return df._jdf.queryExecution().executedPlan().toString()


def _table_location(spark, name: str) -> str:
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    loc = next(r["data_type"] for r in rows if r["col_name"] == "Location")
    return loc.removeprefix("file:")


@pytest.mark.parametrize(
    "persisted_fn, memory_fn, kind",
    [
        (persisted.dedup_incremental_persisted, dedup.dedup_incremental, "band"),
        (persisted.dedup_incremental_bloom_persisted, dedup.dedup_incremental_bloom, "hash"),
        (persisted.dedup_image_phash_incremental_persisted,
         multimodal.dedup_image_phash_incremental, "phband"),
    ],
    ids=["band", "hash", "phband"],
)
def test_persisted_twin_matches_in_memory(spark, persisted_fn, memory_fn, kind):
    got = _rows(persisted_fn(spark, SF_SMOKE))
    want = _rows(memory_fn(spark, SF_SMOKE))
    assert got == want
    # second invocation probes the memoized table — still identical
    assert _rows(persisted_fn(spark, SF_SMOKE)) == want


@pytest.fixture(scope="module")
def plan_dir(spark, tmp_path_factory):
    """A corpus whose batch split (doc_id % 5 == 0) is TWO documents — one an
    exact/near dup of an indexed doc, one novel — so both probes are
    non-empty (the plan keeps the index scan) yet touch far fewer bucket
    keys than there are buckets (pruning must bite)."""
    d = str(tmp_path_factory.mktemp("persist_plan"))
    rows = [(0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog today"),
            (5, "a completely novel batch sentence about bucket pruning")]
    for i in range(2, 10):
        if i == 5:
            continue
        rows.append((i, f"distinct indexed document number {i} with its own filler phrase"))
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_bloom_persisted_plan_prunes_buckets_and_never_reshuffles_index(spark, plan_dir):
    df = persisted.dedup_incremental_bloom_persisted(spark, plan_dir)
    assert (0, 1, True) in _rows(df)  # the probe really matched the index
    plan = _executed_plan(df)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"no bucket pruning on the index scan:\n{plan}"
    selected, total = int(m.group(1)), int(m.group(2))
    assert total == persisted.N_INDEX_BUCKETS
    # the bloom-pruned batch is a handful of rows — far fewer distinct
    # bucket keys than buckets, so pruning must actually bite
    assert selected < total, plan
    # the index side is only ever scanned + broadcast-joined: no hash
    # exchange on its join key h anywhere in the plan
    assert not re.search(r"hashpartitioning\(h#", plan), plan
    assert "BroadcastHashJoin" in plan, plan


def test_band_persisted_plan_prunes_buckets_and_never_reshuffles_index(spark, plan_dir):
    df = persisted.dedup_incremental_persisted(spark, plan_dir)
    assert {(r[0], r[1]) for r in df.collect()} == {(0, 1)}  # dup confirmed
    plan = _executed_plan(df)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"no bucket pruning on the index scan:\n{plan}"
    selected, total = int(m.group(1)), int(m.group(2))
    assert total == persisted.N_INDEX_BUCKETS
    # 2 batch docs × 8 bands = 16 probe keys over 16 buckets: some buckets
    # must stay unselected (collisions make equality astronomically unlikely
    # on this pinned corpus; the build is deterministic, so no flake)
    assert selected < total, plan
    # no hash exchange on the index's band join keys: the probe broadcasts
    assert not re.search(r"hashpartitioning\(band#", plan), plan
    assert not re.search(r"hashpartitioning\(band_sig#", plan), plan
    assert "BroadcastHashJoin" in plan, plan


@pytest.fixture(scope="module")
def phash_plan_dir(spark, tmp_path_factory):
    """Long-letter payload corpus (>= PHASH_MIN_BYTES after stripping to
    [a-z]) whose batch split (doc_id % 5 == 0) holds one exact payload dup
    of an indexed doc and one novel doc — the phash probe is non-empty and
    touches far fewer bucket keys than there are buckets."""
    d = str(tmp_path_factory.mktemp("phash_plan"))
    base = ("the quick brown fox jumps over the lazy dog while the "
            "calm river carries autumn leaves past the old stone bridge")
    rows = [(0, base), (1, base),
            (5, "entirely novel imagery of glaciers carving silent valleys "
                "beneath a violet sky where migrating cranes trace slow arcs")]
    for i in range(2, 10):
        if i == 5:
            continue
        rows.append((i, f"distinct indexed payload number {i} woven from its own "
                        "unrepeated phrases about harbors markets orchards and trains "
                        f"variant {'x' * i}"))
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_phash_persisted_plan_prunes_buckets_and_never_reshuffles_index(spark, phash_plan_dir):
    """The persisted tier is GENERIC: the image-modality index (aHash through
    the decode seam, SimHash band layout) rides the same write-once /
    bucket-prune / broadcast-probe machinery — same plan markers as the
    MinHash/md5 twins, and the probe really matches the index."""
    df = persisted.dedup_image_phash_incremental_persisted(spark, phash_plan_dir)
    got = {(r[0], r[1]) for r in df.collect()}
    assert (0, 1) in got  # exact payload dup: hamming 0 against the index
    assert all(doc == 0 for doc, _ in got)  # novel batch doc matched nothing
    plan = _executed_plan(df)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"no bucket pruning on the index scan:\n{plan}"
    selected, total = int(m.group(1)), int(m.group(2))
    assert total == persisted.N_INDEX_BUCKETS
    # 2 batch docs × 4 bands = ≤ 8 probe keys over 16 buckets: pruning bites
    # (deterministic corpus + hash, so no flake)
    assert selected < total, plan
    # the index side is only scanned + broadcast-joined — never reshuffled
    assert not re.search(r"hashpartitioning\(band#", plan), plan
    assert not re.search(r"hashpartitioning\(bkey#", plan), plan
    assert "BroadcastHashJoin" in plan, plan
    # parity with the in-memory twin on the same corpus
    want = _rows(multimodal.dedup_image_phash_incremental(spark, phash_plan_dir))
    assert _rows(df) == want


def test_bucket_files_partition_key_space_measured_with_pyarrow(spark):
    """The physical skipping contract, measured from the files: every bb
    value lives in exactly ONE bucket file, so an isin probe reads only the
    files whose bucket holds one of its values and can skip all others."""
    persisted.dedup_incremental_bloom_persisted(spark, SF_SMOKE).collect()
    name = next(n for n in persisted._BUILT if n.startswith("graft_idx_hash_"))
    loc = _table_location(spark, name)
    files = sorted(
        os.path.join(loc, f) for f in os.listdir(loc)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    assert 1 < len(files) <= persisted.N_INDEX_BUCKETS
    per_file: list[set[int]] = []
    for f in files:
        per_file.append(set(pq.read_table(f, columns=["bb"])["bb"].to_pylist()))
    for i in range(len(per_file)):
        for j in range(i + 1, len(per_file)):
            assert per_file[i].isdisjoint(per_file[j]), (files[i], files[j])
    # and the actual probe's key set leaves at least one file skippable
    batch, _idx, _occ, pruned = dedup._bloom_split_and_prune(spark, SF_SMOKE)
    probe = {
        r[0] for r in pruned.select(persisted._bb("h").alias("bb")).distinct().collect()
    }
    skipped = sum(1 for s in per_file if not (s & probe))
    assert skipped >= 1, (probe, [sorted(s) for s in per_file])


def test_index_rebuilds_when_corpus_identity_changes(spark, tmp_path):
    """Identity-keyed persistence: same directory, changed contents ⇒ a NEW
    table is built and the probe reflects the new corpus (no stale state)."""
    d = str(tmp_path)

    def write(rows):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    # corpus 1: batch doc 0 duplicates indexed doc 1
    write([(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "other words here")])
    out1 = {tuple(r) for r in
            persisted.dedup_incremental_bloom_persisted(spark, d).collect()}
    assert (0, 1, True) in out1
    # corpus 2 in the SAME dir: doc 0 is now novel
    write([(0, "alpha beta gamma"), (1, "completely different"), (2, "other words here")])
    out2 = {tuple(r) for r in
            persisted.dedup_incremental_bloom_persisted(spark, d).collect()}
    assert (0, None, False) in out2
    # and the superseded generation's warehouse location was reclaimed:
    # exactly ONE live index per (kind, corpus path), not one per refresh
    import glob
    import hashlib

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    path_key = hashlib.md5(os.path.abspath(d).encode("utf-8")).hexdigest()[:10]
    for kind in ("hash", "bloomocc"):
        live = glob.glob(os.path.join(warehouse, f"graft_idx_{kind}_{path_key}_*"))
        assert len(live) == 1, live
