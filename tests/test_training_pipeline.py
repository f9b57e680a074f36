"""End-to-end training-data pipeline: funnel monotonicity, gold
content, versioned lineage, and re-run determinism."""

from __future__ import annotations

import pytest

from finalpipeline_spark.plans.training_pipeline import (
    N_SHARDS,
    SEQ_LEN,
    TrainingPipeline,
)


@pytest.fixture(scope="module")
def run(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("tp"))
    p = TrainingPipeline(spark, wh)
    report = p.run(sf_dir).collect()
    return p, report


def test_funnel_is_monotone_and_populated(run):
    p, report = run
    stages = [r.stage for r in report]
    assert stages == ["clean", "dedup_exact", "dedup_near", "decontaminate", "quality"]
    for r in report:
        assert 0 < r.docs_out <= r.docs_in
    # consecutive stages chain: stage N's output is stage N+1's input
    for a, b in zip(report, report[1:]):
        assert a.docs_out == b.docs_in


def test_gold_content_shape(run):
    p, _ = run
    gold = p.gold.read()
    assert gold.columns == ["doc_id", "text", "n_tokens", "shard", "seq_id"]
    rows = gold.count()
    assert rows > 0
    # shards within range; sequence offsets consistent per shard
    assert gold.filter(f"shard < 0 or shard >= {N_SHARDS}").count() == 0
    assert gold.filter("n_tokens <= 0").count() == 0
    # each (shard, seq_id) holds at most ~SEQ_LEN tokens worth of docs
    # plus the one doc that straddles the boundary
    overs = (
        gold.groupBy("shard", "seq_id")
        .sum("n_tokens")
        .filter(f"`sum(n_tokens)` > {2 * SEQ_LEN}")
    )
    # a single doc longer than SEQ_LEN may blow the cap — allow only those
    long_docs = p.gold.read().filter(f"n_tokens > {SEQ_LEN}").count()
    assert overs.count() <= long_docs


def test_gold_lineage_records_bronze_version(run):
    p, _ = run
    m = p.gold.manifest()
    assert m["meta"]["bronze_version"] == p.bronze.latest_version()


def test_rerun_is_deterministic(spark, sf_dir, run):
    p, report1 = run
    gold1 = p.gold.read()
    report2 = p.run(sf_dir).collect()
    gold2 = p.gold.read()
    assert [tuple(r) for r in report1] == [tuple(r) for r in report2]
    assert gold1.exceptAll(gold2).count() == 0
    assert gold2.exceptAll(gold1).count() == 0
    # and the runs are separate pinned versions, both still readable
    assert len(p.gold.versions()) == 2
    assert p.gold.read(version=0).count() == gold2.count()
