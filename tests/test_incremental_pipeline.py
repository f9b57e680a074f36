"""Incremental training-pipeline runs converge to the wholesale run:
curation decisions (exact/near dedup, decontamination incl. gold
retraction, quality) over batch1 + batch2 equal one wholesale run over
both — while the incremental path touches O(batch) via the persisted
fp/band/eval-shingle indexes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from finalpipeline_spark.plans.training_pipeline import TrainingPipeline
from finalpipeline_spark.tables import load_table

_KEY_COLS = ["doc_id", "text", "n_tokens", "shard"]


def _lane(text: str) -> int:
    return (int(hashlib.md5(text.encode()).hexdigest()[:8], 16) % 2_147_483_648) % 100


def _rows(df):
    return sorted(tuple(r) for r in df.select(*_KEY_COLS).collect())


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    max_id = docs.agg(F.max("doc_id")).first()[0]
    # a synthetic EVAL-lane doc (lane < 5) sharing shingles with an
    # existing train doc — forces the retraction path: pick a long
    # existing text and append suffixes until the md5 lane lands < 5
    donor = (
        docs.filter("n_chars > 200").orderBy("doc_id").first()
    )
    eval_text = None
    for i in range(2000):
        cand = donor.text + f" zz{i}"
        if _lane(cand) < 5:
            eval_text = cand
            break
    assert eval_text is not None
    synth = spark.createDataFrame(
        [(max_id + 1000, eval_text, donor.lang, donor.source, len(eval_text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    split = docs.agg(F.expr("percentile_approx(doc_id, 0.6)")).first()[0]
    batch1 = docs.filter(F.col("doc_id") <= split)
    batch2 = docs.filter(F.col("doc_id") > split).unionByName(synth)
    return docs.unionByName(synth), batch1, batch2, donor.doc_id


def test_incremental_equals_wholesale(spark, tmp_path_factory, corpus):
    full, batch1, batch2, donor_id = corpus

    wholesale = TrainingPipeline(spark, str(tmp_path_factory.mktemp("whA")))
    wholesale.run(docs=full)

    inc = TrainingPipeline(spark, str(tmp_path_factory.mktemp("whB")))
    inc.run(docs=batch1)
    inc.seed_indexes()
    report = {r.stage: (r.docs_in, r.docs_out) for r in inc.run_incremental(batch2).collect()}

    assert _rows(inc.gold.read()) == _rows(wholesale.gold.read())
    # the retraction path actually fired (the synthetic eval doc's
    # shingles contaminate at least the donor doc shipped in batch 1)
    assert report["retract"][0] >= 1
    # and the donor doc is gone from BOTH golds
    assert inc.gold.read().filter(F.col("doc_id") == donor_id).count() == 0
    # incremental gold is two pinned versions beyond the batch-1 gold:
    # retraction (CoW delete) + the batch-2 append, each time-travelable
    actions = [
        inc.gold._read_manifest_file(v)["action"] for v in inc.gold.versions()
    ]
    assert actions[0] == "overwrite" and "delete" in actions and actions[-1] == "append"


def test_incremental_packing_continues_each_shard(spark, tmp_path_factory, corpus):
    _, batch1, batch2, _ = corpus
    p = TrainingPipeline(spark, str(tmp_path_factory.mktemp("whC")))
    p.run(docs=batch1)
    p.seed_indexes()
    p.run_incremental(batch2)
    # baseline = the gold state the append continued from (the version
    # just before the final append, i.e. after any retraction)
    pre_append = p.gold.latest_version() - 1
    base_max = {
        r.shard: r.m
        for r in p.gold.read(version=pre_append)
        .groupBy("shard")
        .agg(F.max("seq_id").alias("m"))
        .collect()
    }
    new_rows = p.gold.read_changes(since_version=pre_append)
    for r in new_rows.groupBy("shard").agg(F.min("seq_id").alias("m")).collect():
        # new sequence ids extend (never restart) the shard's layout
        assert r.m >= base_max.get(r.shard, 0)


def test_incremental_rejects_non_monotone_ids(spark, tmp_path_factory, corpus):
    _, batch1, _, _ = corpus
    p = TrainingPipeline(spark, str(tmp_path_factory.mktemp("whD")))
    p.run(docs=batch1)
    p.seed_indexes()
    with pytest.raises(ValueError, match="monotone"):
        p.run_incremental(batch1.limit(5))


def test_repack_after_retraction(spark, tmp_path_factory, corpus):
    """CoW retractions leave sequence-slot holes; repack_shards must
    restore the density invariant for exactly the fragmented shards,
    atomically, without changing the doc set — and be idempotent."""
    full, *_ = corpus
    p = TrainingPipeline(spark, str(tmp_path_factory.mktemp("whE")))
    p.run(docs=full)
    from finalpipeline_spark.plans.training_pipeline import SEQ_LEN

    gold = p.gold.read()
    # pick a shard whose LAST doc alone can't justify its watermark,
    # then retract every other doc in it → invariant provably violated
    from pyspark.sql.window import Window

    last = (
        gold.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("shard").orderBy(F.desc("doc_id"))
            ),
        )
        .filter("rn = 1")
        .filter(F.expr(f"seq_id * {SEQ_LEN} >= n_tokens"))
        .first()
    )
    assert last is not None
    shard = last["shard"]
    p.gold.delete_where(f"shard = {shard} AND doc_id != {last['doc_id']}")

    def density(df):
        return {
            r["shard"]: (int(r["t"]), int(r["mx"]))
            for r in df.groupBy("shard")
            .agg(F.sum("n_tokens").alias("t"), F.max("seq_id").alias("mx"))
            .collect()
        }

    t, mx = density(p.gold.read())[shard]
    assert t <= mx * SEQ_LEN  # fragmented
    docs_before = sorted(r.doc_id for r in p.gold.read().select("doc_id").collect())
    v_before = p.gold.latest_version()

    rep = {r["shard"]: r for r in p.repack_shards().collect()}
    assert shard in rep and rep[shard]["seqs_after"] < rep[shard]["seqs_before"]
    assert p.gold.latest_version() == v_before + 1  # one atomic commit
    assert p.gold.manifest()["action"] == "replace"
    assert docs_before == sorted(
        r.doc_id for r in p.gold.read().select("doc_id").collect()
    )  # content preserved
    for s, (t2, mx2) in density(p.gold.read()).items():
        assert t2 > mx2 * SEQ_LEN, f"shard {s} still fragmented"
    # idempotent: nothing left to repack, no new version
    assert p.repack_shards().count() == 0
    assert p.gold.latest_version() == v_before + 1
