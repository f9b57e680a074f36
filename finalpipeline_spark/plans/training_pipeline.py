"""End-to-end training-data pipeline: the north-star composition.

Every stage exists elsewhere in the repo as an oracle-checked query;
this plan wires them into the artifact a user actually ships — raw
corpus in, packed + sharded training data out — with the operational
properties a 100 TB run needs:

* **Pinned inputs.** Stage 0 commits the raw corpus into a
  `sources/versioned.VersionedTable`; every downstream stage reads that
  exact snapshot, and the gold commit records the bronze version in its
  manifest meta — a training run is reproducible from its gold manifest
  alone.
* **Monotone funnel accounting.** Each stage reports docs in/out; the
  report is the first thing an operator looks at when a run's token
  count moves ("did dedup suddenly eat 40%?").
* **Determinism end to end.** Every stage is a pure function of
  content (content-addressed hashes, no rand(), no timestamps), so
  re-running the pipeline on the same snapshot yields the identical
  row set — verified by test.

Stage → oracle-checked twin:
  clean      → doc_pii_redact, doc_quality_score (features)
  exact dup  → doc_dedup_exact_keep_best (canonical = best quality)
  near dup   → doc_dedup_minhash_lsh (banded LSH, no all-pairs)
  decontam   → doc_decontam_ngram_overlap (eval split is held out)
  quality    → doc_quality_classifier (linear scorer, scan-speed)
  pack       → doc_pack_sequences (running-offset chunking)
  shard      → doc_shard_interleave (content-addressed assignment)

Scale shape: one corpus-sized shuffle for exact dedup (32-byte md5
keys), one for LSH banding (band keys, not text), one for packing (the
per-shard running sum); everything else is scan-speed projections. The
only driver-side state is the funnel report (one row per stage) and
the versioned-table manifests.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finalpipeline_spark.functions.frames import empty_df, local_df
from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.sources.versioned import VersionedTable
from finalpipeline_spark.tables import load_table

MIN_CHARS = 100          # clean gate: drop fragments
QUALITY_MIN = 0.0        # classifier score gate (see _quality_score)
SEQ_LEN = 256            # tokens per packed training sequence
N_SHARDS = 8
_EVAL_PCT = 5            # held-out eval slice (content-addressed)
_LSH_BANDS = 4


@dataclass(frozen=True)
class StageCount:
    stage: str
    docs_in: int
    docs_out: int


class TrainingPipeline:
    """raw documents → packed, sharded training sequences."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.bronze = VersionedTable(spark, f"{warehouse}/bronze_docs")
        self.gold = VersionedTable(spark, f"{warehouse}/gold_packed")
        # incremental-mode state (all append-only under monotone ids):
        # every exact-canonical fp, every LSH band key with its min-id
        # canon, every eval-lane shingle seen so far
        self.fp_index = VersionedTable(spark, f"{warehouse}/idx_fps")
        self.band_index = VersionedTable(spark, f"{warehouse}/idx_bands")
        self.eval_shingles = VersionedTable(spark, f"{warehouse}/idx_eval_shingles")
        self.report: list[StageCount] = []
        self._last_count: int | None = None

    # -- stages ------------------------------------------------------
    def ingest(self, sf_dir: str) -> int:
        """Stage 0: pin the raw corpus as one versioned snapshot."""
        docs = load_table(self.spark, sf_dir, "documents")
        info = self.bronze.commit_overwrite(docs)
        return info.version

    def _counted(self, stage: str, before: DataFrame, after: DataFrame) -> DataFrame:
        """Record the stage's funnel row and materialize its output
        once (localCheckpoint): each stage is computed exactly one
        time — the funnel count doubles as the materializing action —
        instead of every later count()/write replaying the whole
        upstream chain. At cluster scale the checkpoint becomes a
        silver-table write; the accounting is identical."""
        out = after.localCheckpoint(eager=True)
        n_in = self._last_count if self._last_count is not None else before.count()
        n_out = out.count()
        self._last_count = n_out
        self.report.append(StageCount(stage, n_in, n_out))
        return out

    @staticmethod
    def _scrub(docs: DataFrame) -> DataFrame:
        """Pure per-doc PII scrub + length gate (no funnel counting) —
        shared by the wholesale and incremental paths so content-
        addressed decisions (fps, bands, lanes) agree between them."""
        scrubbed = docs.withColumn(
            "text",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        "text",
                        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                        "<EMAIL>",
                    ),
                    r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
                    "<IP>",
                ),
                r"\+?\d[\d\s().-]{7,}\d",
                "<PHONE>",
            ),
        )
        return scrubbed.filter(F.length("text") >= MIN_CHARS)

    def clean(self, docs: DataFrame) -> DataFrame:
        """PII scrub + minimum-length gate (doc_pii_redact twin)."""
        return self._counted("clean", docs, self._scrub(docs))

    def dedup_exact(self, docs: DataFrame) -> DataFrame:
        """Canonical copy per identical text: keep the lowest doc_id
        (deterministic; the shuffle carries 32-byte md5 keys)."""
        w = Window.partitionBy("fp").orderBy("doc_id")
        out = (
            docs.withColumn("fp", F.md5("text"))
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("fp", "rn")
        )
        return self._counted("dedup_exact", docs, out)

    @staticmethod
    def _band_keys(docs: DataFrame) -> DataFrame:
        """(doc_id, band, key) LSH band keys — the near-dup bucketing
        relation, shared by the wholesale and incremental paths."""
        from finalpipeline_spark.queries.documents import MINHASH_COEFFS

        toks = D.tokens("text", D.SPARK)
        tok_hash = D.token_hash("t", D.SPARK)
        hashed_arr = D.transform_arr("toks", "t", tok_hash, D.SPARK)
        hashed = docs.selectExpr("doc_id", f"{toks} AS toks").selectExpr(
            "doc_id", f"{hashed_arr} AS hs"
        )
        shingled = hashed.selectExpr(
            "doc_id", f"{D.shingle_hashes('hs', D.SPARK)} AS shs"
        ).filter(F.expr(f"{D.arr_size('shs', D.SPARK)} > 0"))
        sig = shingled.selectExpr(
            "doc_id",
            f"{D.minhash_sig_ints('shs', MINHASH_COEFFS, D.SPARK)} AS sig",
        ).localCheckpoint(eager=True)
        per_band = len(MINHASH_COEFFS) // _LSH_BANDS
        return sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.expr(
                                "concat_ws(',', "
                                + ", ".join(
                                    f"sig[{b * per_band + i}]" for i in range(per_band)
                                )
                                + ")"
                            ).alias("key"),
                        )
                        for b in range(_LSH_BANDS)
                    ]
                )
            ).alias("bk"),
        ).select("doc_id", "bk.band", "bk.key")

    def dedup_near(self, docs: DataFrame) -> DataFrame:
        """MinHash-LSH near-dup removal (doc_dedup_minhash_lsh twin):
        banded signatures → candidate pairs within buckets only; the
        min-id member of each candidate group survives."""
        bands = self._band_keys(docs)
        # min doc_id per (band, key) bucket = the survivor each member maps to
        canon = bands.groupBy("band", "key").agg(F.min("doc_id").alias("canon"))
        dup_of = (
            bands.join(canon, ["band", "key"])
            .filter("doc_id != canon")
            .select("doc_id")
            .distinct()
        )
        out = docs.join(dup_of, "doc_id", "left_anti")
        return self._counted("dedup_near", docs, out)

    @staticmethod
    def _with_lane_and_shingles(docs: DataFrame) -> DataFrame:
        """docs + content-addressed eval lane + shingle-hash array —
        the decontamination inputs, shared with the incremental path."""
        toks = D.tokens("text", D.SPARK)
        lane = f"({D.hex_prefix_to_int(D.md5_hex('text', D.SPARK), D.SPARK)} % 100)"
        tok_hash = D.token_hash("t", D.SPARK)
        hashed_arr = D.transform_arr(toks, "t", tok_hash, D.SPARK)
        shingles = D.shingle_hashes(hashed_arr, D.SPARK)
        return docs.selectExpr("*", f"{lane} AS lane").selectExpr(
            "*", f"{shingles} AS shs"
        )

    def decontaminate(self, docs: DataFrame) -> DataFrame:
        """Drop training docs sharing any 3-gram shingle with the
        held-out eval slice (doc_decontam_ngram_overlap twin). The eval
        slice is content-addressed (md5 lane), so the split is stable
        across runs; eval side is tiny → broadcast."""
        with_sh = self._with_lane_and_shingles(docs)
        train = with_sh.filter(F.col("lane") >= _EVAL_PCT)
        eval_sh = (
            with_sh.filter(F.col("lane") < _EVAL_PCT)
            .select(F.explode("shs").alias("sh"))
            .distinct()
        )
        contaminated = (
            train.select("doc_id", F.explode("shs").alias("sh"))
            .join(F.broadcast(eval_sh), "sh")
            .select("doc_id")
            .distinct()
        )
        out = train.join(contaminated, "doc_id", "left_anti").drop("lane", "shs")
        return self._counted("decontaminate", docs, out)

    def quality_filter(self, docs: DataFrame) -> DataFrame:
        """Linear quality scorer over scan-time features
        (doc_quality_classifier twin): length, alpha ratio, mean word
        length — pure codegen projection, zero shuffle."""
        scored = docs.withColumn(
            "q",
            F.expr(
                "0.4 * least(length(text) / 2000.0, 1.0)"
                " + 0.4 * (length(regexp_replace(text, '[^a-zA-Z ]', ''))"
                "          / cast(greatest(length(text), 1) as double))"
                " + 0.2 * least(length(text) / cast(greatest(size(split(text, ' ')), 1)"
                "               as double) / 8.0, 1.0)"
            ),
        )
        return self._counted(
            "quality", docs, scored.filter(F.col("q") > QUALITY_MIN).drop("q")
        )

    def pack_and_shard(
        self, docs: DataFrame, prior_offsets: DataFrame | None = None
    ) -> DataFrame:
        """Token counting → per-shard running offsets → sequence ids
        (doc_pack_sequences twin) with content-addressed shard
        assignment (doc_shard_interleave twin). One shuffle: the
        per-shard window. ``prior_offsets`` (shard, prior_toks)
        continues an existing layout: each shard's running sum starts
        after the tokens already packed there (the incremental path)."""
        toks = D.tokens("text", D.SPARK)
        with_n = docs.selectExpr(
            "*", f"{D.arr_size(toks, D.SPARK)} AS n_tokens"
        ).filter("n_tokens > 0")
        shard = f"({D.hex_prefix_to_int(D.md5_hex('text', D.SPARK), D.SPARK)} % {N_SHARDS})"
        sharded = with_n.selectExpr("*", f"{shard} AS shard")
        if prior_offsets is not None:
            sharded = sharded.join(F.broadcast(prior_offsets), "shard", "left").withColumn(
                "prior_toks", F.coalesce("prior_toks", F.lit(0))
            )
        else:
            sharded = sharded.withColumn("prior_toks", F.lit(0))
        w = Window.partitionBy("shard").orderBy("doc_id")
        return (
            sharded.withColumn("end_off", F.col("prior_toks") + F.sum("n_tokens").over(w))
            .withColumn("seq_id", F.expr(f"(end_off - 1) div {SEQ_LEN}"))
            .select("doc_id", "text", "n_tokens", "shard", "seq_id")
        )

    # -- driver --------------------------------------------------------
    def run(self, sf_dir: str | None = None, docs: DataFrame | None = None) -> DataFrame:
        """Execute all stages against a pinned bronze snapshot (loaded
        from ``sf_dir`` or given directly as ``docs``); commit gold
        with lineage meta; return the funnel report."""
        self.report = []
        self._last_count = None
        if docs is not None:
            bronze_version = self.bronze.commit_overwrite(docs).version
        else:
            bronze_version = self.ingest(sf_dir)
        docs = self.bronze.read(bronze_version)
        out = self.pack_and_shard(
            self.quality_filter(
                self.decontaminate(self.dedup_near(self.dedup_exact(self.clean(docs))))
            )
        )
        # lineage: which bronze snapshot produced this gold version
        self.gold.commit_overwrite(out, meta={"bronze_version": bronze_version})
        rows = [(s.stage, s.docs_in, s.docs_out) for s in self.report]
        return local_df(
            self.spark, rows, "stage string, docs_in bigint, docs_out bigint"
        )

    def seed_indexes(self) -> None:
        """(Re)build the incremental-mode index tables from the current
        bronze snapshot — run once after a wholesale `run` to enable
        `run_incremental` batches on top of it."""
        cleaned = self._scrub(self.bronze.read())
        fps = cleaned.select(F.md5("text").alias("fp"), "doc_id").groupBy("fp").agg(
            F.min("doc_id").alias("canon")
        )
        self.fp_index.commit_overwrite(fps)
        exact = cleaned.withColumn("fp", F.md5("text")).withColumn(
            "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
        ).filter("rn = 1").drop("fp", "rn")
        band_keys = self._band_keys(exact).localCheckpoint(eager=True)
        bands = band_keys.groupBy("band", "key").agg(F.min("doc_id").alias("canon"))
        self.band_index.commit_overwrite(bands)
        # eval shingles come from NEAR-DEDUP SURVIVORS — the wholesale
        # decontaminate() sees eval docs only after both dedup stages,
        # so an eval doc dropped as a near-dup contributes no shingles
        dup = (
            band_keys.join(bands, ["band", "key"])
            .filter("doc_id != canon")
            .select("doc_id")
            .distinct()
        )
        near = exact.join(dup, "doc_id", "left_anti")
        ev = (
            self._with_lane_and_shingles(near)
            .filter(F.col("lane") < _EVAL_PCT)
            .select(F.explode("shs").alias("sh"))
            .distinct()
        )
        self.eval_shingles.commit_overwrite(ev)

    def run_incremental(self, new_docs: DataFrame) -> DataFrame:
        """Process ONE batch of new documents in O(batch): every
        curation decision consults the persisted indexes instead of
        rescanning the corpus, and decisions equal the wholesale run's
        because ingest ids are monotone (new ids > all previous), so an
        indexed canonical (min id) can never be displaced by a new doc.

        Two effects on gold, both versioned commits:
          * APPEND the batch's survivors (packing continues each
            shard's running token offset, so sequence ids extend the
            existing layout);
          * RETRACT (CoW delete) previously-shipped gold docs that the
            batch's NEW eval-lane shingles retroactively contaminate —
            the decision a snapshot pipeline can only make by full
            recompute. After retraction the doc SET equals the
            wholesale run's; the physical packing of old survivors is
            left in place (repacking is an OPTIMIZE-style maintenance
            job, not a correctness requirement).
        """
        prev_max = self.bronze.read().agg(F.max("doc_id")).first()[0]
        batch_min = new_docs.agg(F.min("doc_id")).first()[0]
        if prev_max is not None and batch_min <= prev_max:
            raise ValueError(
                f"ingest ids must be monotone: batch min {batch_min} <= "
                f"existing max {prev_max}"
            )
        self.report = []
        self._last_count = None
        bronze_version = self.bronze.commit_append(new_docs).version

        batch = self._counted("clean", new_docs, self._scrub(new_docs))
        # exact dedup: within batch (min id per fp) AND vs the fp index
        fp_idx = self.fp_index.read()
        w = Window.partitionBy("fp").orderBy("doc_id")
        with_fp = batch.withColumn("fp", F.md5("text"))
        exact = self._counted(
            "dedup_exact",
            batch,
            with_fp.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .join(fp_idx.select("fp"), "fp", "left_anti")
            .drop("fp", "rn"),
        )
        self.fp_index.commit_append(
            with_fp.select("fp", "doc_id")
            .groupBy("fp")
            .agg(F.min("doc_id").alias("canon"))
            .join(fp_idx.select("fp"), "fp", "left_anti")
        )
        # near dup: collision with an indexed band key OR a smaller-id
        # batch doc (both are exactly the wholesale min-id rule)
        bands = self._band_keys(exact).localCheckpoint(eager=True)
        band_idx = self.band_index.read()
        hit_index = bands.join(
            band_idx.select("band", "key"), ["band", "key"]
        ).select("doc_id")
        canon = bands.groupBy("band", "key").agg(F.min("doc_id").alias("canon"))
        hit_batch = (
            bands.join(canon, ["band", "key"]).filter("doc_id != canon").select("doc_id")
        )
        near = self._counted(
            "dedup_near",
            exact,
            exact.join(hit_index.union(hit_batch).distinct(), "doc_id", "left_anti"),
        )
        self.band_index.commit_append(
            canon.join(band_idx.select("band", "key"), ["band", "key"], "left_anti")
        )
        # decontamination: new train docs vs ALL eval shingles (index ∪
        # batch); then retract gold docs hit by the batch's NEW shingles
        with_sh = self._with_lane_and_shingles(near)
        # eval shingles from the batch's NEAR-DEDUP SURVIVORS — exactly
        # the population whose shingles the wholesale decontaminate sees
        batch_eval_sh = (
            with_sh.filter(F.col("lane") < _EVAL_PCT)
            .select(F.explode("shs").alias("sh"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        all_eval_sh = self.eval_shingles.read().union(batch_eval_sh).distinct()
        train = with_sh.filter(F.col("lane") >= _EVAL_PCT)
        contaminated = (
            train.select("doc_id", F.explode("shs").alias("sh"))
            .join(F.broadcast(all_eval_sh), "sh")
            .select("doc_id")
            .distinct()
        )
        decon = self._counted(
            "decontaminate",
            near,
            train.join(contaminated, "doc_id", "left_anti").drop("lane", "shs"),
        )
        new_eval_sh = batch_eval_sh.join(self.eval_shingles.read(), "sh", "left_anti")
        retract_ids = [
            r.doc_id
            for r in self._with_lane_and_shingles(self.gold.read())
            .select("doc_id", F.explode("shs").alias("sh"))
            .join(F.broadcast(new_eval_sh), "sh")
            .select("doc_id")
            .distinct()
            .collect()  # bounded by retraction count, not corpus
        ]
        if retract_ids:
            self.gold.delete_where(
                "doc_id IN (" + ",".join(str(i) for i in retract_ids) + ")"
            )
        self.eval_shingles.commit_append(new_eval_sh)
        # quality gate + packing continuation per shard: normally the
        # new running sum continues from the shard's token total (which
        # is EXACTLY the wholesale layout); if a retraction shrank the
        # total below the sequence-id watermark (stale ids keep their
        # packing — no repack on delete), jump to the next free
        # boundary so new sequence ids never collide with old ones
        prior = (
            self.gold.read()
            .groupBy("shard")
            .agg(
                F.sum("n_tokens").cast("long").alias("t"),
                F.max("seq_id").cast("long").alias("mx"),
            )
            .selectExpr(
                "shard",
                f"CASE WHEN t > mx * {SEQ_LEN} THEN t"
                f" ELSE (mx + 1) * {SEQ_LEN} END AS prior_toks",
            )
        )
        out = self.pack_and_shard(self.quality_filter(decon), prior_offsets=prior)
        self.gold.commit_append(out, meta={"bronze_version": bronze_version})
        self.report.append(StageCount("retract", len(retract_ids), len(retract_ids)))
        rows = [(s.stage, s.docs_in, s.docs_out) for s in self.report]
        return local_df(
            self.spark, rows, "stage string, docs_in bigint, docs_out bigint"
        )

    def repack_shards(self) -> DataFrame:
        """Maintenance job: densely repack shards fragmented by
        retractions.

        A CoW retraction leaves holes in the packed layout (sequence
        ids keep their positions; the incremental path then jumps to
        the next free sequence boundary so ids never collide), so a
        shard's token total can fall arbitrarily below its sequence-id
        watermark — wasted training-sequence slots that would otherwise
        accumulate forever. This job re-runs the packing window with a
        zero offset for exactly the shards whose density invariant
        ``sum(n_tokens) > max(seq_id) * SEQ_LEN`` is violated, and
        swaps them in with ONE atomic ``replace_where`` commit (the
        Delta replaceWhere shape) — readers never observe a
        deleted-but-not-yet-repacked table, pinned versions still read
        the old layout, and healthy shards' files carry over by
        reference. Shard assignment is content-addressed (md5 of the
        unchanged text), so repacked rows provably stay in their
        shards and the predicate covers exactly the rewritten rows.
        Idempotent: a repacked shard satisfies the invariant, so a
        second run is a no-op. Scale shape: the rewrite is bounded by
        the affected shards' rows; the decision scan is one gold
        aggregation to N_SHARDS rows."""
        gold = self.gold.read()
        stats = gold.groupBy("shard").agg(
            F.sum("n_tokens").cast("long").alias("t"),
            F.max("seq_id").cast("long").alias("mx"),
        )
        affected = sorted(
            int(r["shard"])
            for r in stats.filter(F.expr(f"t <= mx * {SEQ_LEN}")).collect()
        )  # bounded by N_SHARDS
        if not affected:
            return empty_df(
                self.spark, "shard bigint, seqs_before bigint, seqs_after bigint"
            )
        pred = "shard IN (" + ",".join(str(s) for s in affected) + ")"
        before = {
            int(r["shard"]): int(r["mx"]) + 1
            for r in stats.filter(F.expr(pred)).collect()
        }
        repacked = self.pack_and_shard(
            gold.filter(F.expr(pred)).select("doc_id", "text")
        ).localCheckpoint(eager=True)
        self.gold.replace_where(pred, repacked, meta={"repacked_shards": affected})
        after = {
            int(r["shard"]): int(r["mx"]) + 1
            for r in repacked.groupBy("shard")
            .agg(F.max("seq_id").alias("mx"))
            .collect()
        }
        rows = [(s, before[s], after.get(s, 0)) for s in affected]
        return local_df(
            self.spark, rows, "shard bigint, seqs_before bigint, seqs_after bigint"
        )
