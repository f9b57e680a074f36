"""Training-data assembly operators: the step AFTER curation.

Once a corpus is cleaned (documents.py) and curated (curation.py), a
pretraining pipeline still has to (a) resample it across languages /
domains, (b) pick one canonical copy per duplicate group, (c) assign a
reproducible global order and sharding, and (d) pack variable-length
documents into fixed-length training sequences. These are the operators
this module adds (SURVEY.md north-star section; no counterpart exists
in the reference, which stops at the datamart — datamart.py:148-172).

Everything is deterministic and content-addressed — no rand(), no RNG
state, no driver-side loops — so a 100 TB run is reproducible across
retries, partitionings, and engines, and every operator is
oracle-checkable bit-for-bit (dual-dialect SQL like the rest of the
repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

SPARK_VIEW = "__fps_documents_trn"
SPARK_EVENTS_VIEW = "__fps_events_trn"


def _doc_tbl(dialect: str) -> str:
    return SPARK_VIEW if dialect == D.SPARK else "documents"


# --------------------------------------------------------------------------
# Sequence packing (concat-and-chunk) per shard
# --------------------------------------------------------------------------
_SEQ_LEN = 2048      # tokens per training sequence
_PACK_SHARDS = 4     # independent packing streams
_SHUF_MULT = 2246822519  # xxhash prime — a hash lane of its own


def _pack_sql(dialect: str) -> str:
    """GPT-style concat-and-chunk packing: within each shard, documents
    are concatenated in deterministic shuffled order and the stream is
    chunked every _SEQ_LEN tokens; each document reports the training
    sequence (pack) its first token lands in and whether it straddles a
    chunk boundary.

    Scale shape: ONE window sum per shard — the cumulative token offset
    is a running sum partitioned by shard, so the sort is per-shard,
    never global; shard count grows with the corpus so per-shard state
    stays bounded. The shuffled order is a pure hash of doc_id
    (content-addressed), not rand(): re-runs, retries, and both engines
    agree on every offset.
    """
    n_tok = D.arr_size(D.tokens("text", dialect), dialect)
    shard = f"((doc_id * {D.MULT}) % {_PACK_SHARDS})"
    ord_h = f"((doc_id * {_SHUF_MULT}) % {D.HASH_MOD})"
    pack0 = D.idiv("end_off - n_tokens", _SEQ_LEN, dialect)
    pack_last = D.idiv("end_off - 1", _SEQ_LEN, dialect)
    return f"""
        WITH sized AS (
            SELECT doc_id, {shard} AS shard_id, {ord_h} AS ord_h,
                   {n_tok} AS n_tokens
            FROM {_doc_tbl(dialect)}
        ),
        offs AS (
            SELECT doc_id, shard_id, n_tokens,
                   cast(sum(n_tokens) OVER (
                       PARTITION BY shard_id ORDER BY ord_h, doc_id
                       ROWS UNBOUNDED PRECEDING) as bigint) AS end_off
            FROM sized WHERE n_tokens > 0
        )
        SELECT doc_id, shard_id, n_tokens,
               (end_off - n_tokens) AS start_offset,
               {pack0} AS pack_id,
               ({pack_last} > {pack0}) AS crosses_boundary
        FROM offs
    """


@register("doc_pack_sequences", oracle=_pack_sql(D.DUCK), tags=("extension",))
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack curated documents into fixed 2048-token training sequences
    (concat-and-chunk), per deterministic shard — see _pack_sql for the
    per-shard running-sum scale shape."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_pack_sql(D.SPARK))


# --------------------------------------------------------------------------
# Temperature (UniMax-style) language resampling
# --------------------------------------------------------------------------
_TEMP_MULT = 1885667273  # sampling hash lane


def _temperature_sql(dialect: str) -> str:
    """Temperature-resample the corpus across languages: language l with
    n_l documents gets target share ∝ n_l^(1/T) with T=2 (sqrt — the
    standard flattening that up-weights tail languages), realized as a
    per-document keep probability r_l = min(1, (w_l / Σw) * N / n_l)
    and a content-addressed coin u(doc_id) < r_l.

    Float parity: sqrt is IEEE-correctly-rounded in both engines; the
    Σw fold runs over the languages in lexicographic order (a sequential
    reduce over a sorted list, not a SUM aggregate), so the handful of
    doubles add in the same order everywhere; every later step is the
    same expression tree on identical inputs.

    Scale shape: lang_stats is a tiny aggregate (|langs| rows) broadcast
    back onto the corpus; the keep decision is a per-row map — the whole
    resample is one scan + one broadcast join, no corpus shuffle.
    """
    if dialect == D.SPARK:
        w_sorted = "transform(array_sort(collect_list(struct(lang, w))), s -> s.w)"
    else:
        w_sorted = "list(w ORDER BY lang)"
    wsum_fold = D.arr_sum_double(w_sorted, dialect)
    u = (
        f"(cast((doc_id * {_TEMP_MULT}) % {D.HASH_MOD} as double)"
        f" / {D.HASH_MOD}.0)"
    )
    return f"""
        WITH lang_stats AS (
            SELECT lang, count(*) AS n_l, sqrt(cast(count(*) as double)) AS w
            FROM {_doc_tbl(dialect)} GROUP BY lang
        ),
        tot AS (
            SELECT cast(sum(n_l) as bigint) AS n_total, {wsum_fold} AS wsum
            FROM lang_stats
        ),
        rates AS (
            SELECT s.lang, s.n_l,
                   least(1.0, (s.w / t.wsum) * cast(t.n_total as double)
                              / cast(s.n_l as double)) AS keep_rate
            FROM lang_stats s CROSS JOIN tot t
        )
        SELECT d.doc_id, d.lang, r.keep_rate
        FROM {_doc_tbl(dialect)} d JOIN rates r ON d.lang = r.lang
        WHERE {u} < r.keep_rate
    """


@register("doc_sample_temperature", oracle=_temperature_sql(D.DUCK), tags=("extension",))
def doc_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax-style temperature resampling across languages (T=2):
    deterministic per-document keep decision at a language-dependent
    rate — see _temperature_sql for the float-parity and broadcast
    scale shape."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_temperature_sql(D.SPARK))


# --------------------------------------------------------------------------
# Canonical-copy selection per exact-duplicate group
# --------------------------------------------------------------------------
def _keep_best_sql(dialect: str) -> str:
    """Exact dedup with QUALITY-aware survivor selection: group on the
    md5 of the token-normalized text (lowercased, punctuation-stripped —
    catches trivially reformatted copies raw-text md5 misses), keep the
    highest-quality copy per group (ties → lowest doc_id).

    The reference's dedup keeps an arbitrary first row
    (tanimoto.py:79 drop_duplicates); at training scale the survivor
    choice matters — boilerplate mirrors often have one clean source.

    Scale shape: the shuffle key is a 32-char digest (not the text) and
    the quality score rides along as one double — the wide shuffle
    carries ~40 B/row regardless of document size. One window per
    group picks the argmax.
    """
    from finalpipeline_spark.queries import documents as DOC

    toks = D.tokens("text", dialect)
    norm = D.arr_join("toks", " ", dialect)
    score = DOC._quality_score_expr(dialect)
    return f"""
        WITH scored AS (
            SELECT doc_id, md5({norm}) AS fingerprint, quality_score
            FROM (
                SELECT doc_id, {toks} AS toks, ({score}) AS quality_score
                FROM {_doc_tbl(dialect)}
            ) t WHERE {D.arr_size('toks', dialect)} > 0
        ),
        ranked AS (
            SELECT doc_id, fingerprint, quality_score,
                   row_number() OVER (
                       PARTITION BY fingerprint
                       ORDER BY quality_score DESC, doc_id) AS rn,
                   count(*) OVER (PARTITION BY fingerprint) AS n_copies
            FROM scored
        )
        SELECT doc_id, fingerprint, quality_score,
               cast(n_copies as bigint) AS n_copies
        FROM ranked WHERE rn = 1
    """


@register("doc_dedup_exact_keep_best", oracle=_keep_best_sql(D.DUCK), tags=("extension",))
def doc_dedup_exact_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized-text md5 keeping the highest-quality
    copy per group (not an arbitrary one) — see _keep_best_sql for the
    digest-keyed shuffle shape."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_keep_best_sql(D.SPARK))


# --------------------------------------------------------------------------
# Deterministic global shuffle + sharding (training order)
# --------------------------------------------------------------------------
_N_SHARDS = 8
_ORDER_MULT = 3266489917  # order hash lane


def _shard_sql(dialect: str) -> str:
    """Reproducible training order: every document gets a
    content-addressed shard (hash of doc_id — no shuffle needed to
    assign) and a position within its shard (row_number over a second,
    independent hash lane). Sources interleave naturally because the
    order hash is independent of `source`.

    This is the op that turns a curated corpus into an actual training
    run input: epoch order must be shuffled, reproducible, and
    restartable (position is derivable, not stored state). Per-shard
    window sort only — shard count scales with the corpus, so no global
    sort ever happens.
    """
    shard = f"((doc_id * {D.MULT}) % {_N_SHARDS})"
    ord_h = f"((doc_id * {_ORDER_MULT}) % {D.HASH_MOD})"
    return f"""
        SELECT doc_id, source, shard_id,
               cast(row_number() OVER (
                   PARTITION BY shard_id ORDER BY ord_h, doc_id) as bigint)
                   AS pos_in_shard
        FROM (
            SELECT doc_id, source, {shard} AS shard_id, {ord_h} AS ord_h
            FROM {_doc_tbl(dialect)}
        ) t
    """


@register("doc_shard_interleave", oracle=_shard_sql(D.DUCK), tags=("extension",))
def doc_shard_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: content-addressed shard assignment
    plus in-shard position from an independent hash lane — see
    _shard_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_shard_sql(D.SPARK))


# --------------------------------------------------------------------------
# Watermark semantics, batch twin: late-event classification
# --------------------------------------------------------------------------
_LATE_S = 600  # allowed lateness (the watermark delay)


_ARR_MULT = 2654435761  # Knuth multiplicative hash — arrival-order lane


def _late_sql(dialect: str) -> str:
    """Classify events a 10-minute watermark would drop: per user, in
    arrival order, an event is late iff its event time is more than
    _LATE_S behind the high-watermark (the running max event time over
    everything that arrived before it).

    The testdata's event_id order IS time order (verified: max lateness
    ≤ 0 at every SF), so a literal replay would classify nothing — the
    degenerate single-writer case. Arrival order here is instead a
    deterministic content-addressed permutation of each user's events
    (hash of event_id), modeling multi-source ingestion where arrival
    interleaves out of time order; the permutation is pure hash, so
    re-runs and both engines agree row-for-row.

    This is the batch twin of streaming/windows.py's withWatermark
    pipelines — it quantifies, on historical data, exactly which rows a
    chosen delay would have discarded (how you pick the delay in
    practice). Per-user window only: the running max partitions by
    user, so state is bounded per key like the streaming original.
    """
    es = (
        "ts_epoch_s"
        if dialect == D.SPARK
        else "(epoch_us(ts) // 1000000)"
    )
    tbl = SPARK_EVENTS_VIEW if dialect == D.SPARK else "events"
    arr_h = f"((event_id * {_ARR_MULT}) % {D.HASH_MOD})"
    return f"""
        WITH arr AS (
            SELECT event_id, user_id, {es} AS es, {arr_h} AS arrival_h
            FROM {tbl}
        ),
        wm AS (
            SELECT event_id, user_id, es,
                   max(es) OVER (
                       PARTITION BY user_id ORDER BY arrival_h, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS high_watermark
            FROM arr
        )
        SELECT event_id, user_id, es, high_watermark,
               (high_watermark - es) AS lateness_s
        FROM wm
        WHERE high_watermark - es > {_LATE_S}
    """


@register("events_late_classify", oracle=_late_sql(D.DUCK), tags=("extension",))
def events_late_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data audit for watermark sizing: events arriving more than
    10 minutes behind their user's high-watermark — see _late_sql for
    the bounded-state shape mirroring the streaming original."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(SPARK_EVENTS_VIEW)
    return spark.sql(_late_sql(D.SPARK))


# --------------------------------------------------------------------------
# PII redaction (inject-then-scrub round trip)
# --------------------------------------------------------------------------
_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_IP_PAT = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
_PHONE_PAT = "[0-9]{3}-[0-9]{4}"


def _pii_sql(dialect: str) -> str:
    """PII scrub over the corpus: redact emails, IPv4 addresses, and
    phone-shaped numbers with typed placeholder tokens, reporting per
    document how many of each were removed plus the digest of the
    scrubbed text.

    The synthetic corpus contains no natural PII (verified: zero regex
    hits at every SF), so a plain scrub would be a zero-work no-op that
    any bug survives. Instead the query runs a deterministic
    inject-then-scrub round trip: every third document gets a synthetic
    email/IP/phone derived from its doc_id appended, then the scrubber
    runs over the decorated text. Counts must come back exactly
    (1,1,1)/(0,0,0) and the digests must agree across engines — a
    self-verifying test of the actual regexes, not of the no-op path.

    Regex subset chosen to mean the same thing in Java regex (Spark)
    and RE2 (DuckDB): character classes only, no backslash escapes
    (Spark SQL string literals process backslashes, DuckDB's don't).

    Scale shape: pure per-row map — no shuffle, no UDF; the regexes run
    JVM-side inside whole-stage codegen, which is exactly how a 100 TB
    scrub pass should look (one scan, one write).
    """
    did = D.cast_str("doc_id", dialect)
    oct3 = D.cast_str("(doc_id % 256)", dialect)
    phone = f"lpad({D.cast_str('(doc_id % 10000)', dialect)}, 4, '0')"
    decorated = (
        f"(CASE WHEN doc_id % 3 = 0 THEN text || ' reach user' || {did}"
        f" || '@example.com from 10.' || {oct3} || '.0.1 or 555-' || {phone}"
        " ELSE text END)"
    )
    scrub = D.regex_scrub(
        D.regex_scrub(
            D.regex_scrub("txt", _EMAIL_PAT, "<EMAIL>", dialect),
            _IP_PAT,
            "<IP>",
            dialect,
        ),
        _PHONE_PAT,
        "<PHONE>",
        dialect,
    )
    return f"""
        WITH decorated AS (
            SELECT doc_id, {decorated} AS txt FROM {_doc_tbl(dialect)}
        ),
        scrubbed AS (
            SELECT doc_id,
                   {D.regex_count('txt', _EMAIL_PAT, dialect)} AS n_emails,
                   {D.regex_count('txt', _IP_PAT, dialect)} AS n_ips,
                   {D.regex_count('txt', _PHONE_PAT, dialect)} AS n_phones,
                   {scrub} AS red,
                   txt
            FROM decorated
        )
        SELECT doc_id, n_emails, n_ips, n_phones,
               md5(red) AS redacted_md5,
               (length(txt) - length(red)) AS chars_removed
        FROM scrubbed
    """


@register("doc_pii_redact", oracle=_pii_sql(D.DUCK), tags=("extension",))
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/IP/phone redaction with per-document removal counts,
    exercised as a deterministic inject-then-scrub round trip (the
    corpus has no natural PII) — see _pii_sql for the regex-dialect and
    zero-shuffle scale notes."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_pii_sql(D.SPARK))


# --------------------------------------------------------------------------
# Context-window chunking with overlap
# --------------------------------------------------------------------------
_CHUNK = 64    # tokens per chunk (context window)
_CH_OVERLAP = 16
_CH_STRIDE = _CHUNK - _CH_OVERLAP  # 48


def _chunk_sql(dialect: str) -> str:
    """Split every document into fixed-size token chunks with overlap
    (the RAG/embedding-prep sibling of doc_pack_sequences: packing
    concatenates documents into sequences, chunking splits documents
    into windows). Chunk i covers tokens [i*stride+1, i*stride+chunk];
    n_chunks = ceil((n_tokens - overlap) / stride), so every token is
    covered and consecutive chunks share `overlap` tokens.

    Each chunk reports a rolling hash of its token-hash slice — an
    order-sensitive fingerprint downstream chunk-level dedup can key
    on without carrying text.

    Scale shape: explode of a computed index range — row count grows
    ~n_tokens/stride per doc but each output row carries only (ids,
    hash), never the text; no shuffle, no UDF, codegen end to end.
    """
    toks = D.tokens("text", dialect)
    hashed = D.transform_arr("toks", "t", D.token_hash("t", dialect), dialect)
    n = D.arr_size("hs", dialect)
    nc = D.idiv(f"({n} - {_CH_OVERLAP} + {_CH_STRIDE} - 1)", _CH_STRIDE, dialect)
    start = f"(chunk_id * {_CH_STRIDE} + 1)"
    sl = D.arr_slice("hs", start, _CHUNK, dialect)
    rolling = D.fold_bigint(
        "sl", "cast(0 as bigint)", f"(acc * 131 + x) % {D.HASH_MOD}", dialect
    )
    if dialect == D.SPARK:
        gen = f"explode(sequence(0, cast({nc} as int) - 1))"
    else:
        gen = f"unnest(range(0, {nc}))"
    return f"""
        WITH tok AS (
            SELECT doc_id, {hashed} AS hs FROM (
                SELECT doc_id, {toks} AS toks FROM {_doc_tbl(dialect)}
            ) t WHERE {D.arr_size('toks', dialect)} >= {_CH_OVERLAP + 1}
        ),
        expanded AS (
            SELECT doc_id, hs, {gen} AS chunk_id FROM tok
        ),
        sliced AS (
            SELECT doc_id, cast(chunk_id as bigint) AS chunk_id,
                   {start} AS chunk_start, {sl} AS sl
            FROM expanded
        )
        SELECT doc_id, chunk_id, cast(chunk_start as bigint) AS chunk_start,
               {D.arr_size('sl', dialect)} AS chunk_len,
               {rolling} AS chunk_hash
        FROM sliced
    """


@register("doc_chunk_overlap", oracle=_chunk_sql(D.DUCK), tags=("extension",))
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (64-token windows,
    16-token overlap) plus per-chunk rolling-hash fingerprints — see
    _chunk_sql for coverage guarantees and the no-shuffle scale
    shape."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_chunk_sql(D.SPARK))


# --------------------------------------------------------------------------
# Tokenizer vocabulary induction: coverage curve
# --------------------------------------------------------------------------
_VOCAB_TOP = 100


def _vocab_sql(dialect: str) -> str:
    """The statistic a tokenizer build actually needs: term frequencies
    ranked with a CUMULATIVE COVERAGE curve (what fraction of all token
    occurrences the top-r vocabulary entries explain). Deciding vocab
    size = reading this curve; the top-{_VOCAB_TOP} rows are emitted.

    Determinism: counts are exact integers; the cumulative sum runs
    over (count DESC, term) — a total order — so partial windows agree;
    the single division by the grand total is one identical IEEE op.

    Scale shape: explode → count per term (one shuffle, map-side
    combined); the top-{_VOCAB_TOP} selection is ORDER BY + LIMIT,
    which Spark executes as TakeOrderedAndProject (per-partition heaps,
    no global sort shuffle); the unpartitioned cumulative window then
    runs over only {_VOCAB_TOP} rows — NOT over the full vocabulary,
    which would funnel every term through one task. The grand total is
    a 1-row broadcast.
    """
    toks = D.tokens("text", dialect)
    unnest = "explode(toks)" if dialect == D.SPARK else "unnest(toks)"
    return f"""
        WITH tok AS (
            SELECT {unnest} AS term FROM (
                SELECT {toks} AS toks FROM {_doc_tbl(dialect)}
            ) t
        ),
        tf AS (
            SELECT term, cast(count(*) as bigint) AS cnt
            FROM tok GROUP BY term
        ),
        top AS (
            SELECT term, cnt FROM tf
            ORDER BY cnt DESC, term LIMIT {_VOCAB_TOP}
        ),
        ranked AS (
            SELECT term, cnt,
                   cast(row_number() OVER (ORDER BY cnt DESC, term) as bigint)
                       AS vocab_rank,
                   cast(sum(cnt) OVER (ORDER BY cnt DESC, term
                        ROWS UNBOUNDED PRECEDING) as bigint) AS cum_cnt
            FROM top
        ),
        tot AS (SELECT cast(sum(cnt) as bigint) AS total FROM tf)
        SELECT term, cnt, vocab_rank,
               (cast(cum_cnt as double) / cast(total as double)) AS coverage
        FROM ranked CROSS JOIN tot
    """


@register("doc_vocab_coverage", oracle=_vocab_sql(D.DUCK), tags=("extension",))
def doc_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 vocabulary with cumulative corpus coverage — the curve a
    tokenizer-vocab build reads to pick its size. See _vocab_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_vocab_sql(D.SPARK))


# --------------------------------------------------------------------------
# Source-weighted corpus mixing
# --------------------------------------------------------------------------
_MIX_MULT = 22695477  # Borland LCG multiplier — its own hash lane


def _mix_sql(dialect: str) -> str:
    """Dataset mixing across sources with explicit weights: source s
    gets weight w_s in {1..4} (derived here from the source id — in
    production a literal weight table), realized as keep-rate w_s/4 and
    a content-addressed per-document coin. The deterministic sibling of
    temperature resampling: weights are POLICY (chosen), not derived
    from corpus counts.

    Scale shape: the weight computation is per-row string→int (no join
    at all since the weight is derivable); the decision is one scan.
    With a literal weight table it becomes a broadcast join — still no
    corpus shuffle.
    """
    srcnum = f"cast(regexp_extract(source, '([0-9]+)', 1) as int)"
    w = f"(1 + ({srcnum} % 4))"
    u = (
        f"(cast((doc_id * {_MIX_MULT}) % {D.HASH_MOD} as double)"
        f" / {D.HASH_MOD}.0)"
    )
    return f"""
        SELECT doc_id, source, {w} AS mix_weight,
               (cast({w} as double) / 4.0) AS keep_rate
        FROM {_doc_tbl(dialect)}
        WHERE {u} < (cast({w} as double) / 4.0)
    """


@register("doc_mix_sources", oracle=_mix_sql(D.DUCK), tags=("extension",))
def doc_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-weighted source mixing: per-source keep rates realized by
    a content-addressed coin — see _mix_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_mix_sql(D.SPARK))


# --------------------------------------------------------------------------
# Fixed-size weighted sampling without replacement (Efraimidis–Spirakis)
# --------------------------------------------------------------------------
_WS_K = 100          # sample size
_WS_LN_SCALE = 1_000_000


def _weighted_sample_sql(dialect: str) -> str:
    """Efraimidis–Spirakis A-Res weighted sampling: each row draws a
    deterministic uniform u from its content hash and gets key
    u^(1/w); the k largest keys are the sample, which selects each row
    with probability proportional to its weight w — here n_chars, i.e.
    a length-weighted corpus sample (token-budget-proportional, the
    mixture-building primitive temperature resampling builds on).

    Parity scheme: ranking by u^(1/w) is equivalent to ranking by
    ln(u)/w (w > 0, ln u < 0).  u comes from the md5 avalanche hash
    (u_int ∈ [1, 2^31)), ln(u_int/2^31) is quantized to integer
    micro-nats by floor(·+0.5) — identical in both engines — and the
    key is a single IEEE division of that int by w.  Top-k is a full
    total order (key desc, doc_id), so the cutoff is unambiguous.

    Scale shape: hash + key are per-row maps; the only shuffle is the
    global top-k (TakeOrderedAndProject in Spark — per-partition heaps,
    never a full sort)."""
    md5 = D.md5_hex("text", dialect)
    h31 = D.hex_prefix_to_int("h", dialect)
    qln = (
        f"cast(floor(ln(cast(u as double) / 2147483648.0)"
        f" * {_WS_LN_SCALE}.0 + 0.5) as bigint)"
    )
    return f"""
        WITH hashed AS (
            SELECT doc_id, n_chars, {md5} AS h FROM {_doc_tbl(dialect)}
        ),
        u AS (
            SELECT doc_id, n_chars,
                   (({h31}) % 2147483647) + 1 AS u
            FROM hashed
        ),
        keyed AS (
            SELECT doc_id, n_chars,
                   cast({qln} as double)
                     / ({_WS_LN_SCALE}.0 * cast(n_chars as double)) AS es_key
            FROM u
        )
        SELECT doc_id, n_chars, es_key FROM keyed
        ORDER BY es_key DESC, doc_id
        LIMIT {_WS_K}
    """


@register(
    "doc_weighted_sample_fixed",
    oracle=_weighted_sample_sql(D.DUCK),
    tags=("extension",),
)
def doc_weighted_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size (k=100) weighted sample without replacement,
    inclusion probability ∝ n_chars — deterministic Efraimidis–
    Spirakis keys from the content hash (see _weighted_sample_sql)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_weighted_sample_sql(D.SPARK))
