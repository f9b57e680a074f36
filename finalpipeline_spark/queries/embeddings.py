"""Similarity search over the embeddings table (array<float>, dim 64).

Three tiers, mirroring how an ANN system is built at 100 TB:
  * brute-force cosine top-k (the exact baseline; queries broadcast)
  * random-hyperplane LSH bucketing (the candidate-generation path —
    planes are deterministic literals shared with the oracle)
  * per-cluster centroids (the IVF coarse-quantizer building block)

All dot products are computed as a *sequential* left-fold over double-
cast elements in both engines, then rounded at the output, so the
DuckDB oracle hashes identically.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions.frames import local_df
from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.functions.caching import scoped_cache
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

DIM = 64
_N_PLANES = 8

_rng = random.Random(42424242)
# Deterministic hyperplanes, embedded as literals in BOTH dialects.
PLANES = [
    [round(_rng.gauss(0.0, 1.0), 6) for _ in range(DIM)] for _ in range(_N_PLANES)
]


SPARK_VIEW = "__fps_embeddings"


def _emb_tbl(dialect: str) -> str:
    return SPARK_VIEW if dialect == D.SPARK else "embeddings"


def _arr_lit(vals: list[float], dialect: str) -> str:
    body = ", ".join(f"cast({v!r} as double)" for v in vals)
    return f"array({body})" if dialect == D.SPARK else f"[{body}]"


def _cosine(a: str, b: str, dialect: str) -> str:
    dot = D.dot(a, b, DIM, dialect)
    na = D.dot(a, a, DIM, dialect)
    nb = D.dot(b, b, DIM, dialect)
    return f"({dot} / sqrt({na} * {nb}))"


def _normed_sql(dialect: str) -> str:
    """Per-vector staging: id, embedding, squared norm (computed once,
    not per pair)."""
    nrm = D.dot("embedding", "embedding", DIM, dialect)
    return f"SELECT vec_id, label, embedding, {nrm} AS nrm FROM {_emb_tbl(dialect)}"


def _topk_sql(dialect: str, d_rel: str | None = None) -> str:
    # Norms are staged per vector (computed once), not per pair — the
    # pairwise work is a single dot product. Identical staging in the
    # oracle keeps values bit-identical. `d_rel` names a pre-staged
    # (cached + repartitioned) Spark relation; None inlines the CTE
    # for the DuckDB oracle.
    d = d_rel or "d"
    dot = D.dot("q.embedding", "e.embedding", DIM, dialect)
    cos = f"({dot} / sqrt(q.nrm * e.nrm))"
    rn_cast = "cast(rn as int)" if dialect == D.SPARK else "rn::int"
    with_d = "" if d_rel else f"d AS ({_normed_sql(dialect)}),\n        "
    return f"""
        WITH {with_d}scored AS (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   {cos} AS cosine
            FROM (SELECT * FROM {d} WHERE vec_id % 50 = 0) q
            JOIN {d} e ON q.vec_id != e.vec_id
        )
        SELECT query_id, neighbor_id, cosine, {rn_cast} AS rn
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
            FROM scored
        ) t WHERE rn <= 5
    """


@register("emb_cosine_topk", oracle=_topk_sql(D.DUCK), tags=("extension", "headline"))
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for the query subset
    (vec_id % 50 == 0): broadcast queries × full scan — the exact-ANN
    baseline. Ranking uses the rounded score + id tiebreak so order is
    engine-stable.

    The normed table is staged (cached + repartitioned) so the pair
    scoring parallelizes across cores instead of riding the single
    input file's lone partition, and norms aren't recomputed for the
    query side."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(SPARK_VIEW)
    d = scoped_cache(
        spark.sql(_normed_sql(D.SPARK)).repartition(
            spark.sparkContext.defaultParallelism, "vec_id"
        ),
        "emb_cosine_topk",
    )
    d.createOrReplaceTempView("__fps_emb_normed")
    return spark.sql(_topk_sql(D.SPARK, d_rel="__fps_emb_normed"))


def _lsh_bucket_expr(vec: str, dialect: str) -> str:
    """Bucket id = bitmask of sign(plane · vec) over the 8 planes."""
    terms = []
    for i, plane in enumerate(PLANES):
        dot = D.dot(_arr_lit(plane, dialect), vec, DIM, dialect)
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _lsh_sql(dialect: str) -> str:
    bucket = _lsh_bucket_expr("embedding", dialect)
    cnt = "count(*)"
    return f"""
        SELECT bucket, {cnt} AS n_vectors,
               count(DISTINCT label) AS n_labels
        FROM (SELECT {bucket} AS bucket, label FROM {_emb_tbl(dialect)}) t
        GROUP BY bucket
    """


@register("emb_lsh_buckets", oracle=_lsh_sql(D.DUCK), tags=("extension",))
def emb_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8-bit bucket per vector. At scale this is
    the shuffle key for bucketed ANN joins — only same-bucket (or
    neighboring-bucket) pairs get scored, collapsing n² to collisions."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_lsh_sql(D.SPARK))


@register(
    "emb_ivf_centroids",
    oracle="""
        SELECT label, dim_i, round(avg(component), 6) AS centroid_component,
               count(*) AS n_vectors
        FROM (
            SELECT label,
                   generate_subscripts(embedding, 1) - 1 AS dim_i,
                   unnest(embedding)::double AS component
            FROM embeddings
        ) t
        GROUP BY label, dim_i
    """,
    tags=("extension",),
)
def emb_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer building block: per-cluster centroid via
    posexplode + group-by (label stands in for the assignment). One
    shuffle of (cluster, dim) partial sums — no vector collect."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim_i", "component"))
        .select(
            "label",
            F.col("dim_i").cast("bigint").alias("dim_i"),
            F.col("component").cast("double").alias("component"),
        )
        .groupBy("label", "dim_i")
        .agg(
            F.round(F.avg("component"), 6).alias("centroid_component"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


# --------------------------------------------------------------------------
# IVF search: probe the coarse quantizer, scan only the probed lists
# --------------------------------------------------------------------------
_NPROBE = 2
_IVF_K = 5


def _ivf_topk_sql(dialect: str, d_rel: str | None = None) -> str:
    """Full IVF-flat search, end to end, in one plan:

      1. centroids = per-label mean vectors (the emb_ivf_centroids
         building block, re-assembled into arrays; components rounded
         to 6dp so both engines agree bit-for-bit despite their
         different float-summation orders),
      2. each query probes its _NPROBE nearest centroids (by dot
         product — a tiny cross join: |queries| x |labels|),
      3. exact cosine is computed ONLY against vectors in the probed
         inverted lists — the 100 TB path, where the full scan of
         emb_cosine_topk is replaced by reading ~nprobe/nlist of the
         data, with `label` as the partition key.

    Recall loss vs the brute-force baseline is the IVF trade; the
    oracle checks the Spark plan computes exactly this approximation.
    """
    if dialect == D.SPARK:
        # Deliberately explode from the RAW view, not the staged/cached
        # relation: the centroid aggregation is then an independent
        # parquet-scan branch that runs concurrently with the normed-
        # table cache build instead of serializing behind it (A/B
        # measured: reading centroids through the cache costs +50% on
        # this query).
        expl = f"""
            SELECT label, posexplode(embedding) AS (dim_i, component)
            FROM {_emb_tbl(dialect)}
        """
        assemble = "transform(array_sort(collect_list(struct(dim_i, c))), s -> s.c)"
        rn_cast = "cast(rn as int)"
    else:
        expl = f"""
            SELECT label, generate_subscripts(embedding, 1) - 1 AS dim_i,
                   unnest(embedding)::double AS component
            FROM {_emb_tbl(dialect)}
        """
        assemble = "list(c ORDER BY dim_i)"
        rn_cast = "rn::int"
    d = d_rel or "d"
    cdot = D.dot("q.embedding", "c.cv", DIM, dialect)
    edot = D.dot("q.embedding", "e.embedding", DIM, dialect)
    with_d = "" if d_rel else f"d AS ({_normed_sql(dialect)}),\n        "
    return f"""
        WITH {with_d}expl AS ({expl}),
        cent AS (
            SELECT label, dim_i, round(avg(cast(component as double)), 6) AS c
            FROM expl GROUP BY label, dim_i
        ),
        cvec AS (SELECT label, {assemble} AS cv FROM cent GROUP BY label),
        q AS (SELECT * FROM {d} WHERE vec_id % 50 = 0),
        probe AS (
            SELECT vec_id, label FROM (
                SELECT q.vec_id, c.label,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {cdot} DESC, c.label) AS pr
                FROM q CROSS JOIN cvec c
            ) t WHERE pr <= {_NPROBE}
        ),
        scored AS (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   ({edot} / sqrt(q.nrm * e.nrm)) AS cosine
            FROM probe p
            JOIN q ON q.vec_id = p.vec_id
            JOIN {d} e ON e.label = p.label
            WHERE e.vec_id != q.vec_id
        )
        SELECT query_id, neighbor_id, cosine, {rn_cast} AS rn
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
            FROM scored
        ) t WHERE rn <= {_IVF_K}
    """


# --------------------------------------------------------------------------
# Scalar quantization (vector compression for ANN at scale)
# --------------------------------------------------------------------------
def _quantize_sql(dialect: str) -> str:
    """Per-vector uint8 scalar quantization: q_i = floor((x_i - mn) *
    255/(mx - mn)), clamped. Every step is min/max selection, one
    subtract, one multiply, one floor — all exactly-rounded IEEE ops,
    so both engines emit identical integers with no rounding step.
    Constant vectors (mx == mn) quantize to 0 via the scale guard.
    """
    if dialect == D.SPARK:
        mn, mx = "array_min(embedding)", "array_max(embedding)"
        arr_max = "array_max"
    else:
        mn, mx = "list_min(embedding)", "list_max(embedding)"
        arr_max = "list_max"
    x = f"cast({D.arr_index('embedding', 'i', dialect)} as double)"
    qd = f"least(floor(({x} - mn) * scale), cast(255 as double))"
    qs = D.transform_arr(
        D.seq(1, DIM, dialect), "i", f"cast({qd} as bigint)", dialect
    )
    staged = f"""
        SELECT vec_id, label, embedding,
               cast({mn} as double) AS mn, cast({mx} as double) AS mx,
               CASE WHEN {mx} > {mn}
                    THEN cast(255 as double) / (cast({mx} as double) - cast({mn} as double))
                    ELSE cast(0 as double) END AS scale
        FROM {_emb_tbl(dialect)}
    """
    sat = D.arr_size(D.filter_arr("qs", "q", "q = 255", dialect), dialect)
    cast_int = "cast({x} as int)" if dialect == D.SPARK else "({x})::int"
    return f"""
        WITH staged AS ({staged}),
        quant AS (SELECT vec_id, label, mn, mx, {qs} AS qs FROM staged)
        SELECT vec_id, label, mn, mx,
               {D.arr_sum_bigint("qs", dialect)} AS q_sum,
               {cast_int.format(x=f"{arr_max}(qs)")} AS q_max,
               {cast_int.format(x=sat)} AS n_saturated
        FROM quant
    """


@register("emb_scalar_quantize_int8", oracle=_quantize_sql(D.DUCK), tags=("extension",))
def emb_scalar_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uint8 scalar quantization of the embedding column — the
    compression step that makes 100 TB of float32 vectors fit the ANN
    serving tier (4× smaller + SIMD-friendly integer distance). Pure
    per-row map (no shuffle); emits per-vector integer checksums
    (q_sum, q_max, saturation count) plus the mn/mx dequant params.
    """
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_quantize_sql(D.SPARK))


@register("emb_ivf_topk", oracle=_ivf_topk_sql(D.DUCK), tags=("extension", "headline"))
def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-k: probe _NPROBE nearest centroids,
    exact-cosine only the probed inverted lists (see _ivf_topk_sql).
    At cluster scale the lists are parquet partitions keyed by label,
    so the probe prunes the scan itself, not just the join."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(SPARK_VIEW)
    d = scoped_cache(
        spark.sql(_normed_sql(D.SPARK)).repartition(
            spark.sparkContext.defaultParallelism, "vec_id"
        ),
        "emb_ivf_topk",
    )
    d.createOrReplaceTempView("__fps_emb_normed")
    return spark.sql(_ivf_topk_sql(D.SPARK, d_rel="__fps_emb_normed"))


# --------------------------------------------------------------------------
# Distributed covariance of the leading embedding dims (PCA preprocessing)
# --------------------------------------------------------------------------
_COV_K = 8  # leading dims profiled
_COV_SCALE = 1 << 20  # fixed-point quantization of float components
_MOMENTS_VIEW = "__fps_emb_moments"


def _cov_moments_sql(dialect: str) -> str:
    """One-row exact moment aggregate: n, first moments s_i, and the
    upper-triangle product moments p_ij of the 2^20-quantized leading
    components.  Products fit int64 (|q| < 2^20 ⇒ |q_i q_j| < 2^40);
    sums accumulate in decimal/int128, so the row is exact at any n —
    this is the associative state a 1000-executor covariance needs
    (partials merge by add; one shuffle of a single row per partition).
    """
    t = _emb_tbl(dialect)
    q = [
        f"cast(round({D.arr_index('embedding', str(i), dialect)} * {_COV_SCALE}) as bigint)"
        for i in range(1, _COV_K + 1)
    ]
    dec = "decimal(38,0)" if dialect == D.SPARK else "hugeint"
    sums = [f"cast(count(*) as {dec}) AS n"]
    sums += [
        f"cast(sum(cast(q{i} as {dec})) as {dec}) AS s{i}" for i in range(1, _COV_K + 1)
    ]
    sums += [
        f"cast(sum(cast(q{i} * q{j} as {dec})) as {dec}) AS p{i}_{j}"
        for i in range(1, _COV_K + 1)
        for j in range(i, _COV_K + 1)
    ]
    quant_cols = ", ".join(f"{expr} AS q{i}" for i, expr in enumerate(q, start=1))
    return f"""
        SELECT {", ".join(sums)}
        FROM (SELECT {quant_cols} FROM {t}) quant
    """


def _cov_report_sql(moments: str, dialect: str) -> str:
    """36-row (i, j, cov) report off the (already-built) moment row:
    cov_ij = (n·p_ij − s_i·s_j) / (n²·SCALE²), numerator exact, one
    double division per cell."""
    den = f"(cast(n as double) * cast(n as double) * {float(_COV_SCALE * _COV_SCALE)!r})"
    branches = [
        f"""
        SELECT {i} AS i, {j} AS j,
               cast(n * p{i}_{j} - s{i} * s{j} as double) / {den} AS cov
        FROM {moments}"""
        for i in range(1, _COV_K + 1)
        for j in range(i, _COV_K + 1)
    ]
    return " UNION ALL ".join(branches)


def _cov_oracle() -> str:
    return f"""
        WITH moments AS ({_cov_moments_sql(D.DUCK)}),
        body AS ({_cov_report_sql("moments", D.DUCK)})
        SELECT * FROM body ORDER BY i, j
    """


@register("emb_covariance_prefix", oracle=_cov_oracle(), tags=("extension",))
def emb_covariance_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-moment covariance matrix of the leading 8 embedding dims —
    the PCA/whitening preprocessing statistic, computed as one
    associative moment aggregation (decimal-exact partials, so results
    are bit-stable under any partitioning — float cov() is not).  The
    Spark path materializes the 1-row moment aggregate before the
    36-branch report (Spark re-evaluates CTEs per reference)."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(SPARK_VIEW)
    spark.sql(_cov_moments_sql(D.SPARK)).localCheckpoint(
        eager=True
    ).createOrReplaceTempView(_MOMENTS_VIEW)
    return spark.sql(_cov_report_sql(_MOMENTS_VIEW, D.SPARK) + " ORDER BY i, j")


# --------------------------------------------------------------------------
# Cluster-quality sign-off: centroid-based (simplified) silhouette
# --------------------------------------------------------------------------
_SIL_SAMPLE_MOD = 20  # deterministic 1-in-20 vector sample


def _silhouette_sql(dialect: str) -> str:
    """Per-cluster simplified-silhouette profile: for each sampled
    vector, a = distance to its OWN cluster centroid, b = distance to
    the nearest OTHER centroid, s = (b−a)/max(a,b) — the
    centroid-based silhouette (Vendramin et al.'s simplified variant),
    which costs |sample|·|clusters| centroid distances instead of the
    full-silhouette |n|² pairwise pass. The quality sign-off next to
    emb_ivf_centroids/emb_kmeans_lloyd: negative s = vector closer to
    another centroid than its own (misassigned under the clustering).

    Exactness: centroid components round to 6dp (engine-identical
    despite float-summation order, the emb_ivf_topk scheme); each
    a/b/s is ONE fixed IEEE expression per row; the per-cluster rollup
    uses only order-independent aggregates over identical doubles —
    exact counts of sign buckets and min/max — never a cross-row float
    sum. Scale shape: the cross join is |sample| × |clusters| (tiny at
    any data size — cluster count is the index parameter), own/other
    resolution is one (vec, cluster)-keyed aggregation."""
    if dialect == D.SPARK:
        expl = f"""
            SELECT label, posexplode(embedding) AS (dim_i, component)
            FROM {_emb_tbl(dialect)}
        """
        assemble = "transform(array_sort(collect_list(struct(dim_i, c))), s -> s.c)"
    else:
        expl = f"""
            SELECT label, generate_subscripts(embedding, 1) - 1 AS dim_i,
                   unnest(embedding)::double AS component
            FROM {_emb_tbl(dialect)}
        """
        assemble = "list(c ORDER BY dim_i)"
    xx = D.dot("s.embedding", "s.embedding", DIM, dialect)
    xc = D.dot("s.embedding", "c.cv", DIM, dialect)
    cc = D.dot("c.cv", "c.cv", DIM, dialect)
    return f"""
        WITH expl AS ({expl}),
        cent AS (
            SELECT label, dim_i, round(avg(cast(component as double)), 6) AS c
            FROM expl GROUP BY label, dim_i
        ),
        cvec AS (SELECT label, {assemble} AS cv FROM cent GROUP BY label),
        s AS (
            SELECT vec_id, label AS own, embedding
            FROM {_emb_tbl(dialect)} WHERE vec_id % {_SIL_SAMPLE_MOD} = 0
        ),
        dists AS (
            SELECT s.vec_id, s.own, c.label AS clabel,
                   sqrt({xx} - 2 * {xc} + {cc}) AS dist
            FROM s CROSS JOIN cvec c
        ),
        pv AS (
            SELECT vec_id, own,
                   min(CASE WHEN clabel = own THEN dist END) AS a,
                   min(CASE WHEN clabel <> own THEN dist END) AS b
            FROM dists GROUP BY vec_id, own
        ),
        sil AS (
            SELECT vec_id, own, a, b,
                   (b - a) / nullif(greatest(a, b), 0.0) AS s
            FROM pv
        )
        SELECT own AS label,
               cast(count(*) as bigint) AS n_sampled,
               cast(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) as bigint)
                   AS n_misassigned,
               cast(sum(CASE WHEN s > 0.25 THEN 1 ELSE 0 END) as bigint)
                   AS n_well_separated,
               min(s) AS min_s,
               max(s) AS max_s
        FROM sil
        GROUP BY own
    """


@register("emb_silhouette", oracle=_silhouette_sql(D.DUCK), tags=("extension",))
def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette profile per cluster — the clustering
    quality sign-off (misassignment and separation counts, silhouette
    range) over a deterministic sample. See _silhouette_sql."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_silhouette_sql(D.SPARK))


# --------------------------------------------------------------------------
# PCA top principal direction via exact-integer power iteration
# --------------------------------------------------------------------------
_PCA_K = 16  # leading dims decomposed
_PCA_ITERS = 16
_PCA_CSCALE = 1 << 30  # covariance fixed-point scale
_PCA_VSCALE = 1 << 20  # iterate fixed-point scale


def _pca_moments_sql(dialect: str) -> str:
    """Exact moment row over the leading _PCA_K dims: n, s_i, and the
    FULL upper triangle p_ij — the same associative single-row
    aggregate shape as _cov_moments_sql, widened to the PCA block.
    Distributed cost: one scan, map-side partials, a one-row shuffle —
    the only data-sized work PCA needs."""
    t = _emb_tbl(dialect)
    q = [
        f"cast(round({D.arr_index('embedding', str(i), dialect)} * {_COV_SCALE}) as bigint)"
        for i in range(1, _PCA_K + 1)
    ]
    dec = "decimal(38,0)" if dialect == D.SPARK else "hugeint"
    sums = [f"cast(count(*) as {dec}) AS n"]
    sums += [
        f"cast(sum(cast(q{i} as {dec})) as {dec}) AS s{i}"
        for i in range(1, _PCA_K + 1)
    ]
    sums += [
        f"cast(sum(cast(q{i} * q{j} as {dec})) as {dec}) AS p{i}_{j}"
        for i in range(1, _PCA_K + 1)
        for j in range(i, _PCA_K + 1)
    ]
    quant_cols = ", ".join(f"{expr} AS q{i}" for i, expr in enumerate(q, start=1))
    return f"""
        SELECT {", ".join(sums)}
        FROM (SELECT {quant_cols} FROM {t}) quant
    """


def _pca_tdiv(t: str, v: str, m: str, dialect: str = D.DUCK) -> str:
    """SQL for sign(t) * (|t| * v // m): truncating division applied to
    the magnitude, so DuckDB's truncate-toward-zero `//`, Spark's
    truncating `div`, and Python's floor `//` (applied to
    non-negatives, where all agree) compute the identical integer."""
    op = "//" if dialect == D.DUCK else "div"
    return (
        f"CASE WHEN {t} >= 0 THEN ({t} * {v}) {op} {m} "
        f"ELSE -((-({t}) * {v}) {op} {m}) END"
    )


def _pca_oracle() -> str:
    """Chained-CTE power iteration, hugeint-exact end-to-end.

    cmat quantizes the covariance numerators (num_ij = n*p_ij - s_i*s_j,
    exact) onto _PCA_CSCALE; each iteration computes nv = C*v in exact
    integers, picks the max-|component| scale m and the sign of the
    first component achieving it, and rescales back onto _PCA_VSCALE
    with sign-magnitude truncating division. Every operation is integer
    arithmetic on exactly the same values the Spark path's driver loop
    computes, so results hash identically bit-for-bit."""
    K, V = _PCA_K, _PCA_VSCALE
    tri = []
    for i in range(1, K + 1):
        for j in range(i, K + 1):
            tri.append(
                f"SELECT {i} AS i, {j} AS j, "
                f"n * p{i}_{j} - s{i} * s{j} AS num FROM moments"
            )
    num_union = " UNION ALL ".join(tri)
    den = f"(SELECT n * n * {_COV_SCALE} * {_COV_SCALE} AS d FROM moments)"
    cdiv = _pca_tdiv("t.num", str(_PCA_CSCALE), "d.d")
    ctes = [
        # MATERIALIZED: the 136 tri branches each reference moments; without
        # it DuckDB inlines the CTE and re-scans the parquet per branch
        f"moments AS MATERIALIZED ({_pca_moments_sql(D.DUCK)})",
        f"tri AS MATERIALIZED ({num_union})",
        f"cmat AS MATERIALIZED (SELECT i, j, {cdiv} AS cq FROM tri t, {den} d "
        "UNION ALL "
        f"SELECT j AS i, i AS j, {cdiv} AS cq FROM tri t, {den} d "
        "WHERE t.i <> t.j)",
        "v0 AS MATERIALIZED (SELECT i, cast(%d as hugeint) AS val FROM range(1, %d) r(i))"
        % (V, K + 1),
    ]
    for t in range(_PCA_ITERS):
        ctes.append(
            f"nv{t} AS MATERIALIZED (SELECT c.i AS i, sum(c.cq * v.val) AS nv "
            f"FROM cmat c JOIN v{t} v ON c.j = v.i GROUP BY c.i)"
        )
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT max(abs(nv)) AS m, "
            f"(SELECT CASE WHEN nv >= 0 THEN 1 ELSE -1 END FROM nv{t} "
            f"WHERE abs(nv) = (SELECT max(abs(nv)) FROM nv{t}) "
            f"ORDER BY i LIMIT 1) AS sgn FROM nv{t})"
        )
        vdiv = _pca_tdiv(f"(m.sgn * nv.nv)", str(V), "m.m")
        ctes.append(
            f"v{t + 1} AS MATERIALIZED (SELECT nv.i AS i, {vdiv} AS val FROM nv{t} nv, m{t} m)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT cast(i as int) AS dim_i, cast(val as bigint) AS loading "
        f"FROM v{_PCA_ITERS} ORDER BY dim_i"
    )


@register("emb_pca_power", oracle=_pca_oracle(), tags=("extension",))
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the leading 16 embedding dims by
    power iteration — PCA the way a 1000-executor cluster does it: ONE
    distributed pass builds the exact integer moment row (map-side
    partials, one-row shuffle; the same associative state as
    emb_covariance_prefix), then the iteration runs on the K×K matrix
    — constant-sized driver state, zero further data I/O. All
    arithmetic is integer-exact (quantized covariance, sign-magnitude
    truncating rescale), so the result is bit-stable under any
    partitioning and hashes identically with the DuckDB oracle.
    Returns the final iterate (dim_i, loading) at 2^20 fixed-point."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(SPARK_VIEW)
    row = spark.sql(_pca_moments_sql(D.SPARK)).collect()[0]
    K, V = _PCA_K, _PCA_VSCALE
    n = int(row["n"])
    s = [int(row[f"s{i}"]) for i in range(1, K + 1)]
    den = n * n * _COV_SCALE * _COV_SCALE

    def tdiv(t: int, v: int, m: int) -> int:
        return (abs(t) * v // m) * (1 if t >= 0 else -1)

    cq = [[0] * K for _ in range(K)]
    for i in range(1, K + 1):
        for j in range(i, K + 1):
            num = n * int(row[f"p{i}_{j}"]) - s[i - 1] * s[j - 1]
            cq[i - 1][j - 1] = cq[j - 1][i - 1] = tdiv(num, _PCA_CSCALE, den)
    v = [V] * K
    for _ in range(_PCA_ITERS):
        nv = [sum(cq[i][j] * v[j] for j in range(K)) for i in range(K)]
        m = max(abs(x) for x in nv)
        sgn = next(
            (1 if nv[i] >= 0 else -1) for i in range(K) if abs(nv[i]) == m
        )
        v = [tdiv(sgn * x, V, m) for x in nv]
    return local_df(
        spark, [(i + 1, v[i]) for i in range(K)], "dim_i int, loading bigint"
    )


# --------------------------------------------------------------------------
# PC1 projection histogram (embedding-drift primitive)
# --------------------------------------------------------------------------
_PCA_BUCKET = 1 << 38  # histogram bucket width in score units


def _pca_scores_oracle() -> str:
    """Extends the power-iteration chain: every vector's exact-integer
    projection onto the final iterate, bucketed into a histogram —
    (bucket, n, min_score, max_score), all int64-exact, the shape a
    100 TB embedding-drift monitor aggregates per batch."""
    K = _PCA_K
    q = [
        f"cast(round({D.arr_index('embedding', str(i), D.DUCK)} * {_COV_SCALE}) as bigint)"
        for i in range(1, K + 1)
    ]
    dot = " + ".join(
        f"q{i} * (SELECT val FROM v{_PCA_ITERS} WHERE i = {i})"
        for i in range(1, K + 1)
    )
    bdiv = _pca_tdiv("s.score", "1", str(_PCA_BUCKET))
    base = _pca_oracle()
    # reuse the full WITH chain; swap the final SELECT for the
    # projection pipeline
    chain = base[: base.rindex("\nSELECT ")]
    quant_cols = ", ".join(f"{e} AS q{i}" for i, e in enumerate(q, start=1))
    return f"""{chain},
        quant AS MATERIALIZED (SELECT vec_id, {quant_cols} FROM embeddings),
        scores AS MATERIALIZED (SELECT vec_id, {dot} AS score FROM quant),
        bucketed AS (SELECT cast({bdiv} as bigint) AS bucket, score FROM scores s)
        SELECT bucket, cast(count(*) as bigint) AS n,
               cast(min(score) as bigint) AS min_score,
               cast(max(score) as bigint) AS max_score
        FROM bucketed GROUP BY bucket ORDER BY bucket
    """


@register("emb_pca_scores", oracle=_pca_scores_oracle(), tags=("extension",))
def emb_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of every embedding's projection onto the top principal
    direction — the per-batch statistic an embedding-drift monitor
    compares across ingestion windows. The direction comes from the
    same exact-integer power iteration as emb_pca_power (constant
    driver work); the projection pass is ONE scan with a 16-term
    integer dot product per row (|q|<2^20, |v|<=2^20, 16 terms
    => |score| < 2^45, exact) and a bucket-count shuffle bounded by the
    bucket range, not the data. Bit-identical to the DuckDB oracle."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(SPARK_VIEW)
    row = spark.sql(_pca_moments_sql(D.SPARK)).collect()[0]
    K, V = _PCA_K, _PCA_VSCALE
    n = int(row["n"])
    s = [int(row[f"s{i}"]) for i in range(1, K + 1)]
    den = n * n * _COV_SCALE * _COV_SCALE

    def tdiv(t: int, v: int, m: int) -> int:
        return (abs(t) * v // m) * (1 if t >= 0 else -1)

    cq = [[0] * K for _ in range(K)]
    for i in range(1, K + 1):
        for j in range(i, K + 1):
            num = n * int(row[f"p{i}_{j}"]) - s[i - 1] * s[j - 1]
            cq[i - 1][j - 1] = cq[j - 1][i - 1] = tdiv(num, _PCA_CSCALE, den)
    v = [V] * K
    for _ in range(_PCA_ITERS):
        nv = [sum(cq[i][j] * v[j] for j in range(K)) for i in range(K)]
        m = max(abs(x) for x in nv)
        sgn = next(
            (1 if nv[i] >= 0 else -1) for i in range(K) if abs(nv[i]) == m
        )
        v = [tdiv(sgn * x, V, m) for x in nv]
    dot = " + ".join(
        f"cast(round({D.arr_index('embedding', str(i), D.SPARK)} * {_COV_SCALE}) as bigint)"
        f" * {v[i - 1]}L"
        for i in range(1, K + 1)
    )
    bdiv = _pca_tdiv("score", "1", str(_PCA_BUCKET), D.SPARK)
    return spark.sql(f"""
        SELECT bucket, cast(count(*) as bigint) AS n,
               cast(min(score) as bigint) AS min_score,
               cast(max(score) as bigint) AS max_score
        FROM (
            SELECT cast({bdiv} as bigint) AS bucket, score
            FROM (SELECT {dot} AS score FROM {SPARK_VIEW})
        ) GROUP BY bucket ORDER BY bucket
    """)


# --------------------------------------------------------------------------
# Contrastive hard-negative mining
# --------------------------------------------------------------------------
def _hard_neg_sql(dialect: str, d_rel: str | None = None) -> str:
    """Per anchor (the emb_cosine_topk query subset): the top-1
    SAME-label neighbor (the positive) and the top-1 DIFFERENT-label
    neighbor (the hard negative — close in embedding space, different
    semantics: exactly the pair a contrastive trainer wants), plus the
    margin between them. One ranked pass partitioned by
    (anchor, label-match flag) yields both in a single window.

    Scale shape: this exact form is the brute-force baseline (broadcast
    anchors × one corpus scan — the emb_cosine_topk shape); at 100 TB
    the candidate set comes from the IVF/LSH index (plans/
    incremental_ann, queries/semantic) and this query is the RESCORING
    of those candidates — same SQL, index-bounded input. The margin is
    a difference of two identically-built doubles, so both engines emit
    bit-equal values."""
    d = d_rel or "d"
    dot = D.dot("q.embedding", "e.embedding", DIM, dialect)
    cos = f"({dot} / sqrt(q.nrm * e.nrm))"
    with_d = "" if d_rel else f"d AS ({_normed_sql(dialect)}),\n        "
    return f"""
        WITH {with_d}scored AS (
            SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
                   e.vec_id AS cand_id, e.label AS cand_label,
                   {cos} AS cosine
            FROM (SELECT * FROM {d} WHERE vec_id % 50 = 0) q
            JOIN {d} e ON q.vec_id != e.vec_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY anchor_id,
                             (CASE WHEN cand_label = anchor_label
                                   THEN 1 ELSE 0 END)
                ORDER BY cosine DESC, cand_id) AS rn
            FROM scored
        )
        SELECT p.anchor_id,
               p.cand_id AS positive_id,
               p.cosine AS positive_cos,
               n.cand_id AS hard_negative_id,
               n.cosine AS hard_negative_cos,
               (p.cosine - n.cosine) AS margin
        FROM (SELECT * FROM ranked
              WHERE rn = 1 AND cand_label = anchor_label) p
        JOIN (SELECT * FROM ranked
              WHERE rn = 1 AND cand_label != anchor_label) n
          ON p.anchor_id = n.anchor_id
    """


@register("emb_hard_negatives", oracle=_hard_neg_sql(D.DUCK), tags=("extension",))
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining: per anchor, the nearest same-label
    vector (positive) and the nearest different-label vector (hard
    negative) with their margin — the data-prep step for contrastive /
    metric-learning fine-tuning. See _hard_neg_sql for the scale shape
    (at 100 TB this rescoreds IVF/LSH candidates, not the full corpus)."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(SPARK_VIEW)
    d = scoped_cache(
        spark.sql(_normed_sql(D.SPARK)).repartition(
            spark.sparkContext.defaultParallelism, "vec_id"
        ),
        "emb_hard_negatives",
    )
    d.createOrReplaceTempView("__fps_emb_normed_hn")
    return spark.sql(_hard_neg_sql(D.SPARK, d_rel="__fps_emb_normed_hn"))
