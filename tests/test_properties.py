"""Property-based tests (hypothesis): the window-based tie-flag
operator must agree with a direct Python transcription of the
reference's per-group pandas logic (datamart.py:28-47) on arbitrary
score multisets — including adversarial near-tie values."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from finalpipeline_spark.operators.tiebreak import top_k_with_tie_flag

RTOL, ATOL = 1e-5, 1e-8
K = 5


def _isclose(x: float, v: float) -> bool:
    return abs(x - v) <= ATOL + RTOL * abs(v)


def _reference_model(scores: list[float], k: int) -> tuple[list[int], int]:
    """Direct transcription of the reference: sort desc (stable by id),
    head k, flag = overall isclose-count of the cutoff score if it
    differs from the in-top count, else 0."""
    order = sorted(range(len(scores)), key=lambda i: (-scores[i], i))
    top = order[:k]
    last = min(scores[i] for i in top)
    cnt_top = sum(1 for i in top if _isclose(scores[i], last))
    cnt_all = sum(1 for s in scores if _isclose(s, last))
    flag = cnt_all if cnt_all != cnt_top else 0
    return sorted(top), flag


# Score pools that provoke ties and near-ties around the k boundary.
score_strategy = st.lists(
    st.one_of(
        st.sampled_from([1.0, 2.0, 2.0 + 5e-9, 2.0 + 5e-7, 3.0, 3.00000001]),
        st.floats(min_value=0.0, max_value=10.0, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=12, deadline=None)
@given(scores=score_strategy)
def test_tie_flag_matches_reference_model(spark, scores):
    df = spark.createDataFrame(
        [(1, i, float(s)) for i, s in enumerate(scores)],
        "g long, id long, score double",
    )
    out = top_k_with_tie_flag(df, ["g"], "score", ["id"], k=K).collect()
    got_ids = sorted(r.id for r in out)
    got_flags = {r.has_duplicates_of_last_largest_score for r in out}
    exp_ids, exp_flag = _reference_model(scores, K)
    assert got_ids == exp_ids, (scores, got_ids, exp_ids)
    assert got_flags == {exp_flag}, (scores, got_flags, exp_flag)
