"""In-engine linear-probe training + cross-document repeated-span
profile — tests beyond the automatic oracle parity (which already
covers both at the suite's SF): does the probe actually LEARN the
label, and do the exact-integer magnitudes hold at sf0.1 (the hugeint
audit in queries/curation._probe_dets, proven rather than asserted).
"""

from __future__ import annotations

import pytest

from finalpipeline_spark.oracle import compare, run_oracle
from finalpipeline_spark.queries import curation as C

SF01 = "/root/testdata/sf0.1"


def _stats(df) -> dict[str, int]:
    return {r["stat"]: int(r["value"]) for r in df.collect()}


def test_probe_learns_the_label(spark, sf_dir):
    """Sanity that the least-squares solve is a real fit, not noise:
    training accuracy beats the majority class ('en' is ~44% of docs,
    so majority-vote accuracy is ~56%) and the feature weights are not
    all zero."""
    s = _stats(C.doc_quality_linear_probe(spark, sf_dir))
    n = s["n"]
    assert n > 0
    acc = (s["tp"] + s["tn"]) / n
    majority = max(s["tp"] + s["fn"], s["fp"] + s["tn"]) / n
    assert acc >= majority - 0.02, (acc, majority)
    assert any(s[k] != 0 for k in ("w_ntok", "w_mwl16", "w_efreq"))
    assert s["tp"] + s["fp"] + s["fn"] + s["tn"] == n


def test_probe_exact_at_sf01(spark):
    """The magnitude audit, proven: at sf0.1 (10x the driver-gate SF)
    every Leibniz term still fits hugeint and the engines stay
    bit-identical. A DuckDB overflow would error, a near-overflow
    truncation would hash-mismatch — either fails here."""
    compare(
        C.doc_quality_linear_probe(spark, SF01),
        run_oracle(C._probe_oracle(), SF01),
    )


def test_det4_matches_reference():
    """The shared Leibniz enumeration against a known determinant."""
    m = [[2, 0, 0, 0], [0, 3, 0, 0], [0, 0, 5, 0], [0, 0, 0, 7]]
    assert C._det4_int(m) == 210
    m = [[1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12], [13, 14, 15, 16]]
    assert C._det4_int(m) == 0  # rank-2
    m = [[4, 1, 0, 2], [1, 3, 1, 0], [0, 1, 2, 1], [2, 0, 1, 5]]
    # cofactor-expansion value, computed independently by hand/numpy
    import numpy as np

    assert C._det4_int(m) == round(float(np.linalg.det(np.array(m))))


def test_spans_invariants(spark, sf_dir):
    """Structural invariants of the repeated-span profile: coverage
    never exceeds the token total, the fixed-point fraction is exactly
    covered*2^20 div tokens, and every source appears once."""
    rows = C.doc_crossdoc_repeated_spans(spark, sf_dir).collect()
    assert len(rows) == len({r["source"] for r in rows})
    for r in rows:
        assert 0 <= r["covered_total"] <= r["tok_total"]
        assert r["covered_frac_fp"] == (
            r["covered_total"] * C._SPAN_FP
        ) // max(r["tok_total"], 1)


@pytest.mark.parametrize("texts,expect_covered", [
    # two docs sharing a verbatim 5-token span: all 5 tokens covered in
    # both; the unique tails are not
    (["a b c d e x", "a b c d e y"], {1: 5, 2: 5}),
    # no cross-doc repeat (within-doc repeats don't count: distinct docs)
    (["p q r s t p q r s t", "u v w x y"], {1: 0, 2: 0}),
])
def test_spans_kernel(spark, texts, expect_covered, tmp_path):
    """Differential kernel check on hand-built corpora (the oracle
    parity proves engine equality; this proves the SEMANTICS)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": list(range(1, len(texts) + 1)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    d = tmp_path / "kernel"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    out = C.doc_crossdoc_repeated_spans(spark, str(d)).collect()
    assert len(out) == 1
    total_covered = sum(expect_covered.values())
    assert out[0]["covered_total"] == total_covered
