"""RDKit-gated kernel verification (skips when rdkit is absent).

The fingerprint UDF's RDKit branch (functions/fingerprints.py) is the
one code path nothing in this container executes — these tests pin its
spec (Morgan radius 2, 2048 bits, chirality — reference mpp.py:81-93)
and prove the numpy popcount Tanimoto equals RDKit's own similarity on
the same molecules (reference tanimoto.py:138-139), so a regression in
the real-chemistry path is caught wherever rdkit IS installed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

rdkit = pytest.importorskip("rdkit")

from rdkit import DataStructs  # noqa: E402
from rdkit.Chem import AllChem  # noqa: E402

from finalpipeline_spark.functions.fingerprints import (  # noqa: E402
    FP_BITS,
    NUM_WORDS,
    fingerprint_udf,
    tanimoto_udf,
)

_ASPIRIN = "CC(=O)Oc1ccccc1C(=O)O"
_CAFFEINE = "Cn1cnc2c1c(=O)n(C)c(=O)n2C"
_L_ALANINE = "C[C@@H](N)C(=O)O"
_D_ALANINE = "C[C@H](N)C(=O)O"


def _kernel(series):
    # pandas_udf wraps the plain function; .func is the Arrow-batch kernel
    return fingerprint_udf.func(pd.Series(series))


def _unpack(words) -> set[int]:
    arr = np.asarray(words, dtype=np.int64).view(np.uint64)
    return {
        w * 64 + b for w in range(NUM_WORDS) for b in range(64) if (arr[w] >> np.uint64(b)) & np.uint64(1)
    }


def _reference_fp(smiles: str):
    mol = AllChem.MolFromSmiles(smiles)
    gen = AllChem.GetMorganGenerator(radius=2, fpSize=FP_BITS, includeChirality=True)
    return gen.GetFingerprint(mol)


def test_fingerprint_matches_morgan_spec():
    out = _kernel([_ASPIRIN, _CAFFEINE])
    for smiles, packed in zip([_ASPIRIN, _CAFFEINE], out):
        assert packed is not None and len(packed) == NUM_WORDS
        assert _unpack(packed) == set(_reference_fp(smiles).GetOnBits())


def test_fingerprint_null_on_invalid():
    out = _kernel(["not a smiles(((", None, _ASPIRIN])
    assert out[0] is None and out[1] is None and out[2] is not None


def test_fingerprint_is_chirality_aware():
    l_fp, d_fp = _kernel([_L_ALANINE, _D_ALANINE])
    assert _unpack(l_fp) != _unpack(d_fp)


def test_tanimoto_udf_equals_rdkit_similarity():
    packed = list(_kernel([_ASPIRIN, _CAFFEINE, _L_ALANINE]))
    pairs = [(0, 1), (0, 2), (1, 2), (0, 0)]
    a = pd.Series([packed[i] for i, _ in pairs])
    b = pd.Series([packed[j] for _, j in pairs])
    got = tanimoto_udf.func(a, b).to_numpy()
    smiles = [_ASPIRIN, _CAFFEINE, _L_ALANINE]
    want = [
        DataStructs.TanimotoSimilarity(_reference_fp(smiles[i]), _reference_fp(smiles[j]))
        for i, j in pairs
    ]
    assert np.allclose(got, want, rtol=0, atol=1e-12)
    assert got[-1] == 1.0
