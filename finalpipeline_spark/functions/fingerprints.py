"""Chemistry kernels as Arrow-batched pandas UDFs (SURVEY.md §2.7 F1-F4).

The reference computes RDKit Morgan fingerprints row-by-row in a
process pool capped at one worker (reference mpp.py:64-93, 112-117)
and Tanimoto with a per-row pandas .apply over a Python-object column
(reference tanimoto.py:124-147). Here both kernels are vectorized
pandas UDFs over packed-bitmap columns:

  fingerprint: string (SMILES) → array<bigint> of NUM_WORDS 64-bit
  words (2048 bits, matching the reference's Morgan fpSize).
  RDKit is not installable in this environment, so the Mol-parse +
  Morgan step falls back to a deterministic hash-based fingerprint
  with the same shape and null-on-invalid semantics; the RDKit branch
  activates automatically when the library exists.

  tanimoto: |A∧B| / |A∨B| on packed words via numpy popcount —
  no Python-object bit vectors, no Base64 round-trips (the reference
  serialized ExplicitBitVect via Base64 text, mpp.py:87).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

FP_BITS = 2048
NUM_WORDS = FP_BITS // 64

try:  # optional dependency — real Morgan fingerprints when available
    from rdkit.Chem import AllChem  # type: ignore

    _HAVE_RDKIT = True
except Exception:  # pragma: no cover - rdkit absent in this environment
    _HAVE_RDKIT = False


def _fake_bits_from_string(s: str) -> np.ndarray | None:
    """Deterministic stand-in 'fingerprint': 64 pseudo-random bit
    positions seeded by a rolling hash of the string. Invalid input
    (empty, or containing whitespace — stand-in for an unparsable
    SMILES) → None, mirroring MolFromSmiles → None (mpp.py:64-73)."""
    if not s or any(c.isspace() for c in s):
        return None
    h = 0
    for ch in s:
        h = (h * 131 + ord(ch)) % (1 << 61)
    rng = np.random.default_rng(h)
    return rng.integers(0, FP_BITS, size=64, dtype=np.int64)


def _pack_positions(positions: np.ndarray) -> np.ndarray:
    words = np.zeros(NUM_WORDS, dtype=np.uint64)
    np.bitwise_or.at(
        words, positions // 64, np.left_shift(np.uint64(1), (positions % 64).astype(np.uint64))
    )
    return words.view(np.int64)


# NB: DataType objects (not DDL strings) so import works without an
# active SparkSession.
@pandas_udf(ArrayType(LongType()))
def fingerprint_udf(smiles: pd.Series) -> pd.Series:
    """F1+F2: SMILES → packed 2048-bit fingerprint (null on invalid)."""

    def one(s):
        if s is None:
            return None
        if _HAVE_RDKIT:  # pragma: no cover
            mol = AllChem.MolFromSmiles(s)
            if mol is None:
                return None
            gen = AllChem.GetMorganGenerator(radius=2, fpSize=FP_BITS, includeChirality=True)
            fp = gen.GetFingerprint(mol)
            positions = np.array(list(fp.GetOnBits()), dtype=np.int64)
        else:
            positions = _fake_bits_from_string(s)
            if positions is None:
                return None
        return _pack_positions(positions)

    return smiles.map(one)


# 16-bit popcount lookup table: popcount via one gather per uint16 lane
# instead of np.unpackbits, which materializes 64 bytes per word (8×
# the memory traffic of the 2-byte lanes + uint8 counts used here).
# Exact integer counts either way.
_POP16 = np.unpackbits(
    np.arange(1 << 16, dtype=np.uint16).view(np.uint8)
).reshape(1 << 16, 16).sum(axis=1).astype(np.uint8)


def _popcount_rows(words: np.ndarray) -> np.ndarray:
    """Per-row popcount of an (n, NUM_WORDS) int64 matrix."""
    lanes = np.ascontiguousarray(words).view(np.uint16)
    return _POP16[lanes].sum(axis=-1, dtype=np.int64)


@pandas_udf(DoubleType())
def tanimoto_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """F4: Tanimoto |A∧B|/|A∨B| over packed-word arrays, vectorized."""
    aw = np.vstack(a.to_numpy())
    bw = np.vstack(b.to_numpy())
    inter = _popcount_rows(aw & bw).astype(np.float64)
    union = _popcount_rows(aw | bw).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return pd.Series(out)


def tanimoto(a: Column, b: Column) -> Column:
    return tanimoto_udf(a, b)


# Every consumer filters ``fp IS NOT NULL`` right above the projection,
# and the optimizer duplicates a *deterministic* UDF around such a
# filter on its own output (guide §4.4: one BatchEvalPython below the
# pushed filter + one in the projection → the kernel runs twice per
# row). The function is deterministic in fact — the non-deterministic
# marking only forbids the optimizer to clone or reorder it, halving
# every fingerprint stage. Trade-off (documented §4.4): other filters
# no longer push below the fingerprint projection — every call site
# filters/dedups BEFORE fingerprinting, so nothing is lost.
_fingerprint_nd = fingerprint_udf.asNondeterministic()


def fingerprint(smiles: Column) -> Column:
    return _fingerprint_nd(smiles)
