"""Python UDTFs (table-valued functions) — Spark 4's lateral-expansion
API surface.

The reference expanded rows with per-row Python loops inside pandas
(e.g. its SMILES→fingerprint expansion, tanimoto.py:74-90, one output
row per parsed candidate). Spark's native answer for row→rows is a
UDTF used in a LATERAL join: ``SELECT d.doc_id, c.* FROM docs d,
LATERAL chunk_text(d.text) c``.

Rules of engagement (same as the rest of the repo): built-in
explode/HOF SQL remains the hot path — the oracle-checked
``doc_chunk_overlap`` query does this exact chunking in pure codegen.
The UDTF form exists for the cases SQL genuinely can't express
(stateful per-row expansion, third-party parsers) and as API parity,
and tests pin it row-for-row to the SQL-native equivalent so the two
paths can never drift.

Both UDTFs are Arrow-optimized (``useArrow=True``): batched transfer,
not row-at-a-time pickling.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_SIZE = 80
CHUNK_OVERLAP = 20


@udtf(returnType="chunk_id int, chunk string, n_chars int", useArrow=True)
class ChunkText:
    """Fixed-size overlapping character chunks of one text: stride =
    size - overlap, last partial chunk kept. One input row → ceil(n /
    stride) output rows."""

    def eval(self, text: str | None):  # noqa: D102
        if not text:
            return
        stride = CHUNK_SIZE - CHUNK_OVERLAP
        i, chunk_id = 0, 0
        while i < len(text):
            piece = text[i : i + CHUNK_SIZE]
            yield chunk_id, piece, len(piece)
            if i + CHUNK_SIZE >= len(text):
                break
            i += stride
            chunk_id += 1


@udtf(returnType="token string, pos int", useArrow=True)
class PosTokenize:
    """Whitespace tokens with their position — the UDTF shape of
    ``posexplode(split(...))``, pinned to it by test."""

    def eval(self, text: str | None):  # noqa: D102
        if text is None:
            return
        for pos, tok in enumerate(t for t in text.split(" ") if t):
            yield tok, pos


def register_udtfs(spark) -> None:
    """Expose the UDTFs to SQL as ``chunk_text`` / ``pos_tokenize``."""
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("pos_tokenize", PosTokenize)
