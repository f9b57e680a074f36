"""Dual-dialect expression builders (Spark SQL + DuckDB).

The driver verifies every query against a DuckDB oracle by value-hash,
so any non-trivial scalar logic (tokenization, deterministic hashing,
shingling, LSH planes) must produce *bit-identical* results in both
engines. These builders emit the same computation in each dialect from
one definition, so the Spark implementation and its oracle can't drift.

All hashing here is plain 64-bit integer arithmetic (no engine hash()
builtins — Spark xxhash64 and DuckDB hash are different algorithms).
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"

# Large multiplier (Knuth) and Mersenne-ish moduli kept small enough that
# every intermediate stays < 2^62 in 64-bit integer arithmetic.
MULT = 2654435761
POS_MOD = 1048573
HASH_MOD = 1000003


def tokens(col: str, dialect: str) -> str:
    """Lowercased alnum word tokens of a text column (empty-safe)."""
    if dialect == SPARK:
        return (
            f"filter(split(lower(regexp_replace({col}, '[^A-Za-z0-9]+', ' ')), ' '),"
            " x -> x != '')"
        )
    return (
        f"list_filter(string_split(lower(regexp_replace({col}, '[^A-Za-z0-9]+', ' ', 'g')), ' '),"
        " x -> x != '')"
    )


def char_positional_hash(s: str, dialect: str) -> str:
    """Deterministic 64-bit hash of a string: sum_i code(c_i) * w(i).

    Position-weighted but order-independent in summation (exact integer
    adds), so partial aggregation order can't change the result.
    """
    if dialect == SPARK:
        # split + indexed transform, NOT substr(s, i, 1) per position:
        # UTF8String.substring re-walks the string from the start on
        # every call (O(chars) per access, interpreted HOF), measured
        # 5× slower on sf0.1 documents (1.69 → 0.35 s for the full-text
        # fingerprint pass). Exact equality of the two forms verified
        # over every testdata SF and on multibyte/unicode probes —
        # split('') yields the same code-point sequence substr indexes.
        return (
            f"aggregate(transform(split({s}, ''), (c, i) -> "
            f"cast(ascii(c) as bigint)"
            f" * (((cast(i as bigint) + 1) * {MULT}) % {POS_MOD})), "
            f"cast(0 as bigint), (acc, x) -> acc + x)"
        )
    return (
        f"cast(list_sum(list_transform(range(1, length({s}) + 1), "
        f"i -> ord(substr({s}, i, 1)) * ((i * {MULT}) % {POS_MOD}))) as bigint)"
    )


def transform_arr(arr: str, var: str, body: str, dialect: str) -> str:
    fn = "transform" if dialect == SPARK else "list_transform"
    return f"{fn}({arr}, {var} -> {body})"


def filter_arr(arr: str, var: str, body: str, dialect: str) -> str:
    fn = "filter" if dialect == SPARK else "list_filter"
    return f"{fn}({arr}, {var} -> {body})"


def arr_size(arr: str, dialect: str) -> str:
    """Array length as bigint in both dialects."""
    if dialect == SPARK:
        return f"cast(size({arr}) as bigint)"
    return f"cast(len({arr}) as bigint)"


def arr_min(arr: str, dialect: str) -> str:
    return f"array_min({arr})" if dialect == SPARK else f"list_min({arr})"


def arr_distinct(arr: str, dialect: str) -> str:
    return f"array_distinct({arr})" if dialect == SPARK else f"list_distinct({arr})"


def arr_sum_bigint(arr: str, dialect: str) -> str:
    """Exact integer sum of a bigint array."""
    if dialect == SPARK:
        return f"aggregate({arr}, cast(0 as bigint), (acc, x) -> acc + x)"
    return f"cast(list_sum({arr}) as bigint)"


def arr_sum_double(arr: str, dialect: str) -> str:
    """Sequential (left-fold) double sum — same add order in both engines."""
    if dialect == SPARK:
        return f"aggregate({arr}, cast(0 as double), (acc, x) -> acc + x)"
    return f"list_reduce(list_prepend(cast(0 as double), {arr}), (acc, x) -> acc + x)"


def seq(lo: str | int, hi_inclusive: str | int, dialect: str) -> str:
    """Integer sequence [lo, hi] inclusive."""
    if dialect == SPARK:
        return f"sequence({lo}, {hi_inclusive})"
    return f"range({lo}, ({hi_inclusive}) + 1)"


def arr_index(arr: str, one_based_idx: str, dialect: str) -> str:
    """1-based element access."""
    if dialect == SPARK:
        return f"element_at({arr}, {one_based_idx})"
    return f"list_extract({arr}, {one_based_idx})"


def arr_join(arr: str, sep: str, dialect: str) -> str:
    """Join a string array with a separator."""
    if dialect == SPARK:
        return f"array_join({arr}, '{sep}')"
    return f"array_to_string({arr}, '{sep}')"


def idiv(a: str, b: str | int, dialect: str) -> str:
    """Integer (floor-toward-zero) division of nonnegative bigints."""
    if dialect == SPARK:
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def cast_str(x: str, dialect: str) -> str:
    """Integer → string cast."""
    if dialect == SPARK:
        return f"cast({x} as string)"
    return f"cast({x} as varchar)"


def fold_bigint(arr: str, seed: str, acc_body: str, dialect: str) -> str:
    """Left fold over a bigint array: acc_body uses (acc, x).

    Order-DEPENDENT by design (rolling hashes); both engines fold
    left-to-right over the same array, so results are identical.
    """
    if dialect == SPARK:
        return f"aggregate({arr}, {seed}, (acc, x) -> {acc_body})"
    return f"list_reduce(list_prepend({seed}, {arr}), (acc, x) -> {acc_body})"


def regex_count(s: str, pattern: str, dialect: str) -> str:
    """Number of non-overlapping matches of pattern in s, as bigint.

    Patterns must avoid backslash escapes (Spark SQL string literals
    process them, DuckDB's don't) — use [.] and [0-9] style classes.
    """
    if dialect == SPARK:
        return f"cast(size(regexp_extract_all({s}, '{pattern}', 0)) as bigint)"
    return f"cast(len(regexp_extract_all({s}, '{pattern}')) as bigint)"


def regex_scrub(s: str, pattern: str, replacement: str, dialect: str) -> str:
    """Replace ALL matches of pattern with replacement."""
    if dialect == SPARK:
        return f"regexp_replace({s}, '{pattern}', '{replacement}')"
    return f"regexp_replace({s}, '{pattern}', '{replacement}', 'g')"


def arr_slice(arr: str, start_1based: str, length: int, dialect: str) -> str:
    """length-bounded slice from a 1-based start position (clamped)."""
    if dialect == SPARK:
        return f"slice({arr}, {start_1based}, {length})"
    return f"list_slice({arr}, {start_1based}, ({start_1based}) + {length} - 1)"


def jaccard(a: str, b: str, dialect: str) -> str:
    """Jaccard similarity of two pre-distinct arrays, as double.

    Spark mapping of the reference's Tanimoto |A∧B|/|A∨B|
    (reference tanimoto.py:138-139) onto set-valued columns.
    """
    if dialect == SPARK:
        inter = f"cast(size(array_intersect({a}, {b})) as double)"
        union = f"cast(size(array_union({a}, {b})) as double)"
    else:
        inter = f"cast(len(list_intersect({a}, {b})) as double)"
        union = f"cast(len(list_distinct(list_concat({a}, {b}))) as double)"
    return f"({inter} / {union})"


def containment(a: str, b: str, dialect: str) -> str:
    """Containment C(A,B) = |A∩B| / |A| of two pre-distinct arrays, as
    double — the asymmetric companion of :func:`jaccard` that stays
    high when A is a SUBSET of a much larger B (truncated copies,
    quoted excerpts), which symmetric Jaccard dilutes toward zero."""
    if dialect == SPARK:
        inter = f"cast(size(array_intersect({a}, {b})) as double)"
        denom = f"cast(size({a}) as double)"
    else:
        inter = f"cast(len(list_intersect({a}, {b})) as double)"
        denom = f"cast(len({a}) as double)"
    return f"({inter} / {denom})"


def dot(a: str, b: str, dim: int, dialect: str) -> str:
    """Dot product of two float arrays (cast to double, sequential sum).

    Spark side fuses the product into the fold — one aggregate() over
    the (constant-folded) index sequence instead of materializing a
    dim-sized product array per pair first. The multiply/add sequence
    is unchanged (acc + a_i*b_i, left-to-right), so results stay
    bit-identical with the DuckDB two-step form."""
    if dialect == SPARK:
        return (
            f"aggregate({seq(1, dim, SPARK)}, cast(0 as double), "
            f"(acc, i) -> acc + cast({arr_index(a, 'i', SPARK)} as double)"
            f" * cast({arr_index(b, 'i', SPARK)} as double))"
        )
    prods = transform_arr(
        seq(1, dim, dialect),
        "i",
        f"cast({arr_index(a, 'i', dialect)} as double)"
        f" * cast({arr_index(b, 'i', dialect)} as double)",
        dialect,
    )
    return arr_sum_double(prods, dialect)


def md5_hex(col: str, dialect: str) -> str:
    """Lowercase-hex md5 of a column's string form — identical bytes in
    both engines (Spark md5() and DuckDB md5() both emit lowercase hex,
    and integer→string casts agree)."""
    if dialect == SPARK:
        return f"md5(cast({col} as string))"
    return f"md5(cast({col} as varchar))"


def hex_prefix_to_int(hexcol: str, dialect: str) -> str:
    """First 8 hex digits of an (already-computed) hex-string column,
    folded positionally (acc*16 + digit) into a 32-bit integer, reduced
    mod 2^31.

    Paired with :func:`md5_hex` this gives a uniform 31-bit hash with
    full avalanche — required for sketches whose math consumes bit
    patterns (HLL rho, CMS rows) rather than just bucket assignment; the
    multiplicative LCG hashes above are fine for MinHash banding but
    structurally biased for leading-zero statistics.  Callers should
    stage the md5 in its own projection so it is computed once, not once
    per folded digit (lambda bodies are outside common-subexpression
    elimination in both engines).
    """
    if dialect == SPARK:
        fold = (
            f"aggregate(sequence(1,8), cast(0 as bigint), (acc,i) -> acc*16 + "
            f"cast(instr('0123456789abcdef', substr({hexcol}, i, 1)) - 1 as bigint))"
        )
    else:
        fold = (
            f"list_reduce(list_prepend(cast(0 as bigint), list_transform(range(1,9), "
            f"i -> cast(strpos('0123456789abcdef', substr({hexcol},i,1)) - 1 as bigint))), "
            f"(acc,x) -> acc*16 + x)"
        )
    return f"(({fold}) % 2147483648)"


def token_hash(tok: str, dialect: str) -> str:
    """Token → integer in [0, HASH_MOD) via the positional char hash."""
    return f"({char_positional_hash(tok, dialect)} % {HASH_MOD})"


def minhash_sig_ints(hashed_arr: str, coeffs: list[tuple[int, int]], dialect: str) -> str:
    """MinHash signature array over an already-hashed integer array.

    One min per (a, b) hash family h(x) = (a*x + b) % HASH_MOD. All
    intermediates < HASH_MOD^2 ≈ 1e12 — exact in int64 in both engines.
    """
    mins = ", ".join(
        arr_min(
            transform_arr(hashed_arr, "x", f"(({a} * x + {b}) % {HASH_MOD})", dialect),
            dialect,
        )
        for a, b in coeffs
    )
    return f"array({mins})" if dialect == SPARK else f"[{mins}]"


def shingle_hashes(hs_col: str, dialect: str) -> str:
    """3-gram shingle hashes from a token-hash array column.

    Combines consecutive token hashes arithmetically instead of
    re-hashing shingle strings — O(1) per shingle vs O(chars). The
    caller must ensure len(hs) >= 3 (Spark guarded by CASE; DuckDB's
    empty range/NULL indexing is already safe).
    """
    body = (
        f"(({arr_index(hs_col, 'i', dialect)} * 131"
        f" + {arr_index(hs_col, 'i + 1', dialect)} * 31"
        f" + {arr_index(hs_col, 'i + 2', dialect)}) % {HASH_MOD})"
    )
    if dialect == SPARK:
        inner = f"transform(sequence(1, size({hs_col}) - 2), i -> {body})"
        return f"(CASE WHEN size({hs_col}) >= 3 THEN {inner} ELSE array() END)"
    return f"list_transform(range(1, greatest(len({hs_col}) - 2, 0) + 1), i -> {body})"
