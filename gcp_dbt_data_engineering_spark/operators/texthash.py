"""Portable text-hashing SQL fragments (Spark SQL + DuckDB dialects).

The dedup/fingerprint operators (SURVEY.md §2 [EXT]; north star
"dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard") need hash
functions that produce *bit-identical* values in Spark (the engine) and
DuckDB (the driver's correctness oracle). Neither engine's built-in
``hash()`` matches the other, so every hash here is plain 64-bit
integer arithmetic over code points — expressible in both dialects and
verified equal (see tests/test_dedup_oracle.py).

Design notes:

- ``polyhash``: left-fold ``acc*31 + code (mod P)`` over characters,
  P = 1e9+7. Spark ``aggregate(..., 0, ...)`` equals DuckDB's
  init-less ``list_reduce`` because ``f(0, h0) = h0``.
- All arithmetic stays in BIGINT and non-negative, so ``%`` semantics
  agree and Spark 4's ANSI overflow checks never trip
  (max intermediate: ``(P-1)*31 + c`` ≈ 3.1e10, and for the affine
  rehash ``a*h`` with ``a, h < P`` ≈ 1e18 < 2^63).
- Fragments are built from one function per concept with a ``dialect``
  parameter so the Spark plan and the DuckDB oracle cannot drift.

At 100 TB these expressions run inside Spark higher-order functions
(interpreted, not codegen) — fine for per-document shingling, which is
O(doc length) work embarrassingly parallel over partitions with no
shuffle; the shuffles happen later on the compact 8-byte hashes.
"""

from __future__ import annotations

#: Fold modulus (prime) shared by every portable hash in the repo.
P = 1_000_000_007

#: Multiplier used to derive the i-th MinHash permutation.
_A0 = 999_999_937  # largest prime < 1e9


def perm_coeffs(i: int) -> tuple[int, int]:
    """(a, b) of the i-th affine hash h -> (a*h+b) % P.

    WARNING: NOT independent across i. ``a_i = (i+1)*_A0 mod P`` and
    ``_A0 ≡ -70 (mod P)``, so every multiplier is a small multiple of
    the same base: all i rank inputs by (70*h mod P) whenever that
    quantity is small, i.e. the family shares argmins. Fine for the
    SINGLE-hash consumers (sampling thresholds, the simhash rehash),
    catastrophic for a multi-permutation signature — use
    :func:`minhash_coeffs` there (see its docstring for the measured
    sf100 failure).
    """
    return ((i + 1) * _A0) % P, i


def _scramble(x: int) -> int:
    """Python-side avalanche for deriving hash-family constants."""
    m = (1 << 61) - 1
    x = (x * 1_103_515_245 + 12_345) & m
    x ^= x >> 29
    x = (x * 69_069 + 1) & m
    x ^= x >> 17
    x = (x * 999_999_937 + 101) & m
    return x ^ (x >> 31)


def minhash_coeffs(i: int) -> tuple[int, int]:
    """(a, b) of the i-th MinHash permutation h -> (a*h+b) % P.

    Multipliers are avalanched functions of i (plain literals once
    emitted into either SQL dialect), so distinct permutations rank
    shingles independently. The previous family (:func:`perm_coeffs`)
    had a_i = -70*(i+1) mod P: every permutation ranked by the same
    g = 70h mod P, so ALL 16 minima came from a doc's lowest-g
    shingle and LSH buckets degenerated to "docs sharing a common
    low-g shingle" — doc-frequency-sized buckets. Measured at the 5M-doc
    sf100 corpus: 7.3e8 pre-distinct candidate pairs, max bucket 7531
    (~ the df of one boilerplate shingle), ENOSPC on a 75 GB disk; at
    a real 100 TB corpus the candidate stage would be ~quadratic.
    Independent multipliers restore P(band collision) ~ jaccard^r.
    """
    a = _scramble(i + 1) % (P - 1) + 1
    b = _scramble(i + 1001) % P
    return a, b


def words(col: str, dialect: str) -> str:
    """Lower-cased alphanumeric word array (no empty tokens).

    NULL text tokenizes to the EMPTY array in both dialects — a
    missing document has zero words, so every downstream count/ratio
    sees 0 rather than a dialect-dependent NULL (Spark's
    regexp_extract_all(NULL) is NULL, DuckDB's len(NULL) is NULL but
    its COUNT/len interplay differs; the COALESCE pins one rule)."""
    if dialect == "spark":
        return (
            f"COALESCE(regexp_extract_all(lower({col}), '[a-z0-9]+', 0),"
            f" array())"
        )
    return f"COALESCE(regexp_extract_all(lower({col}), '[a-z0-9]+'), [])"


def polyhash(s: str, dialect: str) -> str:
    """Portable 64-bit polynomial hash of string expression ``s``."""
    if dialect == "spark":
        codes = f"transform(split({s}, ''), c -> CAST(ascii(c) AS BIGINT))"
        return (
            f"aggregate({codes}, CAST(0 AS BIGINT),"
            f" (acc, c) -> (acc * 31 + c) % {P})"
        )
    # DuckDB divergences the CASE pins to Spark's semantics:
    # string_split('','') is [''] and ord('') is -1 (Spark: ascii('')=0),
    # and list_reduce has no init so a 1-element list returns unreduced —
    # polyhash('') must be 0 in both dialects (and NULL stays NULL).
    codes = f"list_transform(string_split({s}, ''), c -> CAST(ord(c) AS BIGINT))"
    return (
        f"(CASE WHEN ({s}) IS NULL THEN NULL"
        f" WHEN length({s}) = 0 THEN 0"
        f" ELSE list_reduce({codes}, (acc, c) -> (acc * 31 + c) % {P}) END)"
    )


def word_shingles(ws: str, n: int, dialect: str) -> str:
    """Array of n-word shingle strings from word-array expression ``ws``."""
    if dialect == "spark":
        body = (
            f"transform(sequence(0, size({ws}) - {n}),"
            f" i -> concat_ws(' ', slice({ws}, i + 1, {n})))"
        )
        return f"CASE WHEN size({ws}) >= {n} THEN {body} ELSE array() END"
    body = (
        f"list_transform(generate_series(0, len({ws}) - {n}),"
        f" i -> array_to_string(list_slice({ws}, i + 1, i + {n}), ' '))"
    )
    return f"CASE WHEN len({ws}) >= {n} THEN {body} ELSE [] END"


def shingle_hashes(text_col: str, n: int, dialect: str) -> str:
    """Array of portable hashes of the n-word shingles of a text column.

    Two-level: polyhash each word once, then fold the n word-hashes of
    each shingle with the same ``acc*31 + x (mod P)`` recurrence. The
    naive form (polyhash over the characters of each joined shingle
    string) re-hashes every character n times and allocates a string
    per shingle — measured ~6x the CPU of this formulation, which is
    the hot loop of every dedup/contamination operator. Equality
    semantics are unchanged (equal word sequences ⇔ equal hash, modulo
    the same 1/P collision rate).

    The word-hash array is bound once as a lambda variable
    (``transform(array(expr), whs -> ...)``): referencing the array
    expression from each of the n slice arguments would re-evaluate
    the per-word hashing n times — Spark does not CSE interpreted
    higher-order expressions. Spark combines via nested ``zip_with``
    over shifted slices (sequential, codegen-friendly); a non-literal
    subscript ``whs[i+j]`` would fall off the fast path (~12x, see
    text_gopher_repetition).
    """
    whs = word_hashes(text_col, dialect)
    if dialect == "spark":
        m = f"(size(whs) - {n - 1})"
        acc = f"slice(whs, 1, {m})"
        for j in range(2, n + 1):
            acc = (
                f"zip_with({acc}, slice(whs, {j}, {m}),"
                f" (a, b) -> (a * 31 + b) % {P})"
            )
        return (
            f"element_at(transform(array({whs}),"
            f" whs -> CASE WHEN size(whs) >= {n} THEN {acc}"
            f" ELSE array() END), 1)"
        )
    acc = "whs[i]"
    for j in range(1, n):
        acc = f"(({acc}) * 31 + whs[i + {j}]) % {P}"
    return (
        f"list_transform([{whs}],"
        f" whs -> CASE WHEN len(whs) >= {n} THEN"
        f" list_transform(generate_series(1, len(whs) - {n - 1}),"
        f" i -> {acc})"
        f" ELSE [] END)[1]"
    )


def word_hashes(text_col: str, dialect: str) -> str:
    """Array of polyhashes of the individual words of a text column."""
    ws = words(text_col, dialect)
    inner = polyhash("s", dialect)
    if dialect == "spark":
        return f"transform({ws}, s -> {inner})"
    return f"list_transform({ws}, s -> {inner})"


def char_shingle_hashes(text_col: str, n: int, dialect: str) -> str:
    """Array of polyhashes of the character n-grams of a text column.

    Spark branch is O(n) per doc (wave 8): the earlier
    per-position ``substring({text_col}, i, n)`` form re-scans the
    string from byte 0 on EVERY call to find the code-point offset —
    O(i) per gram, quadratic per doc (measured 26 s at a 100k-char
    doc; ~days at the wave-7 10 MB single-token pathology, which
    wedged one executor core exactly the way a pathological crawl doc
    would on a 1000-executor cluster). Instead the char-code array is
    computed ONCE per doc and bound via a 1-element ``transform``
    (SQL's let-binding), and each gram folds n O(1) ``element_at``
    lookups. Byte-identical values: polyhash's 0-init first step is
    ``(0*31 + c0) % P = c0`` since every code point < P, so the
    nested fold equals ``polyhash(substring(...))`` exactly, and
    ``split``/``ascii`` are the same code-point extraction polyhash
    itself uses."""
    if dialect == "spark":
        codes = (
            f"transform(split({text_col}, ''),"
            " ch -> CAST(ascii(ch) AS BIGINT))"
        )
        g = "element_at(cs, i)"
        for k in range(1, n):
            g = f"(({g}) * 31 + element_at(cs, i + {k})) % {P}"
        return (
            f"CASE WHEN length({text_col}) >= {n} THEN"
            f" element_at(transform(array({codes}), cs ->"
            f" transform(sequence(1, length({text_col}) - {n - 1}),"
            f" i -> {g})), 1) ELSE array() END"
        )
    grams = (
        f"CASE WHEN length({text_col}) >= {n} THEN"
        f" list_transform(generate_series(1, length({text_col}) - {n - 1}),"
        f" i -> substr({text_col}, i, {n})) ELSE [] END"
    )
    return f"list_transform({grams}, s -> {polyhash('s', dialect)})"


def char_codes(text_col: str) -> str:
    """DuckDB: per-char code list of ``text_col`` — the O(n) base for
    ``char_gram_hashes_from_codes``. Same codes ``polyhash``'s
    string_split path sees."""
    return (
        f"list_transform(string_split({text_col}, ''),"
        " c -> CAST(ord(c) AS BIGINT))"
    )


def char_gram_hashes_from_codes(codes_col: str, len_col: str, n: int) -> str:
    """DuckDB: char-n-gram polyhashes from a PRE-COMPUTED code list
    (wave 7): the substr-per-position form above is an O(i) code-point
    scan per gram in DuckDB — quadratic overall; measured 21 s at a
    100k-char doc, 315 s at 400k, i.e. weeks at the 10 MB-token
    pathology — so callers hoist ``char_codes`` into a CTE (evaluated
    once per row) and fold each gram over an O(n) list_slice here.
    Byte-identical values: a no-init list_reduce equals the 0-init
    fold (0*31 + c1 = c1). Spark's substring has an all-ASCII fast
    path and measures linear, so the spark branch of
    ``char_shingle_hashes`` stays as is."""
    return (
        f"CASE WHEN {len_col} >= {n} THEN"
        f" list_transform(generate_series(1, {len_col} - {n - 1}),"
        f" i -> list_reduce(list_slice({codes_col}, i, i + {n - 1}),"
        f" (acc, c) -> (acc * 31 + c) % {P})) ELSE [] END"
    )


def xor(a: str, b: str, dialect: str) -> str:
    """Bitwise XOR of two BIGINT expressions."""
    return f"({a} ^ {b})" if dialect == "spark" else f"xor({a}, {b})"


def shiftleft_one(j: str, dialect: str) -> str:
    """``1 << j`` as BIGINT."""
    if dialect == "spark":
        return f"shiftleft(CAST(1 AS BIGINT), {j})"
    return f"(CAST(1 AS BIGINT) << {j})"


def bit(h: str, j: str, dialect: str) -> str:
    """Bit ``j`` (0/1) of non-negative BIGINT expression ``h``."""
    if dialect == "spark":
        return f"(shiftright({h}, {j}) & 1)"
    return f"(({h} >> {j}) & 1)"


def chunk_hashes(text_col: str, n: int, dialect: str) -> str:
    """Array of portable hashes of the NON-overlapping n-word chunks.

    Stride-``n`` counterpart of ``shingle_hashes`` (same two-level
    fold: polyhash each word once, then ``acc*31 + wh (mod P)`` over
    each chunk's word-hashes).  The last chunk may be shorter than
    ``n`` — every word belongs to exactly one chunk, which is what the
    cross-document boilerplate filter needs (CCNet-style paragraph
    dedup adapted to fixed-width chunks; a removed chunk must remove
    its words exactly once).  Chunk count is ``ceil(len/n)`` via
    integer arithmetic; the fold init 0 is a no-op for the first word
    (``f(0, h0) = h0``), so Spark's ``aggregate`` equals DuckDB's
    init-less ``list_reduce`` on every (non-empty) chunk.
    """
    whs_expr = word_hashes(text_col, dialect)
    if dialect == "spark":
        m = f"((size(whs) + {n - 1}) div {n})"
        body = (
            f"transform(sequence(1, {m}),"
            f" i -> aggregate(slice(whs, (i - 1) * {n} + 1, {n}),"
            f" CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % {P}))"
        )
        return (
            f"element_at(transform(array({whs_expr}),"
            f" whs -> CASE WHEN size(whs) >= 1 THEN {body}"
            f" ELSE array() END), 1)"
        )
    m = f"((len(whs) + {n - 1}) // {n})"
    body = (
        f"list_transform(generate_series(1, {m}),"
        f" i -> list_reduce(list_slice(whs, (i - 1) * {n} + 1,"
        f" (i - 1) * {n} + {n}), (a, b) -> (a * 31 + b) % {P}))"
    )
    return (
        f"list_transform([{whs_expr}],"
        f" whs -> CASE WHEN len(whs) >= 1 THEN {body} ELSE [] END)[1]"
    )
