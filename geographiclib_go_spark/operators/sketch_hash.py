"""Deterministic, SQL-mirrorable sketch hashing (engine-added).

Every text sketch the engine ships (MinHash shingle sets, SimHash
token votes, rolling document fingerprints) hashes through explicit
polynomial arithmetic over Unicode code points modulo 31-bit primes.
Two properties drive the design:

1. **Vectorized** — each kernel operates on the concatenated
   code-point stream of a whole Arrow batch (one ``utf-32`` decode
   per document, then pure numpy int64 array arithmetic).  No
   per-document Python loops, no per-byte interpreter arithmetic:
   the only Python-level loops range over the shingle width, the
   token width, or the number of hash permutations — all constants
   independent of the data size.
2. **Oracle-exact** — the identical arithmetic is emitted as ANSI
   SQL by the ``*_oracle_sql`` builders (per-permutation constants
   inlined as VALUES tables), so DuckDB can recompute signatures,
   LSH band keys, candidate pairs, and the exact verify filters on
   the same parquet and the driver's value-hash comparison checks
   the banding joins end to end.

Arithmetic stays exactly representable on both engines: all
intermediate products fit in signed 64-bit (hash values < 2^31,
multipliers < 2^31, code points < 2^21), so numpy int64 and SQL
BIGINT agree bit for bit.

Definitions (mirrored in SQL):

- code points: ``cp(s, i)`` = Unicode code point of the i-th char.
- 31-bit polynomial hash over a window ``W`` of k code points:
  ``poly(W; B, P) = (sum_j cp_j * B^(k-1-j)) mod P``.
- shingle hash (width k): ``h1 = poly(W; B1, P1)``; the *wide* hash
  ``H = h1 * P2 + poly(W; B2, P2)`` (< 2^62) backs exact-Jaccard
  sets and fingerprints where collisions must be negligible.
  Documents shorter than k contribute the single shingle {h1=0,H=0}.
- MinHash permutation j: ``m_j = (a_j * h1 + b_j) mod P1`` with
  (a_j, b_j) from the splitmix64 stream (inlined into the SQL).
- token: maximal run of non-whitespace code points, whitespace =
  {9, 10, 11, 12, 13, 32}; hashed over its first TOKEN_MAX chars as
  ``t1 = poly(tok; B1, P1)``, ``t2 = poly(tok; B2, P2)`` (Horner).
- SimHash bit j: ``g_j(t) = (u_j*t1 mod P1 + v_j*t2 mod P1 + w_j)
  mod P1``; the token votes +1 when g_j is odd else -1 (weighted by
  multiplicity); bit_j = 1 iff the vote sum is > 0.  Documents with
  no tokens get signature 0.
- fingerprint (window w): ``min`` of the wide hash H over all
  w-char windows; documents shorter than w hash their full text.
"""

from __future__ import annotations

import numpy as np

from geographiclib_go_spark.sources.images import splitmix64

P1 = 2147483647          # 2^31 - 1 (prime)
P2 = 2147483629          # largest prime < P1
B1 = 131
B2 = 137
TOKEN_MAX = 64           # tokens hash over their first TOKEN_MAX chars
_WS = (9, 10, 11, 12, 13, 32)
WS_REGEX = "[ \\t\\n\\v\\f\\r]+"


def _pow_mod(base: int, mod: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    v = 1
    for m in range(n):
        out[m] = v
        v = (v * base) % mod
    return out


def minhash_params(num_hashes: int):
    """(a, b) int64 arrays for the j-th permutation (a in [1, P1-1],
    b in [0, P1-1]) — derived from fixed splitmix64 streams so Spark
    executors and the SQL builder agree without broadcast."""
    j = np.arange(num_hashes, dtype=np.uint64)
    a = (splitmix64(j + np.uint64(0x51AB1)) % np.uint64(P1 - 1)
         + np.uint64(1)).astype(np.int64)
    b = (splitmix64(j + np.uint64(0xB0B0B)) % np.uint64(P1)).astype(np.int64)
    return a, b


def simhash_params(bits: int = 64):
    """(u, v, w) int64 arrays for the per-bit token mixers."""
    j = np.arange(bits, dtype=np.uint64)
    u = (splitmix64(j + np.uint64(0x5E0A1)) % np.uint64(P1 - 1)
         + np.uint64(1)).astype(np.int64)
    v = (splitmix64(j + np.uint64(0x7C0C3)) % np.uint64(P1 - 1)
         + np.uint64(1)).astype(np.int64)
    w = (splitmix64(j + np.uint64(0x93D7F)) % np.uint64(P1)).astype(np.int64)
    return u, v, w


# --------------------------------------------------------------------------
# batch (Arrow-batch) kernels — the Spark side
# --------------------------------------------------------------------------

def batch_codes(texts):
    """Concatenated code-point stream of a batch.

    Returns (codes int64[N], lens int64[n]): per-document lengths and
    one flat array of Unicode code points.  One C-level utf-32 encode
    per document is the only per-document work.
    """
    enc = [(s if isinstance(s, str) else "").encode("utf-32-le")
           for s in texts]
    n = len(enc)
    lens = np.fromiter((len(e) >> 2 for e in enc), dtype=np.int64, count=n)
    buf = b"".join(enc)
    codes = np.frombuffer(buf, dtype="<u4").astype(np.int64)
    return codes, lens


def window_hashes(codes: np.ndarray, lens: np.ndarray, k: int):
    """(h1, hw, doc) for every k-code window inside one document, in
    stream order.  h1 is the 31-bit minhash base; hw the 62-bit wide
    hash.  Documents shorter than k contribute nothing here (callers
    inject the {0} sentinel)."""
    N = int(codes.size)
    n = int(lens.size)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    if N < k:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    pow1 = _pow_mod(B1, P1, k)
    pow2 = _pow_mod(B2, P2, k)
    m = N - k + 1
    h1 = np.zeros(m, dtype=np.int64)
    h2 = np.zeros(m, dtype=np.int64)
    for j in range(k):           # loop over the window width only
        c = codes[j:m + j]
        h1 += c * pow1[k - 1 - j]
        h2 += c * pow2[k - 1 - j]
    h1 %= P1
    h2 %= P2
    valid = doc_of[:m] == doc_of[k - 1:N]
    h1 = h1[valid]
    hw = h1 * np.int64(P2) + h2[valid]
    return h1, hw, doc_of[:m][valid]


def shingle_sets(texts, k: int):
    """Per-document sorted-unique shingle hashes.

    Returns (h1, hw, offs): parallel arrays sliced per document by
    offs (len n+1); uniqueness is on the wide hash hw.  Documents
    shorter than k get the single sentinel shingle (0, 0)."""
    codes, lens = batch_codes(texts)
    n = int(lens.size)
    h1, hw, doc = window_hashes(codes, lens, k)
    short = np.nonzero(lens < k)[0]
    if short.size:
        z = np.zeros(short.size, dtype=np.int64)
        h1 = np.concatenate([h1, z])
        hw = np.concatenate([hw, z])
        doc = np.concatenate([doc, short])
    order = np.lexsort((hw, doc))
    h1, hw, doc = h1[order], hw[order], doc[order]
    first = np.r_[True, (doc[1:] != doc[:-1]) | (hw[1:] != hw[:-1])]
    h1, hw, doc = h1[first], hw[first], doc[first]
    counts = np.bincount(doc, minlength=n)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return h1, hw, offs


def minhash_sigs(texts, num_hashes: int, shingle: int) -> np.ndarray:
    """(n_docs, num_hashes) int64 MinHash signature matrix — one
    vectorized (permute, segmented-min) pass per hash function."""
    h1, _hw, offs = shingle_sets(texts, shingle)
    n = offs.size - 1
    sig = np.empty((n, num_hashes), dtype=np.int64)
    if n == 0:
        return sig
    a, b = minhash_params(num_hashes)
    starts = offs[:-1]
    for j in range(num_hashes):
        vals = (a[j] * h1 + b[j]) % P1
        sig[:, j] = np.minimum.reduceat(vals, starts)
    return sig


def jaccard_pairs(texts_a, texts_b, shingle: int) -> np.ndarray:
    """Exact Jaccard over wide-hash shingle sets, one value per
    (texts_a[i], texts_b[i]) pair."""
    _h1a, hwa, offa = shingle_sets(texts_a, shingle)
    _h1b, hwb, offb = shingle_sets(texts_b, shingle)
    n = offa.size - 1
    out = np.zeros(n)
    for i in range(n):           # candidate pairs only — tiny sets
        x = hwa[offa[i]:offa[i + 1]]
        y = hwb[offb[i]:offb[i + 1]]
        inter = np.intersect1d(x, y, assume_unique=True).size
        union = x.size + y.size - inter
        out[i] = np.float64(inter) / union if union else 0.0
    return out


def tokenize_stream(codes: np.ndarray, lens: np.ndarray):
    """Whitespace tokenization on the code stream.

    Returns (start int64[T], length int64[T], doc int64[T]) for every
    token (maximal non-whitespace run within one document), in stream
    order (so tokens are grouped by document)."""
    n = int(lens.size)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    ws = np.isin(codes, np.array(_WS, dtype=np.int64))
    nonws = ~ws
    prev_nonws = np.concatenate([[False], nonws[:-1]])
    prev_doc = np.concatenate([[-1], doc_of[:-1]])
    starts_mask = nonws & (~prev_nonws | (prev_doc != doc_of))
    start = np.nonzero(starts_mask)[0].astype(np.int64)
    tok_id = np.cumsum(starts_mask) - 1
    length = np.bincount(tok_id[nonws], minlength=start.size) \
        .astype(np.int64)
    doc = doc_of[start] if start.size else np.empty(0, dtype=np.int64)
    return start, length, doc


def token_hashes(codes: np.ndarray, start: np.ndarray,
                 length: np.ndarray):
    """(t1, t2) polynomial hashes per token (Horner over the first
    TOKEN_MAX chars; the loop ranges over the max token width)."""
    L = np.minimum(length, TOKEN_MAX)
    t1 = np.zeros(start.size, dtype=np.int64)
    t2 = np.zeros(start.size, dtype=np.int64)
    max_l = int(L.max()) if L.size else 0
    for j in range(max_l):       # loop over the token width only
        act = L > j
        c = codes[start[act] + j]
        t1[act] = (t1[act] * B1 + c) % P1
        t2[act] = (t2[act] * B2 + c) % P2
    return t1, t2


def simhash_batch(texts, bits: int = 64) -> np.ndarray:
    """int64[n] SimHash signatures for a batch (bit j from the vote
    sum of g_j over tokens with multiplicity)."""
    codes, lens = batch_codes(texts)
    n = int(lens.size)
    start, length, doc = tokenize_stream(codes, lens)
    sig = np.zeros(n, dtype=np.uint64)
    if start.size == 0:
        return sig.view(np.int64)
    t1, t2 = token_hashes(codes, start, length)
    u, v, w = simhash_params(bits)
    for j in range(bits):
        g = ((u[j] * t1) % P1 + (v[j] * t2) % P1 + w[j]) % P1
        vote = (2 * (g & 1) - 1).astype(np.float64)
        sums = np.bincount(doc, weights=vote, minlength=n)
        bit = (sums > 0).astype(np.uint64)
        sig |= bit << np.uint64(j)
    return sig.view(np.int64)


def fingerprint_batch(texts, window: int = 16) -> np.ndarray:
    """int64[n] document fingerprints: min wide hash over all
    `window`-char windows (full-text hash for shorter documents,
    0 for empty ones)."""
    codes, lens = batch_codes(texts)
    n = int(lens.size)
    out = np.zeros(n, dtype=np.int64)
    _h1, hw, doc = window_hashes(codes, lens, window)
    if hw.size:
        order = np.lexsort((hw, doc))
        d_o, h_o = doc[order], hw[order]
        first = np.r_[True, d_o[1:] != d_o[:-1]]
        out[d_o[first]] = h_o[first]
    short = np.nonzero((lens < window) & (lens > 0))[0]
    if short.size:
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        s_start = offs[short]
        s_len = lens[short]
        h1 = np.zeros(short.size, dtype=np.int64)
        h2 = np.zeros(short.size, dtype=np.int64)
        for j in range(int(s_len.max())):
            act = s_len > j
            c = codes[s_start[act] + j]
            h1[act] = (h1[act] * B1 + c) % P1
            h2[act] = (h2[act] * B2 + c) % P2
        out[short] = h1 * np.int64(P2) + h2
    return out


# --------------------------------------------------------------------------
# SQL builders — the DuckDB oracle side (identical arithmetic)
# --------------------------------------------------------------------------

def _chars_cte(table: str = "documents", id_col: str = "doc_id",
               text_col: str = "text") -> str:
    """(doc_id, i, c): one row per character with its code point."""
    return f"""
pos AS (
  SELECT {id_col} AS doc_id,
         unnest(generate_series(1, length({text_col}))) AS i,
         {text_col} AS text
  FROM {table}
),
chars AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS c
  FROM pos
)"""


def _window_hash_expr(k: int, base: int, mod: int) -> str:
    """lead()-chain polynomial hash of the k-char window at i."""
    pows = [pow(base, k - 1 - j, mod) for j in range(k)]
    terms = []
    for j in range(k):
        col = "c" if j == 0 else f"lead(c, {j}) OVER w"
        terms.append(f"{col} * {pows[j]}")
    return "(" + " + ".join(terms) + f") % {mod}"


def _shingle_ctes(k: int, table: str = "documents") -> str:
    """CTEs ending in sh(doc_id, h1, hw): distinct shingle hashes per
    document (with the {0,0} sentinel for short docs)."""
    return f"""{_chars_cte(table)},
sh0 AS (
  SELECT doc_id,
         {_window_hash_expr(k, B1, P1)} AS h1,
         {_window_hash_expr(k, B2, P2)} AS h2
  FROM chars WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
sh AS (
  SELECT DISTINCT doc_id, h1, h1 * {P2} + h2 AS hw
  FROM sh0 WHERE h1 IS NOT NULL
  UNION
  SELECT doc_id, 0 AS h1, 0 AS hw FROM {table}
  WHERE length(text) < {k}
)"""


def minhash_pairs_oracle_sql(num_hashes: int = 64, bands: int = 8,
                             shingle: int = 5,
                             threshold: float = 0.8) -> str:
    """DuckDB SQL computing exactly doc_minhash_pairs: LSH band
    candidates (exact band-value equality) refined by exact Jaccard
    over wide-hash shingle sets."""
    rows = num_hashes // bands
    a, b = minhash_params(num_hashes)
    perm_values = ", ".join(f"({j}, {int(a[j])}, {int(b[j])})"
                            for j in range(num_hashes))
    return f"""
WITH {_shingle_ctes(shingle)},
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
perms(j, pa, pb) AS (VALUES {perm_values}),
sigs AS (
  SELECT s.doc_id, p.j, p.j // {rows} AS band,
         min((p.pa * s.h1 + p.pb) % {P1}) AS m
  FROM sh s CROSS JOIN perms p
  GROUP BY s.doc_id, p.j
),
bandkeys AS (
  SELECT doc_id, band, list(m ORDER BY j) AS key
  FROM sigs GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandkeys a
  JOIN bandkeys b ON a.band = b.band AND a.key = b.key
   AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS ni
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.hw = sa.hw
  GROUP BY c.id_a, c.id_b
),
jac AS (
  SELECT c.id_a, c.id_b,
         COALESCE(i.ni, 0) * 1.0
           / (ca.n + cb.n - COALESCE(i.ni, 0)) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN counts ca ON ca.doc_id = c.id_a
  JOIN counts cb ON cb.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard FROM jac
WHERE jaccard >= {threshold}
ORDER BY id_a, id_b
"""


def ngram_jaccard_oracle_sql(shingle: int = 5,
                             tau100: int = 60) -> str:
    """DuckDB SQL computing queries.doc_ngram_jaccard_pairs with NO
    prefix filter: the exhaustive shared-shingle self-join, exact
    intersection counts, integer threshold.  Because the engine side
    (dedup.ngram_jaccard_pairs) generates candidates from the prefix
    index only, equality of the two result sets is a proof that the
    prefix filter is lossless on the data — an algorithm-independent
    gate, not a replay."""
    return f"""
WITH {_shingle_ctes(shingle)},
sizes AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
ix AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.hw = b.hw AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_inter,
       CAST(sa.s + sb.s - n_inter AS BIGINT) AS n_union
FROM ix
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE 100 * n_inter >= {tau100} * (sa.s + sb.s - n_inter)
ORDER BY id_a, id_b
"""


def _token_hash_ctes(bits: int = 64) -> str:
    """CTEs ending in th(tok, h1, h2) + tok_counts(doc_id, tok, cnt):
    per-distinct-token polynomial hashes and per-document token
    multiplicities."""
    pow_values = ", ".join(
        f"({m}, {pow(B1, m, P1)}, {pow(B2, m, P2)})"
        for m in range(TOKEN_MAX))
    return f"""
toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '{WS_REGEX}')) AS tok
  FROM documents
),
tok_counts AS (
  SELECT doc_id, tok, count(*) AS cnt
  FROM toks WHERE length(tok) > 0 GROUP BY doc_id, tok
),
dt AS (SELECT DISTINCT tok FROM tok_counts),
tchars AS (
  SELECT tok, least(length(tok), {TOKEN_MAX}) AS L,
         unnest(generate_series(1, least(length(tok), {TOKEN_MAX}))) AS i
  FROM dt
),
powers(m, q1, q2) AS (VALUES {pow_values}),
th AS (
  SELECT t.tok,
         CAST(SUM(CAST(unicode(substr(t.tok, CAST(t.i AS INT), 1)) AS BIGINT)
                  * p.q1) % {P1} AS BIGINT) AS h1,
         CAST(SUM(CAST(unicode(substr(t.tok, CAST(t.i AS INT), 1)) AS BIGINT)
                  * p.q2) % {P2} AS BIGINT) AS h2
  FROM tchars t JOIN powers p ON p.m = t.L - CAST(t.i AS INT)
  GROUP BY t.tok
)"""


def simhash_pairs_oracle_sql(max_hamming: int = 8,
                             bits: int = 64) -> str:
    """DuckDB SQL computing exactly doc_simhash_pairs: per-bit token
    votes -> chunk-band candidates (pigeonhole over max_hamming+1
    chunks of width 64//(max_hamming+1)) -> exact Hamming filter."""
    chunks = max_hamming + 1
    width = bits // chunks
    u, v, w = simhash_params(bits)
    bit_values = ", ".join(f"({j}, {int(u[j])}, {int(v[j])}, {int(w[j])})"
                           for j in range(bits))
    return f"""
WITH {_token_hash_ctes(bits)},
bitparams(j, u, v, w) AS (VALUES {bit_values}),
tokbits AS (
  SELECT tc.doc_id, bp.j,
         CASE WHEN SUM(tc.cnt * (2 * (((bp.u * th.h1) % {P1}
                + (bp.v * th.h2) % {P1} + bp.w) % {P1} % 2) - 1)) > 0
              THEN 1 ELSE 0 END AS bit
  FROM tok_counts tc
  JOIN th ON th.tok = tc.tok
  CROSS JOIN bitparams bp
  GROUP BY tc.doc_id, bp.j
),
-- token-less documents carry the all-zero signature in the kernel
-- (simhash_batch: no votes -> every bit 0), so they must join and
-- pair with hamming 0; without this sentinel the oracle would drop
-- them (ADVICE r2)
bits AS (
  SELECT * FROM tokbits
  UNION ALL
  SELECT d.doc_id, bp.j, 0 AS bit
  FROM documents d CROSS JOIN bitparams bp
  WHERE d.doc_id NOT IN (SELECT doc_id FROM tok_counts)
),
chunkvals AS (
  SELECT doc_id, j // {width} AS chunk,
         CAST(SUM(bit * (1 << (j % {width}))) AS BIGINT) AS cv
  FROM bits WHERE j < {chunks * width}
  GROUP BY doc_id, j // {width}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM chunkvals a
  JOIN chunkvals b ON a.chunk = b.chunk AND a.cv = b.cv
   AND a.doc_id < b.doc_id
),
ham AS (
  SELECT c.id_a, c.id_b,
         CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END)
              AS BIGINT) AS hamming
  FROM cand c
  JOIN bits ba ON ba.doc_id = c.id_a
  JOIN bits bb ON bb.doc_id = c.id_b AND bb.j = ba.j
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, hamming FROM ham
WHERE hamming <= {max_hamming}
ORDER BY id_a, id_b
"""


def fingerprint_oracle_sql(window: int = 16) -> str:
    """DuckDB SQL computing exactly doc_fingerprints: per-document
    min wide hash over `window`-char windows."""
    pow_values = ", ".join(
        f"({m}, {pow(B1, m, P1)}, {pow(B2, m, P2)})"
        for m in range(window))
    return f"""
WITH {_chars_cte()},
h0 AS (
  SELECT doc_id,
         {_window_hash_expr(window, B1, P1)} AS h1,
         {_window_hash_expr(window, B2, P2)} AS h2
  FROM chars WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
long_fp AS (
  SELECT doc_id, CAST(min(h1 * {P2} + h2) AS BIGINT) AS fingerprint
  FROM h0 WHERE h1 IS NOT NULL GROUP BY doc_id
),
powers(m, q1, q2) AS (VALUES {pow_values}),
short_fp AS (
  SELECT c.doc_id,
         CAST((SUM(c.c * p.q1) % {P1}) * {P2}
              + SUM(c.c * p.q2) % {P2} AS BIGINT) AS fingerprint
  FROM chars c
  JOIN documents d ON d.doc_id = c.doc_id
  JOIN powers p ON p.m = length(d.text) - c.i
  WHERE length(d.text) < {window}
  GROUP BY c.doc_id
),
fp AS (
  SELECT * FROM long_fp UNION ALL SELECT * FROM short_fp
  UNION ALL
  SELECT doc_id, 0 AS fingerprint FROM documents WHERE length(text) = 0
)
SELECT doc_id, fingerprint FROM fp ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# whole-value hash (for distinct sketches)
# --------------------------------------------------------------------------

FULLTEXT_MAX = 1024   # hash the first FULLTEXT_MAX code points


def fulltext_hash_batch(texts, max_chars: int = FULLTEXT_MAX) -> np.ndarray:
    """62-bit wide polynomial hash of each full text (first max_chars
    code points) — the value hash behind the HLL distinct sketch.
    Horner over the char offset (loop bounded by the longest doc in
    the batch, all-row vector ops inside)."""
    codes, lens = batch_codes(texts)
    n = int(lens.size)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    L = np.minimum(lens, max_chars)
    h1 = np.zeros(n, dtype=np.int64)
    h2 = np.zeros(n, dtype=np.int64)
    max_l = int(L.max()) if n else 0
    for j in range(max_l):
        act = L > j
        c = codes[offs[:-1][act] + j]
        h1[act] = (h1[act] * B1 + c) % P1
        h2[act] = (h2[act] * B2 + c) % P2
    return h1 * np.int64(P2) + h2


def fulltext_hash_ctes(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text",
                       max_chars: int = FULLTEXT_MAX) -> str:
    """CTEs ending in th(doc_id, hw): the identical whole-value hash
    in SQL (powers table inlined; terms bounded: max_chars * cp *
    B^m mod P < 2^62 fits BIGINT exactly)."""
    pow_values = ", ".join(
        f"({m}, {pow(B1, m, P1)}, {pow(B2, m, P2)})"
        for m in range(max_chars))
    return f"""
fpos AS (
  SELECT {id_col} AS doc_id,
         unnest(generate_series(1, least(length({text_col}),
                                         {max_chars}))) AS i,
         least(length({text_col}), {max_chars}) AS L,
         {text_col} AS text
  FROM {table}
),
fchars AS (
  SELECT doc_id, CAST(i AS INT) AS i, L,
         CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS c
  FROM fpos
),
fpowers(m, q1, q2) AS (VALUES {pow_values}),
th AS (
  SELECT f.doc_id,
         (CAST(SUM(f.c * p.q1) % {P1} AS BIGINT)) * {P2}
           + CAST(SUM(f.c * p.q2) % {P2} AS BIGINT) AS hw
  FROM fchars f JOIN fpowers p ON p.m = f.L - f.i
  GROUP BY f.doc_id
  UNION ALL
  SELECT {id_col}, 0 FROM {table} WHERE length({text_col}) = 0
)"""
