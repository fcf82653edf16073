"""Training-data deduplication operators over the ``documents`` table.

Four families, all scale-first designs:

- exact: content-hash groupBy — one shuffle on the hash, map-side partial
  agg; at 100 TB this is the cheapest pass and runs first.
- n-gram Jaccard: exact pairwise similarity restricted to shingle-sharing
  pairs (the inverted-index join), never all-pairs.
- MinHash + LSH: signature → banded bucket-join; candidate volume is
  O(colliding pairs), independent of corpus², entirely JVM-side
  (xxhash64 + modular permutations — no Python in the hot path).
- SimHash: 64-bit fingerprint + banded Hamming candidate join.

Jaccard/exact have DuckDB oracles (same shingle construction on both
sides); MinHash/SimHash are rows-only for the driver and are instead
pinned by tests/test_dedup.py (candidate set ⊇ truly-similar pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from analytics.common import load

QUERIES: dict = {}
ORACLE: dict = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ------------------------------------------------------------- exact dedup
@q(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_doc
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: hash-groupBy, keep the min doc_id as representative."""
    d = load(spark, sf, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc")
    )


# ------------------------------------------------- shared shingle pipeline
def _shingle_arrays(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct word-trigram shingles
    per doc as a LOCAL array column.

    Trigram construction is a purely local array operation: transform over
    word indexes + array_distinct stays inside WholeStageCodegen with ZERO
    shuffle (the r01 version's posexplode + lead() window forced a per-doc
    sort shuffle plus a global distinct shuffle for the same rows — the
    kind of plan that dies first at 100x corpus scale).  The DuckDB oracle
    keeps the window formulation; both produce the same distinct
    (doc_id, shingle) set."""
    d = load(spark, sf, "documents")
    words = F.split("text", " ")
    n = F.size(words)
    tri = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
        ),
    )
    # sequence(1, n-2) would count DOWN for n < 3 — guard to an empty array
    shingles = F.when(n >= 3, F.array_distinct(tri)).otherwise(
        F.array().cast("array<string>")
    )
    return d.select("doc_id", shingles.alias("shingles"))


def _shingles(spark: SparkSession, sf: str) -> DataFrame:
    """Exploded (doc_id, shingle) rows — the inverted-index join's input."""
    return _shingle_arrays(spark, sf).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )


_SHINGLES_SQL = """
  w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS idx
    FROM documents),
  sh AS (
    SELECT doc_id,
           word || ' ' || lead(word, 1) OVER win || ' ' || lead(word, 2) OVER win
             AS shingle
    FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY idx)),
  shd AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL)
"""


@q(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
      FROM shd a JOIN shd b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT d1, d2,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = d1
    JOIN sizes sb ON sb.doc_id = d2
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.12
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact trigram-Jaccard near-dup pairs via the inverted-index join —
    only pairs sharing ≥1 shingle are ever materialized (never all-pairs),
    which is the property that survives a 100× corpus scale-up."""
    shd = _shingles(spark, sf).persist()
    sizes = shd.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shd.alias("a")
    b = shd.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("d1") == F.col("sa.doc_id"))
        .join(sb, F.col("d2") == F.col("sb.doc_id"))
        .where(jac >= 0.12)
        .select("d1", "d2", F.round(jac, 4).alias("jaccard"))
    )


# ------------------------------------------------------------ MinHash + LSH
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 31) - 1


def _perm_coeffs() -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation coefficients (seed 42)."""
    import random

    rng = random.Random(42)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(N_PERM)]


def minhash_signatures(shingle_arrays: DataFrame) -> DataFrame:
    """(doc_id, shingles: array<string>) → (doc_id, sig: array<long>[N_PERM]).

    Fully LOCAL: xxhash64 each shingle once into a per-doc hash array, then
    each of the N_PERM universal-hash permutations (a*h + b mod 2^31-1;
    products < 2^62, safe under ANSI) is an ``array_min(transform(...))``
    over that local array — zero shuffle, all WholeStageCodegen.  The r02
    version exploded to (doc, shingle) rows and ran a 64-column min hash
    aggregation: one full shuffle of every (doc, shingle, 64 longs) row,
    which at 100 TB is the corpus re-shuffled 64-wide for a per-doc-local
    computation.  Docs with zero shingles get no signature row (same
    contract as the exploded formulation, where they vanish at explode).

    Expressions are built as ONE ``F.expr`` string, not 64 ``F.transform``
    lambdas: each Python-lambda HOF costs a py4j round-trip chain at plan
    build plus a first-analysis JIT hit — measured 19.4 s plan build for
    the lambda form vs 1.8 s for a single parsed expression (same plan).
    """
    hashed = shingle_arrays.where(F.size("shingles") > 0).select(
        "doc_id",
        F.expr(f"transform(shingles, s -> pmod(xxhash64(s), {_MERSENNE}L))").alias("hs"),
    )
    sig_expr = (
        "array("
        + ",".join(
            f"array_min(transform(hs, h -> pmod({a}L*h+{b}L, {_MERSENNE}L)))"
            for (a, b) in _perm_coeffs()
        )
        + ")"
    )
    return hashed.select("doc_id", F.expr(sig_expr).alias("sig"))


@q("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands × 4): candidate pairs + signature-estimated
    Jaccard.  Scale path of dedup_ngram_jaccard: bucket-join volume is
    O(collisions), not O(n²); the exact verifier then runs only on
    candidates.  Rows-only for the driver (bucketed-candidate recall is
    asserted vs exact Jaccard in tests/test_dedup.py)."""
    sigs = minhash_signatures(_shingle_arrays(spark, sf)).persist()
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * ROWS_PER_BAND + r + 1).cast("string")
                                for r in range(ROWS_PER_BAND)
                            ],
                        )
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    s1 = sigs.select(F.col("doc_id").alias("d1"), F.col("sig").alias("sig1"))
    s2 = sigs.select(F.col("doc_id").alias("d2"), F.col("sig").alias("sig2"))
    est = (
        F.size(F.filter(F.zip_with("sig1", "sig2", lambda x, y: x == y), lambda v: v))
        / float(N_PERM)
    )
    return (
        cands.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", F.round(est, 4).alias("est_jaccard"))
    )


# ----------------------------------------------------------------- SimHash
@q("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash(64) near-dup: per-word xxhash64 → bitwise majority vote →
    two 32-bit halves (no 64-bit overflow under ANSI) → 4×16-bit banded
    candidate join → exact Hamming ≤ 6 filter.  All JVM-side.

    The fingerprint is fully LOCAL (same design move as
    minhash_signatures): ONE ``aggregate`` pass over the doc's word-hash
    array carries a 64-slot vote accumulator (``transform`` with index
    extracts each bit), so nothing shuffles until the (doc_id, fp) rows —
    the r02 version exploded to (doc, word) rows and ran a 64-column sum
    hash aggregation, a full corpus shuffle for a per-doc computation.
    Built as one parsed expression (py4j-lambda plan-build cost, see
    minhash_signatures)."""
    d = load(spark, sf, "documents")
    votes_expr = (
        "aggregate(transform(split(text, ' '), w -> xxhash64(w)), "
        "array_repeat(0L, 64), "
        "(acc, h) -> transform(acc, (v, i) -> "
        "v + CAST(shiftrightunsigned(h, i) & 1 AS BIGINT) * 2L - 1L))"
    )
    lo_expr = "+".join(f"IF(votes[{j}] > 0, {1 << j}L, 0L)" for j in range(32))
    hi_expr = "+".join(f"IF(votes[{j + 32}] > 0, {1 << j}L, 0L)" for j in range(32))
    fp = (
        d.select("doc_id", F.expr(votes_expr).alias("votes"))
        .select(
            "doc_id",
            F.expr(lo_expr).alias("sim_lo"),
            F.expr(hi_expr).alias("sim_hi"),
        )
        .persist()
    )
    # 4 bands of 16 bits each (2 per half): near-dups (Hamming<=6) must
    # collide on >=1 band only if <=3 differing bands — banded recall is
    # probabilistic for 4..6 bit flips spread across all bands; candidates
    # are then exactly verified.
    chunks = [
        F.shiftrightunsigned(F.col(half), s).bitwiseAND(F.lit(0xFFFF))
        for half in ("sim_lo", "sim_hi")
        for s in (0, 16)
    ]
    bands = fp.select(
        "doc_id", F.posexplode(F.array(*chunks)).alias("band_id", "chunk")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    f1 = fp.select(F.col("doc_id").alias("d1"), F.col("sim_lo").alias("lo1"), F.col("sim_hi").alias("hi1"))
    f2 = fp.select(F.col("doc_id").alias("d2"), F.col("sim_lo").alias("lo2"), F.col("sim_hi").alias("hi2"))
    hamming = F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2"))) + F.bit_count(
        F.col("hi1").bitwiseXOR(F.col("hi2"))
    )
    return (
        cands.join(f1, "d1")
        .join(f2, "d2")
        .where(hamming <= 6)
        .select("d1", "d2", hamming.cast("int").alias("hamming"))
    )
