"""D1/D2/D3 — partitioned URL-seen filter sidecar + exact dedup anti-join.

The filter is cross-epoch persistent state (unlike Spark's per-query runtime
bloom join pruning, which is also enabled — SURVEY.md §4 O8): one bloom blob
per ``part_id = pmod(url_hash, N_FILTER_PARTS)`` partition, stored as a
binary column row (SURVEY.md §1.2 seen_filter).  Probe (D1) and update (D3)
are cogrouped ``applyInPandas`` (UD4) with numpy-vectorized k-hash bit ops —
no per-row Python (BASELINE.json:6 "per-partition membership via
Arrow-batched pandas UDFs").

Exactness guarantee: the filter only *routes* — candidates it has definitely
never seen skip the expensive anti-join against the full frontier key set;
"maybe seen" candidates (true hits + false positives) still go through the
exact ``left_anti`` join (D2).  The URL-seen set is therefore exact
regardless of the filter's false-positive rate (BASELINE.json:6).

At 10^10-URL scale this is the shuffle cut that matters: the frontier key
set is ~80 GB of url_hash; the anti-join only ever shuffles the (small)
maybe-seen fraction of each epoch's discoveries, while the blobs
(N_FILTER_PARTS × nbits/8 bytes) stay partition-aligned with the candidate
stream — the cogroup shuffles candidates by part_id (1 shuffle) and blobs
(tiny) only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from engine.schemas import SEEN_FILTER

DEFAULT_NBITS = 1 << 22  # 4 Mbit = 512 KiB per partition blob
DEFAULT_NHASH = 5


def _positions(hashes: np.ndarray, nbits: int, nhash: int) -> np.ndarray:
    """(n, nhash) bit positions via double hashing over the 64-bit url_hash."""
    u = hashes.astype(np.int64).view(np.uint64)
    h1 = u % np.uint64(nbits)
    h2 = ((u >> np.uint64(31)) | np.uint64(1)) % np.uint64(nbits)
    i = np.arange(nhash, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(nbits)


def _probe_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    member = np.ones(pos.shape[0], dtype=bool)
    for j in range(pos.shape[1]):
        p = pos[:, j]
        member &= ((bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1).astype(bool)
    return member


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bits, flat >> 3, (np.uint8(1) << (flat & 7).astype(np.uint8)))


def with_part_id(df: DataFrame, n_parts: int) -> DataFrame:
    return df.withColumn("part_id", F.pmod(F.col("url_hash"), F.lit(n_parts)).cast("int"))


def _empty_blob(kind: str, nbits: int) -> bytes:
    if kind == "cuckoo":
        from engine import cuckoo

        nb = cuckoo.round_down_pow2(nbits // (cuckoo.FP_BITS * cuckoo.SLOTS))
        return cuckoo.to_blob(cuckoo.new_table(nb), np.array([], dtype=np.int64))
    return bytes(nbits // 8)


def _build_blob(kind: str, nbits: int, nhash: int, h: np.ndarray) -> bytes:
    if kind == "cuckoo":
        from engine import cuckoo

        nb = cuckoo.round_down_pow2(nbits // (cuckoo.FP_BITS * cuckoo.SLOTS))
        table = cuckoo.new_table(nb)
        stash = cuckoo.insert_many(table, np.array([], dtype=np.int64), h)
        return cuckoo.to_blob(table, stash)
    bits = np.zeros(nbits // 8, dtype=np.uint8)
    if len(h):
        _set_bits(bits, _positions(h, nbits, nhash))
    return bits.tobytes()


def _probe_blob(kind: str, nbits: int, nhash: int, blob: bytes, h: np.ndarray) -> np.ndarray:
    if kind == "cuckoo":
        from engine import cuckoo

        nb = cuckoo.round_down_pow2(nbits // (cuckoo.FP_BITS * cuckoo.SLOTS))
        table, stash = cuckoo.from_blob(blob, nb)
        return cuckoo.probe_many(table, stash, h)
    bits = np.frombuffer(blob, dtype=np.uint8)
    return _probe_bits(bits, _positions(h, nbits, nhash))


def _update_blob(kind: str, nbits: int, nhash: int, blob: bytes, h: np.ndarray) -> bytes:
    if kind == "cuckoo":
        from engine import cuckoo

        nb = cuckoo.round_down_pow2(nbits // (cuckoo.FP_BITS * cuckoo.SLOTS))
        table, stash = cuckoo.from_blob(blob, nb)
        stash = cuckoo.insert_many(table, stash, h)
        return cuckoo.to_blob(table, stash)
    bits = np.frombuffer(blob, dtype=np.uint8).copy()
    _set_bits(bits, _positions(h, nbits, nhash))
    return bits.tobytes()


def init_filter(
    spark: SparkSession,
    hashes: DataFrame,
    n_parts: int,
    nbits: int = DEFAULT_NBITS,
    nhash: int = DEFAULT_NHASH,
    kind: str = "bloom",
) -> DataFrame:
    """Build blobs for ALL n_parts partitions, seeded with ``hashes``.

    ``kind``: 'bloom' (engine default) or 'cuckoo' (engine/cuckoo.py —
    lower FPR at equal bits, supports deletion; BASELINE.json:6 names
    both).  Probe/update dispatch on the kind stored in each blob row, so
    mixed catalogs read correctly.
    """
    # NB: never union null rows into the url_hash column — a nullable int64
    # batch arrives in pandas as float64 and large hashes silently lose
    # precision (observed as bloom false negatives -> dedup leaks).
    seeded = with_part_id(hashes.select("url_hash"), n_parts)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part_id"].iloc[0])
        h = pdf["url_hash"].to_numpy(dtype=np.int64)
        assert h.dtype == np.int64
        blob = _build_blob(kind, nbits, nhash, h)
        return pd.DataFrame(
            [(part, kind, nbits, nhash, blob, len(h), 0)],
            columns=["part_id", "kind", "nbits", "nhash", "bits", "n_items", "epoch"],
        )

    built = seeded.groupBy("part_id").applyInPandas(build, SEEN_FILTER)

    # partitions with no seed hashes still need an (empty) blob row
    parts = spark.range(n_parts).select(F.col("id").cast("int").alias("part_id"))
    missing = parts.join(built.select("part_id"), "part_id", "left_anti")
    empty_blobs = missing.select(
        "part_id",
        F.lit(kind).alias("kind"),
        F.lit(nbits).cast("long").alias("nbits"),
        F.lit(nhash).cast("int").alias("nhash"),
        F.lit(_empty_blob(kind, nbits)).alias("bits"),
        F.lit(0).cast("long").alias("n_items"),
        F.lit(0).cast("int").alias("epoch"),
    )
    return built.unionByName(empty_blobs)


def probe_filter(
    candidates: DataFrame,
    blobs: DataFrame,
    n_parts: int,
    strategy: str = "slim",
    key_unique: bool = False,
) -> DataFrame:
    """D1: adds ``maybe_seen`` to candidates.  Three physical strategies,
    same result rows:

    - ``broadcast`` — bloom-only JVM fast path: blobs are unpacked once
      into int64 word arrays (one tiny Arrow pass over n_parts rows),
      broadcast-joined on part_id, and the k-hash bit probes run as
      shift/mask expressions inside WholeStageCodegen.  Zero shuffle of
      the candidate stream and zero per-candidate Python — but MEASURED
      SLOWER than ``slim`` at the default blob size: the broadcast join's
      output row materializes the matched build-side row, so every
      candidate row drags a copy of its part's nbits/8-byte word array
      (512 KiB × 672 k candidates ≈ 340 GB of row copying; 78 s vs 7 s
      at local[8]).  Only profitable when per-part blobs are a few KiB
      (many small parts); the engine therefore uses ``slim``.
    - ``slim`` (default) — the 100 TB path: only (part_id, url_hash)
      crosses Arrow into the cogrouped numpy probe (16 bytes/row instead
      of the full URL-carrying candidate row), and the verdict joins back
      on url_hash.  The join-back shuffle replaces the cogroup's
      candidate shuffle one-for-one, and downstream D2 (flag_new) joins
      on the same url_hash key, so AQE reuses the exchange — net effect
      vs ``cogroup`` is strictly less Arrow traffic at equal shuffles.
    - ``cogroup`` — the r01 form (full candidate rows through the
      cogroup); kept as the reference implementation and for
      mixed-kind/odd-schema callers.  Strategy equality is pinned by
      tests/test_units.py::test_probe_strategies_agree.
    """
    if strategy == "broadcast":
        return _probe_broadcast(candidates, blobs, n_parts)
    if strategy == "slim":
        # key_unique: the caller guarantees one row per url_hash (the
        # engine's candidates come out of extract_candidates' groupBy), so
        # the dedup pass — needed only so the left join-back cannot
        # multiply rows — is skipped entirely.
        slim = with_part_id(candidates.select("url_hash"), n_parts)
        if not key_unique:
            slim = slim.dropDuplicates(["url_hash"])
        verdict = _probe_cogroup(slim, blobs).drop("part_id")
        return with_part_id(candidates, n_parts).join(verdict, "url_hash", "left").fillna(
            {"maybe_seen": False}
        )
    return _probe_cogroup(with_part_id(candidates, n_parts), blobs)


def _probe_cogroup(cands: DataFrame, blobs: DataFrame) -> DataFrame:
    """Cogrouped applyInPandas probe (UD4) over rows already carrying
    part_id; numpy-vectorized per partition."""
    out_schema = StructType(cands.schema.fields + [StructField("maybe_seen", BooleanType())])
    cols = cands.columns

    def probe(cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        if blob_pdf.empty:  # no blob for this part => nothing ever seen here
            out = cand_pdf.copy()
            out["maybe_seen"] = False
            return out
        row0 = blob_pdf.iloc[0]
        assert pd.api.types.is_integer_dtype(cand_pdf["url_hash"]), "url_hash must stay int64"
        h = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
        out = cand_pdf.copy()
        out["maybe_seen"] = _probe_blob(
            row0["kind"], int(row0["nbits"]), int(row0["nhash"]), row0["bits"], h
        )
        return out

    return (
        cands.groupBy("part_id")
        .cogroup(blobs.groupBy("part_id"))
        .applyInPandas(probe, out_schema)
    )


def _probe_broadcast(candidates: DataFrame, blobs: DataFrame, n_parts: int) -> DataFrame:
    """Bloom probe as pure JVM bit arithmetic against broadcast word arrays.

    Bit-position parity with the numpy ``_positions``/``_probe_bits`` pair
    (pinned by tests/test_units.py::test_probe_strategies_agree):
    ``nbits`` is asserted a power of two, so the uint64 mods reduce to
    bitwise ANDs that signed int64 arithmetic computes identically, and
    ``shiftrightunsigned`` matches the uint64 logical shift.  Blob bytes
    are viewed as little-endian int64 words, so bit p of the byte array is
    bit (p & 63) of word (p >> 6).
    """
    from pyspark.sql.types import ArrayType, IntegerType, LongType

    words_schema = StructType(
        [
            StructField("part_id", IntegerType()),
            StructField("nbits", LongType()),
            StructField("nhash", IntegerType()),
            StructField("words", ArrayType(LongType())),
        ]
    )

    def unpack(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                assert r["kind"] == "bloom", "broadcast probe is bloom-only"
                nbits = int(r["nbits"])
                assert nbits & (nbits - 1) == 0, "broadcast probe needs pow2 nbits"
                assert int(r["nhash"]) <= _MAX_NHASH, "unrolled probe caps nhash"
                rows.append(
                    (
                        int(r["part_id"]),
                        nbits,
                        int(r["nhash"]),
                        np.frombuffer(r["bits"], dtype="<i8").tolist(),
                    )
                )
            yield pd.DataFrame(rows, columns=["part_id", "nbits", "nhash", "words"])

    words = blobs.mapInPandas(unpack, words_schema)
    cands = with_part_id(candidates, n_parts)
    joined = cands.join(F.broadcast(words), "part_id", "left")
    mask = F.col("nbits") - F.lit(1)
    h1 = F.col("url_hash").bitwiseAND(mask)
    h2 = F.expr("shiftrightunsigned(url_hash, 31)").bitwiseOR(F.lit(1)).bitwiseAND(mask)
    joined = joined.withColumn("_h1", h1).withColumn("_h2", h2)
    # unrolled AND over the k probes: every term is ordinary long
    # arithmetic + element_at — WholeStageCodegen end to end.  nhash is
    # data, not schema: unroll to the max supported k and guard each term
    # with i < nhash (a constant-folded comparison per row group).
    bit_ok = F.lit(True)
    for i in range(_MAX_NHASH):
        term = F.expr(
            f"(shiftrightunsigned(element_at(words, cast(shiftright(((_h1 + {i} * _h2) & (nbits - 1)), 6) as int) + 1), "
            f"cast(((_h1 + {i} * _h2) & 63) as int)) & 1) = 1"
        )
        bit_ok = bit_ok & F.when(F.lit(i) < F.col("nhash"), term).otherwise(F.lit(True))
    probedcol = F.when(F.col("words").isNull(), F.lit(False)).otherwise(bit_ok)
    return joined.withColumn("maybe_seen", probedcol).drop(
        "nbits", "nhash", "words", "_h1", "_h2"
    )


_MAX_NHASH = 8


def update_filter(blobs: DataFrame, new_hashes: DataFrame, n_parts: int, epoch: int) -> DataFrame:
    """D3: new blob snapshot with the epoch's inserted hashes OR'd in."""
    news = with_part_id(new_hashes.select("url_hash"), n_parts)

    def upd(new_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if blob_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in SEEN_FILTER.fields])
        row = blob_pdf.iloc[0]
        if new_pdf.empty:
            return blob_pdf[[f.name for f in SEEN_FILTER.fields]]
        nbits, nhash = int(row["nbits"]), int(row["nhash"])
        assert pd.api.types.is_integer_dtype(new_pdf["url_hash"]), "url_hash must stay int64"
        h = new_pdf["url_hash"].to_numpy(dtype=np.int64)
        blob = _update_blob(row["kind"], nbits, nhash, row["bits"], h)
        return pd.DataFrame(
            [
                (
                    int(row["part_id"]),
                    row["kind"],
                    nbits,
                    nhash,
                    blob,
                    int(row["n_items"]) + len(h),
                    epoch,
                )
            ],
            columns=[f.name for f in SEEN_FILTER.fields],
        )

    return (
        news.groupBy("part_id")
        .cogroup(blobs.groupBy("part_id"))
        .applyInPandas(upd, SEEN_FILTER)
    )


def delete_from_filter(
    blobs: DataFrame, gone_hashes: DataFrame, n_parts: int, epoch: int
) -> DataFrame:
    """Retire hashes from a CUCKOO filter snapshot — the deletion capability
    bloom lacks (engine/cuckoo.py delete_many).

    Decision on engine wiring (VERDICT r02 #7): deletion's production use is
    the RECRAWL path — frontier rows whose documents age past a TTL are
    retired from the seen filter and re-inserted as pending, so the next
    epoch re-fetches them through the normal D1/D2 pipeline.  The sandbox
    crawl semantics (BASELINE.json:6) define a single-pass crawl with no
    TTL, so the engine loop deliberately does NOT call this; it is the
    catalog-level primitive the recrawl flow plugs into, kept correct by
    the round-trip test (tests/test_cuckoo.py::test_delete_from_filter_*).
    Calling it on a bloom blob raises — silently "deleting" from a bloom
    would corrupt the exactness routing contract.

    Same cogrouped applyInPandas shape as update_filter: one shuffle of the
    retired hashes by part_id, blobs stay partition-aligned.
    """
    gone = with_part_id(gone_hashes.select("url_hash"), n_parts)

    def rm(gone_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if blob_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in SEEN_FILTER.fields])
        row = blob_pdf.iloc[0]
        if gone_pdf.empty:
            return blob_pdf[[f.name for f in SEEN_FILTER.fields]]
        if row["kind"] != "cuckoo":
            raise ValueError(
                f"delete_from_filter requires kind='cuckoo', got {row['kind']!r}"
            )
        from engine import cuckoo

        assert pd.api.types.is_integer_dtype(gone_pdf["url_hash"]), "url_hash must stay int64"
        h = gone_pdf["url_hash"].to_numpy(dtype=np.int64)
        nbits = int(row["nbits"])
        nb = cuckoo.round_down_pow2(nbits // (cuckoo.FP_BITS * cuckoo.SLOTS))
        table, stash = cuckoo.from_blob(row["bits"], nb)
        stash = cuckoo.delete_many(table, stash, h)
        return pd.DataFrame(
            [
                (
                    int(row["part_id"]),
                    row["kind"],
                    nbits,
                    int(row["nhash"]),
                    cuckoo.to_blob(table, stash),
                    max(0, int(row["n_items"]) - len(h)),
                    epoch,
                )
            ],
            columns=[f.name for f in SEEN_FILTER.fields],
        )

    return (
        gone.groupBy("part_id")
        .cogroup(blobs.groupBy("part_id"))
        .applyInPandas(rm, SEEN_FILTER)
    )


def flag_new(candidates_probed: DataFrame, frontier_keys: DataFrame) -> DataFrame:
    """D2 exact dedup, flag form: KEEPS every candidate row, adding
    ``is_new`` instead of anti-join-filtering — ``where(is_new)`` is
    row-identical to the left_anti formulation (J4, the driver-checked
    `j4_left_anti_join` parity query), and the flag lets the engine compute
    candidate-count and insert-count metrics in ONE job over one cached
    frame.  Bloom shuffle-cut preserved: only maybe-seen rows reach the
    join.

    The marker side is ``dropDuplicates``-ed: the left join is only
    row-identical to left_anti when the join key is unique, and while the
    F7 merge enforces one-frontier-row-per-url_hash, a corrupted frontier
    would otherwise silently MULTIPLY candidate rows (inflating
    n_cands/inserts and writing duplicate frontier rows).  The dedup's
    pre-shuffle partial agg hashes on the same url_hash the join shuffles
    on, so its exchange is reused by the join — near-free at any scale,
    and it turns the uniqueness invariant from an assumption into a
    guarantee."""
    definitely_new = candidates_probed.withColumn("is_new", ~F.col("maybe_seen")).where(
        ~F.col("maybe_seen")
    )
    maybe = candidates_probed.where(F.col("maybe_seen"))
    marker = (
        frontier_keys.select("url_hash").dropDuplicates().withColumn("_seen", F.lit(True))
    )
    checked = maybe.join(marker, "url_hash", "left").withColumn(
        "is_new", F.col("_seen").isNull()
    ).drop("_seen")
    return definitely_new.unionByName(checked).drop("maybe_seen", "part_id")
