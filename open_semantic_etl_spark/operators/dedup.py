"""Deduplication operators for large-scale corpus curation.

Beyond the reference's per-field value dedupe (etl.py:296 —
``list(set(...))``), a training-data pipeline needs document-level
dedup. All variants are shuffle-conscious:

- exact:   one shuffle on the 128-bit content hash (never the text);
- MinHash+LSH: signatures map-side (JVM-only expressions), one shuffle
  on (band_id, band_hash) to form candidate buckets — the standard
  shingle→minhash→band→bucket-join pipeline (Broder 1997 resemblance /
  LSH banding per Mining of Massive Datasets ch.3);
- SimHash: 64-bit fingerprints map-side (vectorized numpy in a pandas
  UDF), candidates via 4×16-bit band exchange (Charikar 2002 /
  Manku et al. 2007 near-duplicate detection);
- n-gram Jaccard: exact verification on candidate pairs (or full
  O(n²) within small blocks for oracle checking).

At 10^12 docs: every variant keys its single shuffle by a short hash,
AQE splits skewed buckets (stop-word shingles are pre-hashed away by
banding), and candidate verification joins fetch only the two text
columns needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def with_exact_dup_flag(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """is_duplicate: every row after the first (by id) with identical text."""
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    w = W.partitionBy(h).orderBy(F.col(id_col))
    return df.withColumn("content_md5", h).withColumn(
        "is_duplicate", F.row_number().over(w) > 1
    )


def exact_duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """groups with >1 member: (content_md5, n_dups, member ids)."""
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    return (
        df.select(F.col(id_col), h.alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.count("*").alias("n_dups"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n\n",
) -> DataFrame:
    """corpus-wide paragraph dedup (the CCNet / RefinedWeb line-dedup
    recipe): drop every paragraph that appears — trimmed-exact — in
    ``>= min_docs`` DISTINCT documents; boilerplate (nav bars, cookie
    banners, footers) repeats across pages while body text does not.

    Adds ``text_dedup`` (surviving paragraphs re-joined with ``sep``,
    original order and whitespace-only paragraphs preserved),
    ``n_paragraphs`` (non-empty), ``n_dropped``.

    Scale shape: per-doc paragraph hashing and within-doc dedup are
    map-side array algebra (``transform``/``array_distinct`` — no
    explode-then-distinct shuffle); the only wide ops are the frequency
    count keyed by the 128-bit hash and the doc-id regroup of the
    (typically small) dup-hit set; the final filter runs JVM-side
    against the original text via a left join, so docs with no shared
    paragraph never shuffle their text.
    """
    paras = F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
    # empty/whitespace paragraphs are structure, not content: excluded
    # from frequency counting and always kept on reassembly
    phs = F.array_distinct(
        F.filter(
            F.transform(paras, lambda p: F.when(F.trim(p) != "", F.md5(F.trim(p)))),
            lambda h: h.isNotNull(),
        )
    )
    ex = df.select(F.col(id_col).alias("_id"), F.explode(phs).alias("ph"))
    dup_hashes = (
        ex.groupBy("ph")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("ph")
    )
    doc_dups = (
        ex.join(dup_hashes, "ph")
        .groupBy("_id")
        .agg(F.sort_array(F.collect_set("ph")).alias("_dup_phs"))
    )
    out = df.join(doc_dups, df[id_col] == doc_dups["_id"], "left").drop("_id")
    dup_set = F.coalesce(F.col("_dup_phs"), F.array().cast("array<string>"))
    kept = F.filter(
        paras,
        lambda p: (F.trim(p) == "") | ~F.array_contains(dup_set, F.md5(F.trim(p))),
    )
    nonempty = lambda arr: F.size(F.filter(arr, lambda p: F.trim(p) != ""))  # noqa: E731
    return (
        out.withColumn("text_dedup", F.array_join(kept, sep))
        .withColumn("n_paragraphs", nonempty(paras))
        .withColumn("n_dropped", nonempty(paras) - nonempty(kept))
        .drop("_dup_phs")
    )


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH banding — all JVM-side expressions
# ---------------------------------------------------------------------------


def word_shingles(text: Column, n: int = 3, pad_short: bool = True) -> Column:
    """lowercased word n-grams (distinct), pure Column expression.

    ``pad_short=True`` (the MinHash contract: a signature needs a
    non-empty set) falls back to the first word when the text has
    fewer than ``n`` tokens; set-membership semantics (decontamination)
    pass ``pad_short=False`` so a sub-n document contributes NO grams —
    a 1-word "13-gram" would otherwise flag false contamination.

    The token array is let-bound (functions/binding.py) so the
    tokenizing split runs once per row — captured free in the
    per-gram lambda it re-ran per ELEMENT (~230×/doc, the single
    hottest line of the decontamination scan before binding)."""
    from open_semantic_etl_spark.functions.binding import let

    def shingles(words: Column) -> Column:
        k = F.size(words) - (n - 1)
        short = F.array(words[0]) if pad_short else F.array().cast("array<string>")
        grams = F.when(k >= 1, F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)]),
        )).otherwise(short)
        return F.array_distinct(grams)

    return let(F.split(F.lower(F.trim(text)), r"\s+"), shingles)


def _minhash_batch_factory(num_hashes: int, shingle_n: int):
    """numpy MinHash: one shingle pass per row, then all permutations as
    a single uint64 matrix op (affine family h_j = a_j*h + b_j, wrap
    arithmetic — the classic Broder construction).

    Why a UDF and not Column HOFs: a nested ``transform(sequence(j),
    transform(shingles, …))`` re-evaluates the shingle-building
    expression once per permutation (Catalyst inlines the argument),
    turning O(|doc|) into O(64·|doc|) with interpreted lambdas — 500
    docs took minutes. Here the shingle set is built once and the 64
    minima are one vectorized ``(A[:,None]*H+B).min(axis=1)``.
    """
    import zlib

    rng = np.random.RandomState(42)
    A = (rng.randint(1, 2**62, size=num_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    B = rng.randint(0, 2**63, size=num_hashes, dtype=np.uint64)

    def batch(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").lower().split()
            if not toks:
                out.append([0] * num_hashes)
                continue
            if len(toks) >= shingle_n:
                grams = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
            else:
                grams = {toks[0]}
            H = np.fromiter(
                (
                    (zlib.crc32(g.encode()) << 32) | zlib.crc32(g.encode(), 0x9E3779B9)
                    for g in grams
                ),
                dtype=np.uint64,
                count=len(grams),
            )
            sig = (A[:, None] * H[None, :] + B[:, None]).min(axis=1)
            out.append([int(x) for x in sig.view(np.int64)])
        return pd.Series(out)

    return batch


def minhash_signature(text: Column, num_hashes: int = 64, shingle_n: int = 3) -> Column:
    """array<long> MinHash signature column (Arrow-batched numpy UDF)."""
    udf = F.pandas_udf(
        _minhash_batch_factory(num_hashes, shingle_n), T.ArrayType(T.LongType())
    )
    return udf(text)


def _band_table(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(_id, sig) → (_id, band, bh): one row per LSH band, band hash =
    xxhash64 over the signature slice — the ~20 B/row key-only shape
    every LSH shuffle in this module carries (never the signature)."""
    rows = num_hashes // bands
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), b * rows + 1, rows),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                )
            ).alias("bh"),
        ),
    )
    return sig.select("_id", F.explode(band_arr).alias("bb")).select(
        "_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """candidate near-dup pairs (id_a < id_b) that share ≥1 LSH band.

    rows/bands trade precision for recall: 64 hashes in 16 bands of 4
    targets Jaccard ≳ (1/16)^(1/4) ≈ 0.5.

    Shuffle shape (the 100 TB concern): the band exchange carries ONLY
    ``(id, band, band_hash)`` — ~20 B/row, 16 rows/doc — never the
    512 B signature (which the old plan shipped 16× per doc). The full
    signatures are re-joined on the candidate PAIR set afterwards for
    ``est_jaccard``; candidates ≪ corpus, so AQE broadcasts the pair
    side and the signature table never shuffles at all. Production runs
    pass ``signatures`` (``id, sig``) from a persisted signature table
    so MinHash is computed once per doc; when omitted, the signature
    plan is evaluated per join branch (fine at test scale).
    """
    sig = signatures
    if sig is None:
        sig = df.select(
            F.col(id_col).alias("_id"),
            minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
        )
    else:
        sig = sig.select(F.col(id_col).alias("_id"), F.col("sig"))
    exploded = _band_table(sig, num_hashes, bands)
    # one short-key shuffle: bucket-join on (band, band_hash)
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(b, on=["band", "bh"], how="inner")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    # signatures re-join ONLY the candidate set (broadcast-able)
    sa = sig.select(F.col("_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("_id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(num_hashes)
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", est.alias("est_jaccard"))
    )


# ---------------------------------------------------------------------------
# incremental LSH: persisted band index, probe-new-batch-against-corpus
# ---------------------------------------------------------------------------
#
# The 100 TB dedup problem is incremental: each ingest batch must dedup
# against the ENTIRE existing corpus without recomputing it.  The index
# is two append-only parquet tables:
#
#   <path>/bands/_bb=<k>/…   (_id, band, bh)  hive-partitioned on
#                            _bb = pmod(xxhash64(bh), n_buckets)
#   <path>/sigs/_sb=<k>/…    (_id, sig)       partitioned on
#                            _sb = pmod(xxhash64(_id), n_buckets)
#
# Probe shape: the batch's band table joins index bands on (band, bh) —
# key-only shuffle, ~20 B/row, the same trim as lsh_candidate_pairs;
# `_bb` rides along so the parquet scan partition-prunes when the probe
# batch is small relative to n_buckets (and Spark's dynamic partition
# pruning applies when it is selective).  Signatures rejoin ONLY the
# candidate pair set (candidates ≪ corpus → AQE broadcasts them; the
# index signature table never shuffles).  Appends touch only the
# buckets the new batch hashes into — the merge_by_url bucket-pruning
# rule applied to the dedup index.


def build_lsh_index(
    df: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    n_buckets: int = 64,
    mode: str = "append",
    epoch: int | None = None,
    signatures: DataFrame | None = None,
) -> None:
    """persist (or extend) the LSH index with this batch's bands and
    signatures.  ``n_buckets`` sizing follows the checkpoint rule:
    buckets ≈ index_bytes / target_rewrite_unit.

    ``epoch`` routes the write into a ``_epoch=<n>`` partition dir and
    forces overwrite OF THAT DIR only — the foreachBatch idempotence
    trick: a retried streaming epoch rewrites its own partition instead
    of double-appending (valid WITHIN one stream checkpoint, whose
    file→epoch assignment is stable; a fresh checkpoint over the same
    landing data may assign files to different epochs).  Pick one
    layout per index (all-epoch or no-epoch); partition discovery
    cannot mix them.

    The LSH family parameters are recorded in ``_lsh_meta.json`` on
    first build and validated on every later build/probe: probing with
    different num_hashes/bands/shingle_n/n_buckets would silently miss
    collisions (r4 review).  ``signatures`` (``id_col, sig``) skips the
    MinHash recompute when the caller already has them."""
    _recover_lsh_compaction(index_path)  # an append directly after a
    # crashed compaction would otherwise recreate the live dir and let
    # the next probe's recovery DELETE the __old_* full-corpus copy
    meta = _lsh_index_meta(
        index_path, num_hashes, bands, shingle_n, n_buckets, create=True,
        refresh=(mode == "overwrite" and epoch is None),
    )
    num_hashes, bands, shingle_n, n_buckets = meta
    suffix = f"/_epoch={epoch}" if epoch is not None else ""
    if epoch is not None:
        mode = "overwrite"
    if not (mode == "overwrite" and epoch is None):
        # an append must match the table's physical layout: mixing
        # ``_epoch=`` dirs with the flat bucket layout makes partition
        # discovery raise "Conflicting directory structures" on every
        # later read — and a probe that swallowed that error would
        # report ALL docs novel and admit every duplicate (r5 review).
        # Refuse the write instead of corrupting the layout.
        for sub in ("bands", "sigs"):
            state = _lsh_table_state(f"{index_path}/{sub}")
            if epoch is not None and state == "flat":
                raise ValueError(
                    f"LSH index {sub} table at {index_path} has the flat "
                    "(batch/compacted) layout; an _epoch append would corrupt "
                    "partition discovery. After compact_lsh_index, continue "
                    "with non-epoch appends (dedup_ingest_batch) or stream "
                    "into a fresh index path."
                )
            if epoch is None and state == "epoch":
                raise ValueError(
                    f"LSH index {sub} table at {index_path} has the "
                    "_epoch streaming layout; a flat append would corrupt "
                    "partition discovery. Run compact_lsh_index first."
                )
    if signatures is None:
        sig = df.select(
            F.col(id_col).alias("_id"),
            minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
        )
    else:
        sig = signatures.select(F.col(id_col).alias("_id"), F.col("sig"))
    # sigs FIRST: the bands dir doubles as the index-exists marker the
    # probe checks, so a crash between the two writes must leave the
    # marker absent, not a bands-without-sigs wedge (r4 review)
    sig.withColumn(
        "_sb", F.pmod(F.xxhash64("_id"), F.lit(n_buckets))
    ).write.mode(mode).partitionBy("_sb").parquet(f"{index_path}/sigs{suffix}")
    bands_df = _band_table(sig, num_hashes, bands).withColumn(
        "_bb", F.pmod(F.xxhash64("bh"), F.lit(n_buckets))
    )
    bands_df.write.mode(mode).partitionBy("_bb").parquet(
        f"{index_path}/bands{suffix}"
    )


def _lsh_index_meta(
    index_path: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    n_buckets: int,
    create: bool = False,
    refresh: bool = False,
) -> tuple[int, int, int, int]:
    """read (or on first build, write) the index's recorded family
    parameters; mismatching caller parameters raise rather than
    silently probing the wrong band space.  ``refresh`` (full-table
    overwrite builds) re-records the caller's parameters — the one
    legitimate re-parameterization path.  The write is tmp+os.replace
    so a crash mid-write can never wedge later probes on a truncated
    JSON (r4 review)."""
    import json
    import os

    meta_path = os.path.join(index_path, "_lsh_meta.json")
    want = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "n_buckets": n_buckets,
    }

    def write() -> None:
        os.makedirs(index_path, exist_ok=True)
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(want, f)
        os.replace(tmp, meta_path)

    if os.path.exists(meta_path) and not refresh:
        try:
            with open(meta_path) as f:
                stored = json.load(f)
        except ValueError:
            # torn write from a crashed pre-fix build: a build
            # self-heals (it owns the params); a probe fails LOUDLY —
            # guessing the family silently misses collisions
            if create:
                write()
                stored = want
            else:
                raise ValueError(
                    f"corrupt _lsh_meta.json at {index_path} — rebuild the index"
                ) from None
        if stored != want:
            raise ValueError(
                f"LSH index at {index_path} was built with {stored}, "
                f"called with {want} — collisions would be silently missed"
            )
        return tuple(stored[k] for k in ("num_hashes", "bands", "shingle_n", "n_buckets"))
    if create:
        write()
    return num_hashes, bands, shingle_n, n_buckets


def probe_lsh_index(
    df: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    n_buckets: int = 64,
    exclude_epoch: int | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """dedup a new batch against the persisted index WITHOUT touching
    the corpus text: → (index_id, probe_id, est_jaccard, matched).

    ``exclude_epoch`` drops that ``_epoch`` partition from the probe —
    a RETRIED streaming epoch must not collide with its own partial
    write (stream_dedup_ingest passes the current epoch id).

    One row per (index doc, probe doc) band collision pair (deduped on
    the id pair before signatures rejoin), plus one ``matched=false``
    row (null index_id/est_jaccard) for every novel probe doc — the
    keep-set of an incremental ingest.  A missing/empty index (the
    streaming bootstrap batch) yields all-novel."""
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType
    _recover_lsh_compaction(index_path)
    num_hashes, bands, shingle_n, n_buckets = _lsh_index_meta(
        index_path, num_hashes, bands, shingle_n, n_buckets
    )
    # BOTH tables must hold data for the index to count as present: a
    # crash mid-first-build can leave one without the other, and a
    # wedged probe would block every streaming retry (r4 review).  The
    # presence test is a direct filesystem check, NOT a caught
    # AnalysisException: a mixed flat/_epoch layout raises the same
    # exception class at plan time ("Conflicting directory structures"),
    # and swallowing it would silently report every doc novel and admit
    # every duplicate (r5 review).  Any read error on real data raises.
    if (
        _lsh_table_state(f"{index_path}/bands") in ("absent", "empty")
        or _lsh_table_state(f"{index_path}/sigs") in ("absent", "empty")
    ):
        return df.select(
            F.lit(None).cast(id_type).alias("index_id"),
            F.col(id_col).alias("probe_id"),
            F.lit(None).cast("double").alias("est_jaccard"),
            F.lit(False).alias("matched"),
        )
    idx_raw = spark.read.parquet(f"{index_path}/bands")
    idx_sigs_raw = spark.read.parquet(f"{index_path}/sigs")
    if exclude_epoch is not None and "_epoch" in idx_raw.columns:
        idx_raw = idx_raw.filter(F.col("_epoch") != exclude_epoch)
    if signatures is None:
        sig = df.select(
            F.col(id_col).alias("_id"),
            minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
        )
    else:
        sig = signatures.select(F.col(id_col).alias("_id"), F.col("sig"))
    probe_bands = _band_table(sig, num_hashes, bands).withColumn(
        "_bb", F.pmod(F.xxhash64("bh"), F.lit(n_buckets))
    )
    idx_bands = idx_raw.select(F.col("_id").alias("_iid"), "band", "bh", "_bb")
    # key-only pair join; _bb in the key lets the scan partition-prune
    pairs = (
        probe_bands.join(idx_bands, on=["_bb", "band", "bh"], how="inner")
        .select(F.col("_iid").alias("index_id"), F.col("_id").alias("probe_id"))
        .distinct()
    )
    idx_sigs = idx_sigs_raw
    if exclude_epoch is not None and "_epoch" in idx_sigs.columns:
        idx_sigs = idx_sigs.filter(F.col("_epoch") != exclude_epoch)
    idx_sigs = idx_sigs.select(
        F.col("_id").alias("index_id"), F.col("sig").alias("sig_i")
    )
    probe_sigs = sig.select(F.col("_id").alias("probe_id"), F.col("sig").alias("sig_p"))
    est = (
        F.size(F.filter(F.zip_with("sig_i", "sig_p", lambda x, y: x == y), lambda v: v))
        / F.lit(num_hashes)
    )
    dups = (
        pairs.join(idx_sigs, "index_id")
        .join(probe_sigs, "probe_id")
        .select(
            "index_id",
            "probe_id",
            est.alias("est_jaccard"),
            F.lit(True).alias("matched"),
        )
        # a crash between a non-epoch append's sigs and bands writes
        # leaves orphan sig rows the retry re-appends; the duplicate
        # (_id, sig) rows would fan each collision out to N rows here.
        # Dedup on the PAIR (candidates ≪ corpus — cheap), not on the
        # full sig table (r5 review).
        .dropDuplicates(["index_id", "probe_id"])
    )
    novel = (
        df.select(F.col(id_col).alias("probe_id"))
        .join(pairs.select("probe_id").distinct(), "probe_id", "left_anti")
        .select(
            F.lit(None).cast(id_type).alias("index_id"),
            "probe_id",
            F.lit(None).cast("double").alias("est_jaccard"),
            F.lit(False).alias("matched"),
        )
    )
    return dups.select("index_id", "probe_id", "est_jaccard", "matched").unionByName(
        novel
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification / oracle path)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """exact Jaccard over word n-grams for all id_a < id_b pairs.

    O(n²) — verification of LSH candidates or oracle use on small
    blocks; production path is lsh_candidate_pairs → this on candidates.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter / union
    return (
        a.crossJoin(b)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """connected components over candidate-pair edges → canonical dup
    clusters: ``(id, cluster_id, is_keeper)`` with ``cluster_id`` = the
    smallest id in the component and ``is_keeper`` marking that one row
    (the keep-one-per-cluster decision that turns near-dup PAIRS into
    an actionable delete set — the final step of the dedup pipeline).

    Iterative min-label propagation (hash-to-min): each round is one
    shuffle of ``(node, label)`` keyed by node — labels only, never
    text or signatures — and converges in O(log component diameter)
    rounds (min-label step + pointer-jumping compression per round);
    ``max_iter`` bounds the driver loop and non-convergence RAISES
    rather than returning keeper-less split clusters. Each round ``localCheckpoint``s its label table, which
    MATERIALIZES the rows and TRUNCATES the logical plan — ``cache()``
    alone is not enough here: the analyzed plan nests the previous
    round's plan and grows geometrically (a 10-round cached loop
    produced a 2 GB plan string and drove the driver OOM). On a real
    cluster prefer ``spark.sparkContext.setCheckpointDir`` + reliable
    ``checkpoint()`` for executor-loss tolerance; localCheckpoint is
    the right call in local mode and keeps per-round cost one shuffle.

    Only ids that appear in ``pairs`` are returned; rows with no dup
    edge are trivially their own singleton cluster and never enter the
    shuffle (anti-join the delete set instead of materializing them).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr_min, labels["id"] == nbr_min["dst"], "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            (F.col("nbr_label") < F.col("label")).alias("_chg"),
        )
        # pointer jumping: chase each node's label to ITS label's label
        # (path compression) — turns O(diameter) rounds into
        # O(log diameter), so a 10^6-long templated-page chain
        # converges in ~20 rounds instead of 10^6
        lab2 = stepped.select(
            F.col("id").alias("_lid"), F.col("label").alias("_llabel")
        )
        new_labels = (
            stepped.join(lab2, stepped["label"] == lab2["_lid"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("_llabel", "label")).alias("label"),
                (F.col("_chg") | (F.col("_llabel") < F.col("label"))).alias("_chg"),
            )
            .localCheckpoint()  # eager: materializes + truncates lineage
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            converged = True
            break
    if not converged:
        # a silent partial result here is DANGEROUS: split clusters can
        # come back keeper-less, and a keep-one-per-cluster delete
        # would then drop every copy of those documents
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed ≈ log2(component diameter))"
        )
    return labels.select(
        F.col("id"),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("id")).cast("int").alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def ngram_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """flag corpus documents sharing any word n-gram with an evaluation
    benchmark (the GPT-3 training-set decontamination scheme — Brown et
    al. 2020, appendix C uses 13-grams; ``n`` is configurable for
    shorter corpora).

    Adds ``n_overlap`` (distinct shared n-grams) and
    ``is_contaminated`` to ``df``. Scale shape: the benchmark's gram
    set is tiny relative to the corpus → hashed (xxhash64, 8 B/gram)
    and BROADCAST, so the corpus side is one map pass (shingle +
    explode + hash) with no corpus-wide shuffle; only the hit rows
    (corpus grams matching a benchmark gram) reach the per-doc
    aggregation.
    """
    bench = (
        benchmark.select(
            F.explode(word_shingles(F.col(bench_text_col), n, pad_short=False)).alias("g")
        )
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), n, pad_short=False)).alias("g"),
    ).select("_id", F.xxhash64("g").alias("gh"))
    hits = (
        grams.join(F.broadcast(bench), "gh")
        .groupBy("_id")
        .agg(F.count_distinct("gh").alias("n_overlap"))
    )
    out = df.join(hits, df[id_col] == hits["_id"], "left").drop("_id")
    return out.withColumn(
        "n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)).cast("int")
    ).withColumn("is_contaminated", (F.col("n_overlap") > 0).cast("int"))


# ---------------------------------------------------------------------------
# exact-substring duplicated spans (Lee et al. 2021)
# ---------------------------------------------------------------------------


def _tokens_and_grams(text: Column, n: int) -> Column:
    """struct<nt:int, gs:array<string>>: token count plus word
    ``n``-grams in document order (NOT distinct — positions matter;
    index in the array == 0-based start token). Tokenizer is
    single-sourced with :func:`word_shingles` (lowercase, trim, split
    on whitespace); BOTH outputs come from one let-bound token array
    so the split runs once per row — not once per gram, and not again
    for the count."""
    from open_semantic_etl_spark.functions.binding import let

    def body(words: Column) -> Column:
        k = F.size(words) - (n - 1)
        gs = F.when(
            k >= 1,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.struct(F.size(words).alias("nt"), gs.alias("gs"))

    return let(F.split(F.lower(F.trim(text)), r"\s+"), body)


def exact_substring_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """exact-substring duplicate detection: the distributed stand-in for
    the suffix-array dedup of Lee et al. 2021 ("Deduplicating Training
    Data Makes Language Models Better", §3.2 ExactSubstr). A token is
    *duplicated* when it is covered by some word ``n``-gram occurring
    ``min_count``-or-more times corpus-wide (within- OR cross-document
    — the paper removes self-repeats too). Overlapping duplicated
    grams merge into maximal spans.

    Returns one row per input row: ``id_col``, ``total_tokens``,
    ``dup_tokens`` (union size of the duplicated spans, in tokens),
    ``dup_spans`` (count of maximal spans), ``dup_frac``.

    Scale shape (the reason this replaces a suffix array on Spark):
    the corpus crosses the wire as (gram_hash 8 B, doc_id, pos) rows —
    never text. One shuffle counts gram occurrences (map-side partial
    aggregation collapses each partition's repeats first), one
    re-shuffle joins the surviving duplicated hashes back to positions
    (AQE picks broadcast when the duplicated set is small), and the
    island merge is a per-doc sort + fold — O(corpus tokens) total
    work, same as the paper's suffix array, but embarrassingly
    partitionable. Reference bar: the reference engine has no dedup
    tier at all (SURVEY §2 LLM-ops addendum); semantics follow the
    paper.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        _tokens_and_grams(F.col(text_col), n).alias("_tg"),
    ).select(
        "_id",
        F.col("_tg.nt").alias("total_tokens"),
        F.col("_tg.gs").alias("_grams"),
    )
    # posexplode_outer, NOT posexplode: the non-outer Generate makes
    # Catalyst push a size(grams)>0 filter below it, and that filter
    # (plus its scan DataFilter twin) re-evaluates the whole let-bound
    # tokenize+gram expression per row — 3 evaluations per scan instead
    # of 1 (no CSE across Filter/Project operator boundaries). The
    # outer variant emits one null row for gram-less docs, dropped by a
    # cheap filter on the GENERATED column.
    grams = (
        base.select("_id", F.posexplode_outer("_grams").alias("pos", "g"))
        .filter(F.col("pos").isNotNull())
        .select("_id", "pos", F.xxhash64("g").alias("gh"))
    )
    dup_hashes = (
        grams.groupBy("gh").count().filter(F.col("count") >= min_count).select("gh")
    )
    hit_pos = grams.join(dup_hashes, "gh").select("_id", "pos")

    # per-doc island merge: sorted start positions fold left; spans of
    # equal length n merge when the next start is <= prev_start + n
    s = lambda sp, tk, st, pv: F.struct(  # noqa: E731
        sp.alias("spans"), tk.alias("toks"), st.alias("start"), pv.alias("prev")
    )
    zero = F.lit(0).cast("long")
    init = s(zero, zero, F.lit(-1).cast("long"), F.lit(-1).cast("long"))

    def step(st: Column, p: Column) -> Column:
        pl = p.cast("long")
        return (
            F.when(st["start"] < 0, s(F.lit(1).cast("long"), zero, pl, pl))
            .when(pl <= st["prev"] + n, s(st["spans"], st["toks"], st["start"], pl))
            .otherwise(
                s(
                    st["spans"] + 1,
                    st["toks"] + st["prev"] - st["start"] + n,
                    pl,
                    pl,
                )
            )
        )

    def finish(st: Column) -> Column:
        closed = F.when(
            st["start"] >= 0, st["toks"] + st["prev"] - st["start"] + n
        ).otherwise(zero)
        return F.struct(st["spans"].alias("spans"), closed.alias("toks"))

    per_doc = (
        hit_pos.groupBy("_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
        .select(
            "_id",
            F.aggregate(F.col("ps"), init, step, finish).alias("r"),
        )
        .select(
            "_id",
            F.col("r.spans").alias("dup_spans"),
            F.col("r.toks").alias("dup_tokens"),
        )
    )
    out = (
        base.drop("_grams")
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("total_tokens").cast("int").alias("total_tokens"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("int").alias("dup_tokens"),
            F.coalesce(F.col("dup_spans"), F.lit(0)).cast("int").alias("dup_spans"),
        )
    )
    return out.withColumn(
        "dup_frac",
        F.when(
            F.col("total_tokens") > 0,
            F.col("dup_tokens").cast("double") / F.col("total_tokens"),
        ).otherwise(F.lit(0.0)),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit simhash per text: crc32-seeded token hashes, bit majority."""
    import zlib

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.lower().split()
        if not toks:
            continue
        # two crc32s → 64 deterministic bits per token
        h = np.fromiter(
            (
                (zlib.crc32(w.encode()) << 32) | zlib.crc32(w.encode(), 0xDEADBEEF)
                for w in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for k in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(k)
        out[i] = np.int64(sim.astype(np.int64))
    return pd.Series(out)


def with_simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    udf = F.pandas_udf(_simhash_batch, T.LongType())
    return df.withColumn(out, udf(F.col(text_col)))


def simhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """near-dup pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit
    banding (pigeonhole: ≤3 differing bits → ≥1 identical 16-bit band)."""
    sh = with_simhash(df, text_col).select(F.col(id_col).alias("_id"), "simhash")
    bands = [
        F.struct(F.lit(b).alias("band"), F.shiftrightunsigned("simhash", 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("bh"))
        for b in range(4)
    ]
    ex = sh.select("_id", "simhash", F.explode(F.array(*bands)).alias("bb")).select(
        "_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a, b = ex.alias("a"), ex.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = F.bit_count(xor)
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """cosine similarity of two array<float/double> columns (JVM-side)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """pairs with cosine ≥ threshold (brute self-join — verification
    path; the scale path blocks candidates via sign-LSH first,
    see operators/similarity.py)."""
    v = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("v"))
    a, b = v.alias("a"), v.alias("b")
    cos = cosine(F.col("a.v").cast("array<double>"), F.col("b.v").cast("array<double>"))
    return (
        a.crossJoin(b)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def _require_local(path: str) -> None:
    """the index lifecycle (state checks, staged swaps, batch commits)
    runs on driver-local filesystem primitives; a URI-schemed path
    (hdfs://, s3a://) would make every os.path check read as 'absent'
    and silently admit every duplicate (r5 review).  Raise loudly; on
    a cluster these call sites swap os/shutil for the Hadoop
    FileSystem API behind the same functions."""
    if "://" in path:
        raise NotImplementedError(
            f"LSH index paths must be driver-local filesystem paths in this "
            f"build (got {path!r}); remote-FS support needs the Hadoop "
            "FileSystem API behind _lsh_table_state/_recover_lsh_compaction"
        )


def _lsh_table_state(path: str) -> str:
    """physical layout of one index table dir: ``absent`` (no dir),
    ``empty`` (dir holds no parquet data files — e.g. an all-empty-epoch
    streaming bootstrap), ``flat`` (data, no ``_epoch=`` partition
    dirs — the batch/compacted layout), ``epoch`` (data under
    ``_epoch=`` dirs — the streaming layout).  Pure os-path checks; the
    build guard and the probe's empty-index test both key off this so a
    mixed layout is refused/raised instead of read as empty."""
    import os

    _require_local(path)
    if not os.path.isdir(path):
        return "absent"
    has_data = any(
        f.endswith(".parquet")
        for _d, _s, files in os.walk(path)
        for f in files
    )
    if not has_data:
        return "empty"
    epoched = any(n.startswith("_epoch=") for n in os.listdir(path))
    return "epoch" if epoched else "flat"


def semdedup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k_cells: int = 16,
    threshold: float = 0.9,
    iters: int = 5,
    sample: int = 4096,
    centroids=None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate PAIRS via
    k-means clustering + within-cluster pairwise cosine — the
    embedding-space analogue of MinHash dedup, catching paraphrases and
    re-encodings no lexical method sees.  Returns ``(id_a, id_b,
    cos)`` with ``id_a < id_b`` and ``cos ≥ threshold``; compose with
    :func:`dup_clusters` for the keep-one-per-cluster delete set (the
    paper keeps the member farthest from the centroid; min-id is the
    deterministic stand-in here, applied by the cluster resolve).

    Scale shape: the ONLY all-pairs work is within a cluster —
    O(Σ|cell|²) total, the algorithm's own cost model (the paper runs
    k ∝ N so cells stay bounded); the cell co-location shuffle carries
    each vector exactly once, keyed by cell.  At 10^12 rows the corpus
    is written partitioned BY cell once (the IVF layout — same
    quantizer, same table) and each cell's pair scan runs
    partition-local with no further exchange.  The coarse quantizer is
    the shared deterministic trainer (similarity.train_centroids), so
    the ``semdedup`` golden (tools/gen_goldens.py) re-derives cells,
    pairs, and left-fold cosines bit-identically."""
    from open_semantic_etl_spark.operators.similarity import (
        nearest_cells_expr,
        train_centroids,
    )

    if centroids is None:
        centroids = train_centroids(df, k_cells, iters, sample, vec_col, id_col)
    v = F.col(vec_col).cast("array<double>")
    base = df.select(
        F.col(id_col).alias("_id"),
        v.alias("v"),
        nearest_cells_expr(v, centroids, 1)[0].alias("cell"),
    ).filter(F.col("cell").isNotNull())
    a, b = base.alias("a"), base.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, "cell")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(cos, 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _recover_lsh_compaction(index_path: str) -> None:
    """roll an interrupted compact_lsh_index back/forward: a table dir
    that vanished mid-swap is restored from its ``__old_*`` sibling
    (else the probe would silently treat a full corpus index as empty —
    r4 review); leftover ``__tmp_*``/``__old_*`` staging dirs are
    dropped.  Called at the top of every probe and compaction; pure
    os-path checks when nothing is staged."""
    import glob
    import os
    import shutil

    from open_semantic_etl_spark.plans.checkpoint import recover_swaps

    _require_local(index_path)
    for sub, part_col in (("bands", "_bb"), ("sigs", "_sb")):
        path = f"{index_path}/{sub}"
        olds = sorted(glob.glob(f"{path}__old_*"))
        if olds and not os.path.isdir(path):
            os.rename(olds.pop(), path)
        for stale in olds + glob.glob(f"{path}__tmp_*"):
            shutil.rmtree(stale, ignore_errors=True)
        # also roll forward any interrupted per-bucket delete swap
        # (delete_from_lsh_index parks post-delete bucket dirs in a
        # sibling __swap dir — same recovery as the checkpoint merge)
        recover_swaps(path, part_col=part_col)
    # roll staged-COMPLETE batch appends forward (dedup_ingest_batch
    # crashed between _STAGED and the marker publish).  Un-staged
    # ``__batch_*`` dirs are left alone: they are either a concurrent
    # in-flight writer's staging or dead weight the next ingest of that
    # batch_id discards itself — deleting them here would race a live
    # writer.
    for staging in glob.glob(f"{index_path}/__batch_*"):
        if os.path.isfile(os.path.join(staging, "_STAGED")):
            batch_id = os.path.basename(staging)[len("__batch_"):]
            _commit_batch_staging(
                index_path, staging, f"{index_path}/_batches/{batch_id}"
            )


def _lsh_batch_paths(index_path: str, batch_id: str) -> tuple[str, str]:
    """(staging dir, committed marker dir) for one ingest batch."""
    return (
        f"{index_path}/__batch_{batch_id}",
        f"{index_path}/_batches/{batch_id}",
    )


def _commit_batch_staging(index_path: str, staging: str, marker: str) -> None:
    """roll a fully-staged batch append (``_STAGED`` present) forward:
    move each staged parquet part file into its live bucket dir (names
    are Spark-unique uuids, so a resumed move never double-lands a
    file), then publish the kept-ids dir as the committed marker (one
    atomic rename), then drop the staging dir.  Every step is
    idempotent under crash-retry — the recovery path and the happy path
    are the same code."""
    import os
    import shutil

    for sub in ("bands", "sigs"):
        src_root = os.path.join(staging, sub)
        if not os.path.isdir(src_root):
            continue
        for d, _s, files in os.walk(src_root):
            rel = os.path.relpath(d, src_root)
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                dst_dir = os.path.join(index_path, sub, rel)
                os.makedirs(dst_dir, exist_ok=True)
                os.rename(os.path.join(d, f), os.path.join(dst_dir, f))
    if not os.path.isdir(marker):
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        os.rename(os.path.join(staging, "kept_ids"), marker)
    shutil.rmtree(staging, ignore_errors=True)


def dedup_ingest_batch(
    spark,
    batch_df: DataFrame,
    index_path: str,
    batch_id: str | None = None,
    text_col: str = "text",
    id_col: str = "url",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    n_buckets: int = 64,
    _fail_after_stage: bool = False,
) -> DataFrame:
    """one-call incremental dedup ingest — the BATCH twin of
    ``stream_dedup_ingest`` (streaming/monitor.py): dedup the batch
    against the whole already-ingested corpus via the persisted band
    index, dedup within the batch, append the keep-set to the index,
    and return the kept rows.

    Scale shape (identical to the streaming twin): ONE MinHash pass per
    batch threads through probe, within-batch dedup and the index
    append; the probe is a partition-pruned key-only band join (corpus
    text never re-read); within-batch dedup keeps the smaller id of
    each colliding pair.

    Idempotence: pass ``batch_id`` (any string uniquely naming this
    batch's CONTENT — a landing-file manifest hash, an ingest sequence
    number).  The index append is then staged under
    ``__batch_<id>`` and committed by moving part files into the live
    bucket dirs, with the kept-id set published to ``_batches/<id>`` as
    the commit marker (and audit trail).  Replaying a committed batch
    returns the recorded keep-set without touching the index; a crash
    anywhere — between the sigs and bands writes, mid-commit, before
    the marker — either discards the un-staged attempt (recompute, the
    live index was never touched) or rolls the staged commit forward
    (every probe/build also rolls staged-complete batches forward via
    ``_recover_lsh_compaction``).  Without ``batch_id`` the append is
    direct (``build_lsh_index``): correct under crash-BEFORE-bands
    retries (orphan sig rows are deduped at probe time) but a retry
    after a COMPLETED append will re-ingest the batch against itself —
    use ``batch_id`` whenever the caller retries.

    ``_fail_after_stage`` is the crash-simulation hook (the
    ``fail_before_checkpoint`` pattern, plans/checkpoint.py)."""
    import os
    import re
    import shutil

    if batch_id is not None and not re.fullmatch(r"[A-Za-z0-9._-]{1,128}", batch_id):
        # '/' or other path chars would nest the __batch_ staging dir,
        # hiding its _STAGED file from recovery's one-level glob and
        # breaking the roll-forward promise (r5 review)
        raise ValueError(
            f"batch_id {batch_id!r} must match [A-Za-z0-9._-]{{1,128}} "
            "(it names filesystem directories)"
        )
    _recover_lsh_compaction(index_path)

    def kept_rows(ids_path: str) -> DataFrame:
        if _lsh_table_state(ids_path) in ("absent", "empty"):
            # an all-duplicate batch records an EMPTY keep-set; some
            # writers emit no parquet footer for zero rows, which would
            # make the replay read fail schema inference
            return batch_df.dropDuplicates([id_col]).limit(0)
        kept_ids = spark.read.parquet(ids_path).select(
            F.col("_id").alias(id_col)
        )
        return batch_df.dropDuplicates([id_col]).join(kept_ids, id_col)

    if batch_id is not None:
        staging, marker = _lsh_batch_paths(index_path, batch_id)
        if os.path.isdir(marker):
            return kept_rows(marker)  # committed replay
        if os.path.isfile(os.path.join(staging, "_STAGED")):
            # staged-complete crash window: finish the commit, then
            # return the RECORDED keep-set (recomputing would probe an
            # index that may already hold part of this batch)
            _commit_batch_staging(index_path, staging, marker)
            return kept_rows(marker)
        shutil.rmtree(staging, ignore_errors=True)  # partial stage

    batch = batch_df.dropDuplicates([id_col]).localCheckpoint(eager=True)
    sigs = batch.select(
        F.col(id_col),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
    ).localCheckpoint(eager=True)
    probed = probe_lsh_index(
        batch, index_path, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        n_buckets=n_buckets, signatures=sigs,
    )
    novel_ids = probed.filter(~F.col("matched")).select(
        F.col("probe_id").alias(id_col)
    )
    novel = batch.join(novel_ids, id_col)
    drop = (
        lsh_candidate_pairs(
            novel, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            signatures=sigs.join(novel_ids, id_col),
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    kept = novel.join(drop, id_col, "left_anti").localCheckpoint(eager=True)
    kept_sigs = sigs.join(kept.select(id_col), id_col).select(
        F.col(id_col).alias("_id"), "sig"
    )
    if batch_id is None:
        build_lsh_index(
            kept, index_path, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            n_buckets=n_buckets,
            signatures=kept_sigs.select(F.col("_id").alias(id_col), "sig"),
        )
        return kept
    # staged append: all three writes land OUTSIDE the live tables, so
    # a crash before _STAGED never perturbs the index
    for sub in ("bands", "sigs"):
        if _lsh_table_state(f"{index_path}/{sub}") == "epoch":
            raise ValueError(
                f"LSH index {sub} table at {index_path} has the _epoch "
                "streaming layout; run compact_lsh_index before batch "
                "ingest (the staged append writes the flat layout)."
            )
    meta = _lsh_index_meta(
        index_path, num_hashes, bands, shingle_n, n_buckets, create=True
    )
    num_hashes, bands, shingle_n, n_buckets = meta
    kept_sigs.withColumn(
        "_sb", F.pmod(F.xxhash64("_id"), F.lit(n_buckets))
    ).write.mode("overwrite").partitionBy("_sb").parquet(f"{staging}/sigs")
    _band_table(kept_sigs, num_hashes, bands).withColumn(
        "_bb", F.pmod(F.xxhash64("bh"), F.lit(n_buckets))
    ).write.mode("overwrite").partitionBy("_bb").parquet(f"{staging}/bands")
    kept.select(F.col(id_col).alias("_id")).write.mode("overwrite").parquet(
        f"{staging}/kept_ids"
    )
    with open(os.path.join(staging, "_STAGED"), "w") as fh:
        fh.write("ok")
    if _fail_after_stage:
        raise RuntimeError("simulated crash after staging, before commit")
    _commit_batch_staging(index_path, staging, marker)
    return kept


def list_lsh_batches(index_path: str) -> list[str]:
    """committed batch ids recorded in the index (sorted) — the
    manifest a retention sweep enumerates."""
    import os

    _require_local(index_path)
    root = f"{index_path}/_batches"
    return sorted(os.listdir(root)) if os.path.isdir(root) else []


def expire_lsh_batches(
    spark, index_path: str, batch_ids: list[str], strict: bool = True
) -> None:
    """TTL / retention sweep: remove whole ingest batches from the
    index.  Each ``_batches/<id>`` marker (written by
    ``dedup_ingest_batch``) records exactly the doc ids that batch
    contributed; expiry processes batches ONE AT A TIME —
    ``delete_from_lsh_index`` over that batch's keep-set, then its
    marker drops — so a crash leaves every earlier batch fully expired
    and the current one retryable (delete is idempotent; marker
    removal comes after it, else a crash would leak the rows forever).

    ``strict=True`` (default) raises on a batch id with no marker —
    silently expiring nothing would defeat a retention requirement.
    After a crashed multi-batch sweep, retry with ``strict=False`` (or
    re-enumerate via :func:`list_lsh_batches`): already-expired
    batches' markers are gone and are skipped.

    Attribution caveat (by design, document-level dedup): a doc is
    recorded in the ONE batch that first kept it; later batches that
    re-submit it drop it as a duplicate and do NOT refresh attribution.
    Expiring an old batch therefore deletes docs that newer batches
    re-submitted inside the retention window — the next arrival simply
    re-ingests them as novel.  Retention policies that must never drop
    recently-re-seen content should refresh attribution at probe time
    (move matched index ids into the current batch's manifest) before
    relying on batch expiry."""
    import os
    import shutil

    _require_local(index_path)
    for bid in batch_ids:
        marker = f"{index_path}/_batches/{bid}"
        if not os.path.isdir(marker):
            if strict:
                raise FileNotFoundError(
                    f"no committed batch marker {marker} — wrong id, the "
                    "batch never committed, or it was already expired "
                    "(retry a crashed sweep with strict=False)"
                )
            continue
        if _lsh_table_state(marker) not in ("absent", "empty"):
            # empty = all-duplicate batch: nothing indexed, marker only
            delete_from_lsh_index(
                spark, index_path, spark.read.parquet(marker).select("_id")
            )
        shutil.rmtree(marker, ignore_errors=True)


def delete_from_lsh_index(spark, index_path: str, ids) -> None:
    """remove documents from the persisted LSH index (takedowns,
    recrawl-replaced urls, TTL expiry) — the DELETE twin of the
    append-only build.

    Bucket-pruned, the merge_by_url rule (plans/checkpoint.py:183)
    applied to the index: a doc's sig lives in ``_sb =
    pmod(xxhash64(id), n_buckets)`` and its band rows in the ``_bb``
    buckets of its (sig-derived, deterministic) band hashes, so the
    rewrite reads and swaps ONLY those buckets; untouched bucket files
    stay byte-identical on disk.  Cost tracks the DELETE BATCH, not the
    corpus.  Crash windows use the checkpoint tier's staged-swap
    treatment (``__swap`` sibling dir + recover_swaps, rolled forward
    by every probe/build via ``_recover_lsh_compaction``); bands swap
    BEFORE sigs, and either half-state probes correctly (a band
    collision without a sig row drops at the inner sig join, so a
    half-deleted doc never resurfaces).  Requires the flat (batch /
    compacted) layout — run ``compact_lsh_index`` on a streaming index
    first (epoch partitions would make per-bucket swaps span epochs).

    ``ids``: list of doc-id values, or a single-column DataFrame of
    them.  Ids absent from the index are a no-op.
    """
    import os
    import uuid

    from open_semantic_etl_spark.plans.checkpoint import _swap_buckets

    _recover_lsh_compaction(index_path)
    import json

    meta_path = os.path.join(index_path, "_lsh_meta.json")
    with open(meta_path) as f:  # deleting from a non-index raises loudly
        meta = json.load(f)
    num_hashes, bands, n_buckets = (
        meta["num_hashes"], meta["bands"], meta["n_buckets"]
    )
    for sub in ("bands", "sigs"):
        state = _lsh_table_state(f"{index_path}/{sub}")
        if state in ("absent", "empty"):
            return  # nothing indexed yet — delete is a no-op
        if state == "epoch":
            raise ValueError(
                f"LSH index {sub} table at {index_path} has the _epoch "
                "streaming layout; run compact_lsh_index before deleting."
            )
    if isinstance(ids, DataFrame):
        ids_df = ids.toDF("_del_id").dropDuplicates(["_del_id"])
    else:
        ids = list(ids)
        if not ids:
            return
        ids_df = spark.createDataFrame(
            [(i,) for i in ids], ["_del_id"]
        ).dropDuplicates(["_del_id"])
    cand_buckets = [
        r[0]
        for r in ids_df.select(
            F.pmod(F.xxhash64("_del_id"), F.lit(n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    ]
    sigs_path = f"{index_path}/sigs"
    bands_path = f"{index_path}/bands"
    cand_sigs = spark.read.parquet(sigs_path).filter(
        F.col("_sb").isin(cand_buckets)
    )
    del_sigs = cand_sigs.join(
        F.broadcast(ids_df), cand_sigs["_id"] == ids_df["_del_id"]
    ).select("_id", "sig", "_sb")
    # rewrite only buckets where deleted rows ACTUALLY exist — ids not
    # in the index must leave every file byte-identical, not churn
    # their would-be bucket (cand_buckets only prunes the lookup scan).
    # The deleted docs' band rows are recomputed FROM THEIR SIGS
    # (deterministic), so the touched _bb set is exact too — no scan of
    # the full bands table.
    sig_buckets = [r[0] for r in del_sigs.select("_sb").distinct().collect()]
    del_bands = _band_table(del_sigs.select("_id", "sig"), num_hashes, bands).withColumn(
        "_bb", F.pmod(F.xxhash64("bh"), F.lit(n_buckets))
    )
    band_buckets = [r[0] for r in del_bands.select("_bb").distinct().collect()]
    if not band_buckets and not sig_buckets:
        return
    # bands first: once a doc's band rows are gone it can never match,
    # whatever happens to its sig rows before the retry finishes
    for path, part_col, buckets in (
        (bands_path, "_bb", band_buckets),
        (sigs_path, "_sb", sig_buckets),
    ):
        if not buckets:
            continue
        keep = (
            spark.read.parquet(path)
            .filter(F.col(part_col).isin(buckets))
            .join(F.broadcast(ids_df), F.col("_id") == F.col("_del_id"), "left_anti")
        )
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        keep.write.mode("overwrite").partitionBy(part_col).parquet(tmp)
        _swap_buckets(tmp, path, buckets, part_col=part_col)


def compact_lsh_index(spark, index_path: str, n_buckets: int = 64) -> None:
    """fold a streaming index's ``_epoch=<n>`` partitions into the flat
    bucket layout ``build_lsh_index`` writes for batch use.

    Thousands of micro-batch epochs mean thousands of tiny files per
    bucket — the classic small-file problem; compaction rewrites each
    table once (epoch column dropped, one shuffle on the partition key)
    and swaps it in with the checkpoint tier's tmp+rename recipe.
    Crash windows are closed by ``_recover_lsh_compaction`` (run here
    and by every probe): the rename gap restores the old layout, stale
    staging dirs are reaped.  The two tables swap independently — a
    crash between them leaves bands flat and sigs epoched, which both
    readers handle (each checks for ``_epoch`` per table).  Run
    between streaming sessions, not concurrently with
    stream_dedup_ingest: the retry-exclusion filter needs the epoch
    column while a stream is live, and within-checkpoint replays are
    the only replays the epoch trick protects."""
    import os
    import shutil
    import uuid

    _recover_lsh_compaction(index_path)
    for sub, part_col in (("bands", "_bb"), ("sigs", "_sb")):
        path = f"{index_path}/{sub}"
        df = spark.read.parquet(path)
        if "_epoch" in df.columns:
            df = df.drop("_epoch")
        flat = df.repartition(n_buckets, F.col(part_col))
        # tmp write reads the live dir (renames happen strictly after,
        # so no checkpoint copy is needed), then the two renames swap
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        flat.write.mode("overwrite").partitionBy(part_col).parquet(tmp)
        old = f"{path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
