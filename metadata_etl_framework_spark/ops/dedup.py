"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design (the point of each):
- exact: hash-groupBy on a normalized fingerprint — one shuffle on a
  16-byte key, the cheapest possible full-corpus dedup.
- MinHash+LSH: shingles → K minhashes → B bands; candidate pairs come
  from a self-join on (band_id, band_hash) buckets, so the join touches
  only colliding documents instead of the O(n²) cross product.
- SimHash: 64-bit signature; near-dup candidates share signature bands.
- n-gram Jaccard: exact verification on candidate pairs only.

All hashing uses xxhash64/md5 built-ins (JVM-side, deterministic across
runs and cluster sizes). No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metadata_etl_framework_spark.ops.text import fingerprint


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: (fingerprint,
    dup_count, doc_ids). Downstream keeps min(doc_id) per group."""
    fp = fingerprint(df, text_col)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct, sorted for determinism)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_sort(F.array_distinct(grams))


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 64, shingle_n: int = 3,
) -> DataFrame:
    """K minhash values per doc: min over shingles of xxhash64(shingle, seed_k).

    Seeded xxhash64 gives K independent hash families without UDFs; the
    whole signature computes in one projection (no shuffle).
    """
    sh = shingles(text_col, shingle_n)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(k))))
            for k in range(num_hashes)
        ]
    )
    return df.select(id_col, sig.alias("minhash"))


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id",
    num_bands: int = 16, rows_per_band: int = 4,
) -> DataFrame:
    """MinHash-LSH banding: docs sharing any band bucket become candidate
    pairs (id_a < id_b). The self-join is on (band, band_hash) — at 100 TB
    this is a shuffle on small keys, never a cross join."""
    bands = F.posexplode(
        F.array(
            *[
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("minhash", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                )
                for b in range(num_bands)
            ]
        )
    )
    banded = signatures.select(id_col, bands.alias("band", "band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates()
    )


def jaccard_similarity(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (verification stage)."""
    sh = df.select(F.col(id_col), shingles(text_col, shingle_n).alias("sh"))
    j = (
        pairs.join(sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a", "id_b",
        F.round(
            F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)), 6
        ).alias("jaccard"),
    )


def minhash_near_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8, num_hashes: int = 64,
    num_bands: int = 16, shingle_n: int = 3,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → banded candidates → exact
    Jaccard filter ≥ threshold. Returns (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    pairs = lsh_candidate_pairs(sigs, id_col, num_bands, num_hashes // num_bands)
    return jaccard_similarity(df, pairs, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word tokens: bit b of the signature is the sign
    of the sum over tokens of ±1 per hash-bit. Pure column algebra —
    shift/mask via integer arithmetic, summed with aggregate()."""
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_exprs = []
    for b in range(64):
        # bit b of each token hash → +1/-1, summed over tokens
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b if b < 63 else -(2**63))) != 0, 1).otherwise(-1),
        )
        bit_exprs.append(F.when(votes > 0, F.lit(1).cast("long") * (1 << b if b < 63 else 1)).otherwise(0))
    # assemble lower 63 bits (sign bit kept 0 to stay in long range)
    sig = bit_exprs[0]
    for e in bit_exprs[1:63]:
        sig = sig + e
    return df.select(id_col, sig.alias("simhash"))
