"""Bloom-prefiltered incremental dedup (ops/dedup.py bloom section).

Pins the three properties that make the prefilter sound:
1. no false negatives — every true member is a Bloom hit, even with a
   deliberately undersized bitmap;
2. prefilter + confirm == plain membership join (the output is EXACT);
3. determinism — the JVM xxhash64 double-hashing is stable across runs,
   so two builds over the same corpus produce byte-identical filters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_etl_framework_spark.ops.dedup import (
    bloom_incremental_dedup,
    bloom_might_contain,
    build_bloom_filter,
)
from metadata_etl_framework_spark.ops.text import fingerprint


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_no_false_negatives_even_undersized(spark):
    seen = _docs(spark, [(i, f"document number {i}") for i in range(200)])
    new = _docs(
        spark,
        [(1000 + i, f"document number {i}") for i in range(0, 200, 2)]  # dups
        + [(2000 + i, f"fresh text {i}") for i in range(50)],            # novel
    )
    fp_seen = fingerprint(seen).select("fingerprint")
    # 256 bits for 200 entries: heavily saturated, many false positives —
    # but NEVER a false negative
    bf = build_bloom_filter(fp_seen, m_bits=256, k=3)
    probed = bloom_might_contain(fingerprint(new), bf, k=3)
    misses = probed.filter(
        (F.col("doc_id") < 2000) & ~F.col("bf_hit")
    ).count()
    assert misses == 0


def test_confirmed_output_equals_plain_join(spark):
    seen = _docs(
        spark,
        [(i, f"seen doc {i % 37}") for i in range(300)] + [(400, None)],
    )
    new = _docs(
        spark,
        [(1000 + i, f"seen doc {i}") for i in range(60)]   # 37 dup, 23 novel
        + [(3000, None), (3001, ""), (3002, "   ")],        # null/empty family
    )
    out = {
        r.doc_id: (r.is_exact_dup, r.keep)
        for r in bloom_incremental_dedup(new, seen, m_bits=1 << 12).collect()
    }
    fp_new = fingerprint(new).select("doc_id", "fingerprint")
    fp_seen = fingerprint(seen).select(F.col("fingerprint").alias("_f"))
    plain = {
        r.doc_id: r.dup
        for r in fp_new.join(
            fp_seen.dropDuplicates(), fp_new.fingerprint == F.col("_f"), "left"
        )
        .select("doc_id", F.col("_f").isNotNull().alias("dup"))
        .collect()
    }
    assert set(out) == set(plain) and len(out) == 63
    for d, (is_dup, keep) in out.items():
        assert is_dup == plain[d] and keep == (not is_dup)
    # NULL text fingerprints as '' — and '' exists nowhere in seen except
    # the NULL row, so all three degenerate docs agree with the join
    assert out[3000][0] and out[3001][0] and out[3002][0]


def test_build_deterministic_and_triage_mode_superset(spark):
    seen = _docs(spark, [(i, f"body {i}") for i in range(500)])
    fp = fingerprint(seen).select("fingerprint")
    assert build_bloom_filter(fp, m_bits=1 << 14, k=4) == build_bloom_filter(
        fp.repartition(7), m_bits=1 << 14, k=4
    )
    # confirm=False (triage) flags a superset of the exact answer
    new = _docs(
        spark,
        [(10_000 + i, f"body {i}") for i in range(100)]
        + [(20_000 + i, f"novel {i}") for i in range(100)],
    )
    triage = bloom_incremental_dedup(new, seen, m_bits=1 << 14, confirm=False)
    exact = bloom_incremental_dedup(new, seen, m_bits=1 << 14, confirm=True)
    t = {r.doc_id for r in triage.filter("is_exact_dup").collect()}
    e = {r.doc_id for r in exact.filter("is_exact_dup").collect()}
    assert e <= t and len(e) == 100


def test_lsh_tuning_recommends_sane_banding():
    from metadata_etl_framework_spark.ops.dedup import lsh_tuning

    rec = lsh_tuning(0.8, num_hashes=64)
    assert rec["bands"] * rec["rows"] == 64
    # the S-curve's 50% point should land near the target threshold
    assert abs(rec["s50"] - 0.8) < 0.15
    assert rec["p_at_threshold"] > 0.4
    # a low threshold wants more bands (steeper early curve)
    low = lsh_tuning(0.3, num_hashes=64)
    assert low["bands"] > rec["bands"]

    import pytest as _pt
    with _pt.raises(ValueError):
        lsh_tuning(1.5)


def test_lsh_quality_report_on_known_corpus(spark):
    from metadata_etl_framework_spark.ops.dedup import lsh_quality_report

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [(1, base), (2, base + " extra"), (3, "completely different words "
            "nothing shared here at all with anything else whatsoever")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = lsh_quality_report(df, threshold=0.5, num_hashes=64,
                             num_bands=16).collect()[0]
    assert row.n_true_pairs == 1          # docs 1-2 only
    assert row.n_agreeing_pairs == row.n_emitted_pairs == 1
    assert row.precision == 1.0 and row.recall == 1.0

    import pytest as _pt
    with _pt.raises(ValueError):
        lsh_quality_report(df, max_rows=1)
