package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnShim

/** Column-level API for the engine's custom Catalyst expressions.
  * SQL-side registration lives in [[graft.GraftExtensions]]. */
package object functions {

  def rolling_hash(c: Column): Column =
    ColumnShim.column(RollingHash64(ColumnShim.expression(c)))

  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))

  def winnow_stats(text: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowStats(ColumnShim.expression(text), k, w))

  /** Rabin-Karp window hashes over a token array: element i is the
    * 64-bit hash of tokens [i, i+w) — md5 per token once, O(1) rolling
    * per position (the ExactSubstr kernel). */
  def token_window_hashes(toks: Column, w: Int): Column =
    ColumnShim.column(TokenWindowHashes(ColumnShim.expression(toks), w))

  /** splitmix64 finalizer over a BIGINT column (HashImpls.mix64) —
    * the deterministic shuffle key; DuckDB twin: Exprs.sqlMix64Ctes. */
  def mix64(c: Column): Column =
    ColumnShim.column(Mix64(ColumnShim.expression(c)))

  /** Deflated byte count of a string's UTF-8 bytes (zlib level 6) —
    * the compressibility quality signal. */
  def deflate_size(c: Column): Column =
    ColumnShim.column(DeflateSize(ColumnShim.expression(c)))

  def vec_dot(a: Column, b: Column): Column =
    ColumnShim.column(VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  def word_shingles(text: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(text), n))

  def vec_normalize(a: Column): Column =
    ColumnShim.column(VecNormalize(ColumnShim.expression(a)))

  /** All `tables` md5-seeded random-hyperplane LSH bucket ids of a
    * double vector in one scan (see HashImpls.lshBuckets). */
  def lsh_buckets(a: Column, seedBase: Int, tables: Int, bits: Int): Column =
    ColumnShim.column(LshBuckets(ColumnShim.expression(a), seedBase, tables, bits))

  /** Unicode NFC composition (DuckDB nfc_normalize twin). */
  def nfc_normalize(c: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(c)))

  /** Jaro-Winkler similarity (DuckDB jaro_winkler_similarity twin,
    * bit-identical — see the kernel's contract notes). */
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinkler(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Bloom filter over a BIGINT key column (TypedImperativeAggregate:
    * map-side build, bitwise-OR merge) — returns the serialized filter
    * as BINARY for [[bloom_might_contain]] probes. */
  /** Exact bitmap over a dense BIGINT key domain
    * (TypedImperativeAggregate: map-side build, bitwise-OR merge) —
    * canonical BINARY for rollup tables; the exact twin of
    * [[hll_sketch_agg]]. */
  def bitmap_agg(key: Column): Column =
    ColumnShim.column(BitmapAgg(ColumnShim.expression(key)).toAggregateExpression())

  /** OR persisted bitmaps to a coarser grouping → EXACT distinct count. */
  def bitmap_merge_agg(bm: Column): Column =
    ColumnShim.column(BitmapMergeAgg(ColumnShim.expression(bm)).toAggregateExpression())

  def bloom_agg(key: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    ColumnShim.column(
      BloomFilterAgg(ColumnShim.expression(key), expectedItems, fpp)
        .toAggregateExpression())

  /** Probe a serialized Bloom filter: false ⇒ definitely absent. */
  def bloom_might_contain(filter: Column, key: Column): Column =
    ColumnShim.column(
      BloomMightContain(ColumnShim.expression(filter), ColumnShim.expression(key)))

  /** HLL sketch over a BIGINT key column → 4 KB BINARY sketch
    * (map-side build, element-wise-max merge). Persist at the finest
    * grouping; answer coarser distinct-counts with [[hll_merge_agg]]. */
  def hll_sketch_agg(key: Column): Column =
    ColumnShim.column(HllSketchAgg(ColumnShim.expression(key)).toAggregateExpression())

  /** Merge persisted HLL sketches to a coarser grouping → BIGINT
    * estimate. Sketch-merge is lossless, so rollup == direct sketch. */
  def hll_merge_agg(sketch: Column): Column =
    ColumnShim.column(HllMergeAgg(ColumnShim.expression(sketch)).toAggregateExpression())

  /** Per-row distinct-count estimate of ONE HLL sketch (scalar). */
  def hll_estimate(sketch: Column): Column =
    ColumnShim.column(HllEstimate(ColumnShim.expression(sketch)))

  /** KMV theta sketch over a BIGINT key column → BINARY sketch
    * (map-side build, k-smallest merge). Unlike HLL, supports the
    * full set algebra downstream: [[theta_intersect]] /
    * [[theta_a_not_b]] between independently built sketches. */
  def theta_sketch_agg(key: Column): Column =
    ColumnShim.column(ThetaSketchAgg(ColumnShim.expression(key)).toAggregateExpression())

  /** Roll persisted theta sketches up to a coarser grouping → merged
    * BINARY sketch (lossless; rollup == direct sketch, byte-identical). */
  def theta_union_agg(sketch: Column): Column =
    ColumnShim.column(ThetaUnionAgg(ColumnShim.expression(sketch)).toAggregateExpression())

  /** Distinct-count estimate of a theta sketch (exact below K=4096). */
  def theta_estimate(sketch: Column): Column =
    ColumnShim.column(ThetaEstimate(ColumnShim.expression(sketch)))

  /** |A ∩ B| estimate from two theta sketches (exact when both are
    * below K) — the set operation HLL cannot answer. */
  def theta_intersect(a: Column, b: Column): Column =
    ColumnShim.column(ThetaIntersect(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** |A \ B| estimate from two theta sketches (exact when both below
    * K): churn / exclusive audience. */
  def theta_a_not_b(a: Column, b: Column): Column =
    ColumnShim.column(ThetaANotB(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Count-Min sketch over a BIGINT key column → 64 KB BINARY
    * (map-side build, counter-wise-add merge). The frequency
    * point-query tier: probe with [[cm_estimate]]. */
  def cm_sketch_agg(key: Column): Column =
    ColumnShim.column(CmSketchAgg(ColumnShim.expression(key)).toAggregateExpression())

  /** Counter-wise-add persisted CM sketches to a coarser grouping →
    * merged sketch (BINARY, lossless vs direct build). */
  def cm_merge_agg(sketch: Column): Column =
    ColumnShim.column(CmMergeAgg(ColumnShim.expression(sketch)).toAggregateExpression())

  /** Frequency point query against a serialized CM sketch:
    * overestimates only, by ≤ ⌈e·N/W⌉ w.p. ≥ 1−e^−D. */
  def cm_estimate(sketch: Column, key: Column): Column =
    ColumnShim.column(CmEstimate(ColumnShim.expression(sketch), ColumnShim.expression(key)))

  /** Mergeable t-digest quantiles (TypedImperativeAggregate): partial
    * digests are built map-side and merged after the shuffle — the
    * distributed shape of ClickHouse's quantilesTDigest. */
  def tdigest_quantiles(c: Column, percentages: Seq[Double],
      compression: Int = 300): Column =
    ColumnShim.column(
      TDigestQuantiles(ColumnShim.expression(c.cast("double")), percentages, compression)
        .toAggregateExpression())
}
