package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashing primitives shared by the dedup/fingerprint operators.
  *
  * All hashing is md5-based rather than xxhash64/murmur because md5
  * is bit-identical across engines (SURVEY §5): any SQL engine can
  * reproduce these signatures, which makes every dedup operator
  * oracle-checkable and makes signatures portable across engine
  * versions — important when a 100 TB dedup run is incremental and
  * signatures persist between runs.
  */
object Hashing {
  /** 60-bit non-negative hash: first 15 hex chars of md5 → long.
    * 60 bits keeps it positive in a signed 64-bit long on every
    * engine while leaving headroom for bit tricks.
    */
  def hex60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant — family of independent hash functions for
    * MinHash permutations.
    */
  def hex60Seeded(seed: Int, c: Column): Column = hex60(concat(lit(s"$seed:"), c))

  /** Whitespace tokenization (the engine's canonical split). */
  def tokens(text: Column): Column = {
    val t = split(trim(text), "\\s+")
    filter(t, x => length(x) > 0)
  }

  /** Distinct sorted token set — the unit for Jaccard similarity. */
  def tokenSet(text: Column): Column = array_sort(array_distinct(tokens(text)))

  /** w-token shingles over an ALREADY-BOUND token-array column.
    *
    * The argument must be a plain column reference, not an inline
    * expression: anything inlined here appears inside the transform
    * lambda and is re-evaluated once PER SHINGLE OFFSET (an O(n²)
    * blowup — callers project `tokens(text)` into its own column
    * first; a multiply-referenced non-cheap alias survives
    * CollapseProject). One `when` guard outside the transform
    * (sequence(1, 0) would count DOWN, so short docs need the
    * explicit empty-array branch).
    */
  def shinglesOf(toks: Column, w: Int): Column = {
    val n = size(toks)
    when(n >= w,
      transform(sequence(lit(1), n - lit(w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Convenience form — ONLY for one-shot expressions where the
    * token array can't be projected first; prefer
    * `select(tokens(text).as("toks"))` + [[shinglesOf]] in hot paths.
    */
  def shingles(text: Column, w: Int): Column = shinglesOf(tokens(text), w)
}
