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

  /** w-token shingles joined with a char that can't appear in tokens. */
  def shingles(text: Column, w: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    // sequence(0, n-w) enumerates shingle start offsets; slice is 1-based.
    filter(
      transform(sequence(lit(0), greatest(n - lit(w), lit(0))),
        i => when(n >= w, concat_ws(" ", slice(toks, i + 1, lit(w))))),
      s => s.isNotNull)
  }
}
