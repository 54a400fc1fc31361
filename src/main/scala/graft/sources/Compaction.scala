package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-maintenance pass every
  * continuously-appended 100 TB dataset needs (the reference's
  * incremental `update_database` appends produce exactly this file
  * fragmentation over time): thousands of KB-sized files turn a scan
  * into an open/seek storm and blow the driver's file index. Compact
  * rewrites a directory to ⌈bytes / targetFileBytes⌉ files.
  *
  * Two modes:
  *  - unsorted: `coalesce` — a NARROW dependency, no shuffle; the
  *    rewrite is pure IO. File sizes may skew with partition sizes.
  *  - sorted (`sortBy = Some(col)`): `repartitionByRange` — one
  *    shuffle, but output files carry disjoint key ranges, so later
  *    range-filtered scans prune whole files via parquet min/max.
  */
object Compaction {

  /** `outFiles` is the computed TARGET ⌈bytes/targetFileBytes⌉;
    * `filesAfter` is what landed. In unsorted mode the two can
    * differ: `coalesce(n)` is a narrow dependency and cannot EXCEED
    * the source partition count, so a source with fewer partitions
    * than the target undershoots (fine for compaction, whose job is
    * merging many small files into fewer, never splitting).
    */
  final case class Report(filesBefore: Int, filesAfter: Int, bytes: Long, outFiles: Int)

  /** All data files under `dir`, RECURSIVELY — a hive-partitioned
    * input (subdirectories only) would otherwise size to bytes=0,
    * collapse the rewrite into nOut=1 unpartitioned file, and lie in
    * the Report. Hidden ("." / "_") files and directories are skipped
    * at every level, matching Spark's own InMemoryFileIndex filter.
    */
  private def dataFiles(spark: SparkSession, dir: String): Array[org.apache.hadoop.fs.FileStatus] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visible(n: String) = !n.startsWith("_") && !n.startsWith(".")
    def walk(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).filter(f => visible(f.getPath.getName)).flatMap { f =>
        if (f.isDirectory) walk(f.getPath) else Array(f)
      }
    walk(new Path(dir))
  }

  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long = 128L << 20,
              sortBy: Option[String] = None): Report = {
    val before = dataFiles(spark, inDir)
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val shaped = sortBy match {
      case Some(c) => df.repartitionByRange(nOut, col(c))
      case None    => df.coalesce(nOut)
    }
    shaped.write.mode("overwrite").parquet(outDir)
    Report(before.length, dataFiles(spark, outDir).length, bytes, nOut)
  }
}
