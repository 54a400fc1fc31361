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

  final case class Report(filesBefore: Int, filesAfter: Int, bytes: Long, outFiles: Int)

  private def dataFiles(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
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
