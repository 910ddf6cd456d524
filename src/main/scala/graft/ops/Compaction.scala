package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the maintenance job every streaming sink
  * needs: micro-batches write a file per partition per trigger, and a
  * 100 TB table queried through a million 2 MB files spends its time
  * in footer reads and task scheduling, not scanning. Rewrite the
  * directory into ceil(bytes / targetBytes) files and swap
  * atomically-enough for a single-writer table (write to a sibling
  * temp dir, then move).
  */
object Compaction {

  /** Bytes under `dir` (non-hidden regular files). */
  def dataBytes(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    val stream = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(f => java.nio.file.Files.isRegularFile(f) &&
          !f.getFileName.toString.startsWith("_") &&
          !f.getFileName.toString.startsWith("."))
        .map(java.nio.file.Files.size)
        .sum
    } finally stream.close()
  }

  /** Read → coalesce to the target file count → rewrite. Returns the
    * compacted frame's file count. `coalesce`, not `repartition`: no
    * shuffle — input splits merge map-side, which is all compaction
    * needs (row order within merged files is scan order).
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    // flat-directory contract, checked BEFORE anything is deleted: a
    // partitioned layout or a streaming sink's _spark_metadata
    // subdirectory would otherwise fail the swap mid-deletion and
    // leave the table missing an arbitrary subset of files. Compact
    // partitioned tables per leaf directory; metadata-logged sink
    // output must be rewritten through the log, not swapped under it.
    {
      val p = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.list(p)
      val subdirs =
        try { import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(java.nio.file.Files.isDirectory(_)).map(_.toString)
            .toList }
        finally s.close()
      require(subdirs.isEmpty,
        s"compactParquet works on flat directories only; $dir contains " +
          s"subdirectories: ${subdirs.mkString(", ")}")
    }
    val nOut = math.max(1,
      math.ceil(dataBytes(dir).toDouble / targetBytes).toInt)
    val tmp = dir + "_compacting"
    spark.read.parquet(dir)
      .coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap: remove originals, move compacted files in
    val dirP = java.nio.file.Paths.get(dir)
    val tmpP = java.nio.file.Paths.get(tmp)
    def ls(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.list(p)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq }
      finally s.close()
    }
    ls(dirP).foreach(java.nio.file.Files.delete)
    ls(tmpP).foreach(f => java.nio.file.Files.move(f,
      dirP.resolve(f.getFileName)))
    java.nio.file.Files.delete(tmpP)
    nOut
  }
}
