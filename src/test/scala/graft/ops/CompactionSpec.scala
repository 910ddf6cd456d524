package graft.ops

import graft.SparkSpec
import java.nio.file.Files

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses a sprawl of small files, content intact") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (0 until 5000).map(i => (i.toLong, s"row$i"))
      .toDF("id", "payload")
    df.repartition(20).write.parquet(dir) // sink sprawl: 20 tiny files
    val before = spark.read.parquet(dir)
      .inputFiles.length
    assert(before >= 20)
    val checksum = spark.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.bit_xor(
        org.apache.spark.sql.functions.xxhash64($"id", $"payload")))
      .head.getLong(0)

    val nOut = Compaction.compactParquet(spark, dir,
      targetBytes = 64L * 1024 * 1024)
    assert(nOut == 1)
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length < before / 4)
    assert(after.count() == 5000)
    val checksumAfter = after
      .agg(org.apache.spark.sql.functions.bit_xor(
        org.apache.spark.sql.functions.xxhash64($"id", $"payload")))
      .head.getLong(0)
    assert(checksumAfter == checksum, "content changed during compaction")
  }
}
