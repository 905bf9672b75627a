package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Maintenance

/** Small-file compaction: fewer files, identical data, untouched
  * partitions left byte-for-byte alone.
  */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fileCount(path: String, sub: String): Int = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/$sub"))
      .count(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
  }

  test("compactSmallFilePartitions merges oversplit partitions only") {
    val dir = TestSpark.tmpDir("compact")
    val path = s"$dir/t"
    // partition a: 8 tiny files; partition b: 1 file
    (1 to 64).map(i => (i.toLong, s"row$i", "a")).toDF("id", "v", "p")
      .repartition(8).write.partitionBy("p").parquet(path)
    Seq((1000L, "x", "b")).toDF("id", "v", "p")
      .write.mode("append").partitionBy("p").parquet(path)
    assert(Maintenance.partitionFileCounts(spark, path)("p=a") === 8)
    val before = spark.read.parquet(path).collect().toSet

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bBefore = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/p=b"))
      .map(st => st.getPath.getName -> (st.getLen, st.getModificationTime))
      .toMap

    val compacted = Maintenance.compactSmallFilePartitions(
      spark, path, "p", maxFiles = 4)
    assert(compacted === Seq("a"))
    assert(fileCount(path, "p=a") === 1) // tiny partition -> one file
    assert(spark.read.parquet(path).collect().toSet === before)
    // partition b untouched, byte-for-byte
    val bAfter = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/p=b"))
      .map(st => st.getPath.getName -> (st.getLen, st.getModificationTime))
      .toMap
    assert(bAfter === bBefore)
    // second pass: nothing left to compact
    assert(Maintenance.compactSmallFilePartitions(
      spark, path, "p", maxFiles = 4).isEmpty)
  }

  test("co-compacted partitions are each sized from their OWN bytes") {
    val dir = TestSpark.tmpDir("compact_mixed")
    val path = s"$dir/t"
    // big partition a (~16x the data), tiny partition b — both oversplit
    (1 to 16000).map(i => (i.toLong, s"payload_$i" * 20, "a"))
      .toDF("id", "v", "p")
      .repartition(16).write.partitionBy("p").parquet(path)
    (1 to 100).map(i => (i.toLong, s"x$i", "b")).toDF("id", "v", "p")
      .repartition(8).write.mode("append").partitionBy("p").parquet(path)
    val aBytes = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(s"$path/p=a")).getLength
    }
    val before = spark.read.parquet(path).count()
    // target ~a/4: partition a should get ~4 files, tiny b exactly 1 —
    // NOT a's bucket count (which would shatter b into sub-target files)
    Maintenance.compactPartitions(spark, path, "p", Seq("a", "b"),
      targetBytes = aBytes / 4)
    assert(fileCount(path, "p=b") === 1, s"b=${fileCount(path, "p=b")}")
    val aFiles = fileCount(path, "p=a")
    assert(aFiles >= 3 && aFiles <= 6, s"a=$aFiles")
    assert(spark.read.parquet(path).count() === before)
  }

  test("hive-escaped partition values compact correctly end to end") {
    val dir = TestSpark.tmpDir("compact_escaped")
    val path = s"$dir/t"
    // value with a space and a colon — written as "p=v 1%3A2" on disk
    // (hive escapes the colon; spaces stay literal)
    (1 to 32).map(i => (i.toLong, "v 1:2")).toDF("id", "p")
      .repartition(8).write.partitionBy("p").parquet(path)
    val counts = Maintenance.partitionFileCounts(spark, path)
    assert(counts.keys.exists(_.contains("%")), counts.toString) // escaped on disk
    val before = spark.read.parquet(path).collect().toSet
    val compacted = Maintenance.compactSmallFilePartitions(
      spark, path, "p", maxFiles = 4)
    assert(compacted === Seq("v 1:2")) // unescaped runtime value
    assert(fileCount(path, "p=v 1%3A2") === 1)
    assert(spark.read.parquet(path).collect().toSet === before)
  }

  test("zorderWrite: files cover compact 2D rectangles, pruning both columns") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 64x64 uniform grid. A single-column sort makes each file a SLAB:
    // full range in the other column. Z-order files must be rectangles.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("x", "y")
    def avgSpanFraction(path: String): (Double, Double) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect().map(r => (r.getInt(1) / 63.0, r.getInt(2) / 63.0))
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val zDir = TestSpark.tmpDir("zorder") + "/t"
    graft.ops.Maintenance.zorderWrite(grid, zDir, "x", "y",
      numFiles = 16, bits = 6)
    val sDir = TestSpark.tmpDir("slabsort") + "/t"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(sDir)
    val (zx, zy) = avgSpanFraction(zDir)
    val (sx, sy) = avgSpanFraction(sDir)
    // Single-column sort: x tight, y spans everything.
    assert(sx < 0.2 && sy > 0.9, s"slab spans ($sx, $sy)")
    // Z-order: BOTH columns bounded well below the full range — 16 files
    // on a 64x64 grid ideally cover 1/4 x 1/4 rectangles.
    assert(zx < 0.5 && zy < 0.5, s"zorder spans ($zx, $zy)")
    // Same rows, same values — layout only.
    assert(spark.read.parquet(zDir).collect().toSet ===
      grid.collect().toSet)
  }

  test("zorderKey clamps out-of-range values and nulls propagate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = graft.ops.Maintenance.zorderKey(
      col("a"), 0.0, 10.0, col("b"), 0.0, 10.0, bits = 4)
    val rows = Seq((-5.0, 5.0), (99.0, 5.0), (0.0, 0.0), (10.0, 10.0))
      .toDF("a", "b").select(k.as("z")).collect().map(_.getLong(0))
    // clamped corners stay inside [0, 2^(2*4))
    assert(rows.forall(z => z >= 0 && z < 256))
    assert(rows(2) == 0L && rows(3) == 255L)
    val nullRow = Seq((Some(1.0), None: Option[Double]))
      .toDF("a", "b").select(k.as("z")).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("compactPartitions splits a large partition into ~targetBytes files") {
    val dir = TestSpark.tmpDir("compact_split")
    val path = s"$dir/t"
    (1 to 20000).map(i => (i.toLong, s"payload_$i" * 20, "a"))
      .toDF("id", "v", "p")
      .repartition(16).write.partitionBy("p").parquet(path)
    val totalBytes = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(s"$path/p=a")).getLength
    }
    val before = spark.read.parquet(path).count()
    // target a quarter of the partition -> ~4 output files
    Maintenance.compactPartitions(spark, path, "p", Seq("a"),
      targetBytes = totalBytes / 4)
    val n = fileCount(path, "p=a")
    assert(n >= 3 && n <= 6, s"files=$n")
    assert(spark.read.parquet(path).count() === before)
  }
}
