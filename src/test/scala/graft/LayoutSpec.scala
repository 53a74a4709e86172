package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The write-side z-order layout: correctness of the bit interleave and
  * the measurable locality win it buys per written file. */
class LayoutSpec extends AnyFunSuite with SparkSuite {

  test("zValue interleaves bits (known values) and preserves order locality") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (7L, 7L))
      .toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b", 8).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows((0L, 0L)) === 0L)
    assert(rows((1L, 0L)) === 1L)  // a on even bits
    assert(rows((0L, 1L)) === 2L)  // b on odd bits
    assert(rows((1L, 1L)) === 3L)
    // 5=101, 3=011 → z = interleave: a bits at 0,2,4 → 1,0,1; b bits at 1,3,5 → 1,1,0
    assert(rows((5L, 3L)) === (1L | (1L << 1) | (0L << 2) | (1L << 3) | (1L << 4) | (0L << 5)))
    assert(rows((7L, 7L)) === 63L)
  }

  test("zValue matches its SQL twin on fixture data") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_custkey", ($"o_orderkey" % 1024L).as("k2"))
    val viaColumn = d.select(Layout.zValue($"o_custkey", $"k2", 16).as("z"))
      .agg(sum($"z")).head().getLong(0)
    val viaSql = d.select(expr(Layout.zValueSql("o_custkey", "k2", 16)).as("z"))
      .agg(sum($"z")).head().getLong(0)
    assert(viaColumn === viaSql)
  }

  test("out-of-range values saturate to the top cell, never alias in-range keys") {
    import spark.implicits._
    val z = Seq((1L, 0L), ((1L << 8) + 1L, 0L), ((1L << 20) + 5L, 3L), (255L, 3L))
      .toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b", 8).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // a low-bits wrap would map 257 onto key 1's cell; saturation must not
    assert(z((257L, 0L)) !== z((1L, 0L)))
    // everything past the cap lands in the axis's top cell
    assert(z(((1L << 20) + 5L, 3L)) === z((255L, 3L)))
  }

  test("property: zValue round-trips — deinterleaving recovers (a, b)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val gen = Gen.zip(Gen.choose(0L, (1L << 16) - 1), Gen.choose(0L, (1L << 16) - 1))
    val prop = Prop.forAll(gen) { case (a, b) =>
      val z = Seq((a, b)).toDF("a", "b")
        .select(Layout.zValue($"a", $"b", 16).as("z"))
        .head().getLong(0)
      var (ra, rb) = (0L, 0L)
      for (i <- 0 until 16) {
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      ra == a && rb == b
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)
  }

  test("z-order layout shrinks per-file bounding boxes vs hash layout") {
    import spark.implicits._
    def area(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("f", input_file_name())
        .groupBy($"f")
        .agg(((max($"o_custkey") - min($"o_custkey") + 1) *
              (max($"day") - min($"day") + 1)).as("area"))
        .agg(avg($"area")).head().getDouble(0)

    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("day",
        datediff($"o_orderdate".cast("date"), lit("1992-01-01").cast("date")).cast("long"))
      .select($"o_custkey", $"day")
    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Layout.layoutBy(orders, "o_custkey", "day", bits = 16, partitions = 8)
      .write.parquet(s"$base/zorder")
    orders.repartition(8).write.parquet(s"$base/hash")

    val zArea = area(spark.read.parquet(s"$base/zorder"))
    val hashArea = area(spark.read.parquet(s"$base/hash"))
    // hash layout: every file spans ~the whole (cust × day) rectangle;
    // z-order files must cover a fraction of it
    assert(zArea * 2 < hashArea,
      s"z-order avg file area $zArea not better than hash $hashArea")
  }

  test("sorted shards: disjoint key ranges per file, sorted within, nothing lost") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val base = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Layout.sortedShards(orders, Seq("o_orderkey"), shards = 6)
      .write.parquet(s"$base/sorted")
    val back = spark.read.parquet(s"$base/sorted")
    assert(back.count() === orders.count())
    // per-file [min, max] ranges must not overlap — the whole point of the
    // range layout: a key predicate prunes entire shards from footer stats
    val ranges = back.withColumn("f", input_file_name())
      .groupBy($"f")
      .agg(min($"o_orderkey").as("lo"), max($"o_orderkey").as("hi"))
      .orderBy($"lo")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"shard ranges overlap: hi $hi1 > next lo $lo2")
      case _ => ()
    }
    // rows are sorted inside each shard file
    val unsorted = back.withColumn("f", input_file_name())
      .withColumn("prev", lag($"o_orderkey", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"f")
          .orderBy(monotonically_increasing_id())))
      .filter($"prev".isNotNull && $"prev" > $"o_orderkey")
    assert(unsorted.count() === 0L, "rows out of order within a shard file")
  }

  test("compaction merges small files, preserves content exactly, and cleans up") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val base = java.nio.file.Files.createTempDirectory("graft-compact")
    val dir = s"$base/frag"
    // simulate incremental-ingest fragmentation: 16 small files
    orders.repartition(16).write.parquet(dir)
    val wanted = orders.orderBy($"o_orderkey").collect().toSeq
    val n = orders.count()
    val (before, after) = Layout.compact(spark, dir, targetRowsPerFile = n)
    assert(before === 16)
    assert(after === 1, s"expected a single compacted file, got $after")
    // content is bit-identical, layout-only change
    val back = spark.read.parquet(dir).orderBy($"o_orderkey").collect().toSeq
    assert(back === wanted, "compaction changed row content")
    // no scratch dirs left behind
    val leftovers = java.nio.file.Files.list(base)
    try {
      val names = leftovers.map[String](_.getFileName.toString)
        .toArray.map(_.toString).toSet
      assert(names === Set("frag"), s"scratch dirs leaked: $names")
    } finally leftovers.close()
    // a smaller target yields multiple files, ceil-divided
    val (_, after2) = Layout.compact(spark, dir, targetRowsPerFile = (n / 3) + 1)
    assert(after2 === 3)
    assert(spark.read.parquet(dir).count() === n)
  }

  test("compaction rejects partitioned roots and recovers from a crashed swap") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority")
    val base = java.nio.file.Files.createTempDirectory("graft-compact2")
    // Hive-partitioned layout must be refused, not silently flattened
    val part = s"$base/part"
    orders.write.partitionBy("o_orderpriority").parquet(part)
    val err = intercept[IllegalArgumentException] {
      Layout.compact(spark, part, targetRowsPerFile = 1000)
    }
    assert(err.getMessage.contains("leaf"))
    // crash between the two renames: root gone, data stranded in .compact-bak
    val dir = s"$base/leaf"
    orders.drop("o_orderpriority").repartition(4).write.parquet(dir)
    val n = orders.count()
    val root = java.nio.file.Paths.get(dir)
    val bak = root.resolveSibling("leaf.compact-bak")
    java.nio.file.Files.move(root, bak)
    val (before, after) = Layout.compact(spark, dir, targetRowsPerFile = n)
    assert(before === 4, "stranded backup not restored before compacting")
    assert(after === 1)
    assert(spark.read.parquet(dir).count() === n)
    assert(!java.nio.file.Files.exists(bak))
  }

  test("dynamic partition overwrite replaces only the incoming day; reruns are idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-dpo").toString
    val twoDays = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 30.0)).toDF("id", "day", "v")
    Layout.overwritePartitions(twoDays, dir, "day")
    // Re-run day 1 with corrected rows: day 2 must be untouched.
    val day1Fixed = Seq((1L, "2024-01-01", 11.0), (4L, "2024-01-01", 40.0))
      .toDF("id", "day", "v")
    Layout.overwritePartitions(day1Fixed, dir, "day")
    val got = spark.read.parquet(dir)
      .select(col("id"), col("day").cast("string"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "2024-01-01", 11.0), (4L, "2024-01-01", 40.0),
      (3L, "2024-01-02", 30.0)))
    // Replaying the identical day converges to the same state (idempotent).
    Layout.overwritePartitions(day1Fixed, dir, "day")
    assert(spark.read.parquet(dir).count() === 3)
    // dynamic mode is writer-scoped, never leaked into the session conf
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_ != "dynamic"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
