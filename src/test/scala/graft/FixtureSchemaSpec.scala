package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.ops.Tables

/**
 * Guards against driver-side fixture regeneration drift.
 *
 * The testdata parquet is regenerated between rounds and its physical
 * timestamp encoding has already changed twice (ns-as-long in early rounds,
 * naive µs → TIMESTAMP_NTZ in round 7). Round 6 lost 40 of 120 bench/verify
 * queries to exactly this: `unix_micros` rejects NTZ inputs, and nothing in
 * the unit suite read the real fixtures through Tables.t, so the breakage
 * only surfaced in the driver's gate. These tests pin the normalization
 * contract at the loader seam so the NEXT encoding change fails here first.
 */
class FixtureSchemaSpec extends AnyFunSuite with SparkSuite {

  private val all = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("Tables.t leaves no TIMESTAMP_NTZ column in any fixture table") {
    for (name <- all) {
      val ntz = Tables.t(spark, sf0001, name).schema.fields
        .filter(_.dataType == TimestampNTZType).map(_.name)
      assert(ntz.isEmpty, s"$name: NTZ columns survived normalization: ${ntz.mkString(",")}")
    }
  }

  test("epoch extraction works on every normalized timestamp column") {
    // unix_millis is the strictest consumer (TIMESTAMP only); evaluating it
    // over every timestamp column proves the whole query surface can.
    for (name <- all) {
      val df = Tables.t(spark, sf0001, name)
      val tsCols = df.schema.fields.filter(_.dataType == TimestampType).map(_.name)
      for (c <- tsCols) {
        val n = df.select(unix_millis(col(c)).as("ms")).filter(col("ms").isNotNull).count()
        assert(n > 0, s"$name.$c: unix_millis yielded no non-null values")
      }
    }
  }

  test("embeddings are fixed-width dim-64 vectors (SRP hyperplane contract)") {
    // q121's hyperplane family (SimilarityQueries.srpPlane) and the IVF/
    // cosine fixtures assume dim 64. A regenerated fixture with a new
    // width must fail HERE, not as silent nulls from a zip_with length
    // mismatch (the round-6 NTZ lesson, applied to the vector column).
    val want = graft.ops.SimilarityQueries.EmbDim
    val dims = Tables.t(spark, sf0001, "embeddings")
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq === Seq(want),
      s"embedding dims ${dims.mkString(",")} != $want — update SimilarityQueries.EmbDim and its oracles")
  }

  test("Tables.events exposes ts/ts_ns/ms with consistent instants") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    assert(ev.schema("ms").dataType == LongType)
    // ms must be the millisecond truncation of ts_ns, and ts must agree
    // with ts_ns at µs precision — for every row, independent of encoding.
    val bad = ev.filter(
      col("ms") =!= expr("ts_ns div 1000000") ||
        unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad == 0L)
  }
}
