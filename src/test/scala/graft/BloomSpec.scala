package graft

import graft.functions.BloomFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom prefilter contract behind q73: zero false negatives
  * (membership is never missed, so the verify join loses nothing) and a
  * false-positive rate compatible with the filter's sizing. */
class BloomSpec extends AnyFunSuite with SparkSuite {

  test("no false negatives: every inserted key passes might_contain") {
    import spark.implicits._
    val keys = (0 until 5000).map(i => s"key-$i").toDF("k")
    val bloom = BloomFunctions.build(keys, $"k", expectedItems = 5000L, numBits = 60000L)
    val missed = keys.filter(!BloomFunctions.mightContain(spark, bloom, $"k")).count()
    assert(missed === 0L)
  }

  test("false positives stay near the designed rate") {
    import spark.implicits._
    val keys = (0 until 5000).map(i => s"key-$i").toDF("k")
    // ~12 bits/key with the sketch's optimal hash count → fpp well under 1%
    val bloom = BloomFunctions.build(keys, $"k", expectedItems = 5000L, numBits = 60000L)
    val probes = (0 until 20000).map(i => s"absent-$i").toDF("k")
    val fp = probes.filter(BloomFunctions.mightContain(spark, bloom, $"k")).count()
    assert(fp.toDouble / 20000 < 0.02, s"fp rate ${fp / 20000.0}")
  }

  test("bloom prefilter + verify join equals the exact decontamination answer") {
    val exact = SparkEntry.queries("q53_decontamination")(spark, sf0001).collect().toSeq
    val bloomed = SparkEntry.queries("q73_decontamination_bloom")(spark, sf0001).collect().toSeq
    assert(bloomed === exact)
  }
}
