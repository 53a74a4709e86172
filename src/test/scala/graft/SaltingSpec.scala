package graft

import graft.ops.Salting
import org.scalatest.funsuite.AnyFunSuite

/** Salted joins must be result-identical to plain joins. */
class SaltingSpec extends AnyFunSuite with SparkSuite {

  private def skewed = {
    import spark.implicits._
    // key 1 is hot (100 rows), keys 2..5 have one row each
    ((1 to 100).map(i => (1L, s"hot$i")) ++ (2 to 5).map(k => (k.toLong, s"cold$k")))
      .toDF("k", "payload")
  }

  private def dim = {
    import spark.implicits._
    Seq((1L, "one"), (2L, "two"), (3L, "three"), (6L, "six")).toDF("k", "name")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String)] =
    df.select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(t => (t._1, t._2)).toSeq

  test("salted equi-join equals the plain join (all keys salted)") {
    val plain = skewed.join(dim, "k")
    val salted = Salting.saltedEquiJoin(skewed, dim, "k", n = 8)
    assert(canon(salted) === canon(plain))
    assert(!salted.columns.contains(Salting.SaltCol))
  }

  test("hot-key-only salting replicates selectively and still matches") {
    val plain = skewed.join(dim, "k")
    val salted = Salting.saltedEquiJoin(skewed, dim, "k", n = 8, onlyKeys = Some(Set(1L)))
    assert(canon(salted) === canon(plain))
  }
}
