package graft

import graft.ops.KMeans
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

/** Training invariants for the spherical k-means IVF trainer — the gates
  * behind the rows-only q72 registry entry. */
class KMeansSpec extends AnyFunSuite with SparkSuite {

  private lazy val e = {
    import spark.implicits._
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast(ArrayType(DoubleType)).as("emb"))
  }

  private lazy val model = KMeans.fit(e, k = 8, iters = 4)

  test("objective is monotonically non-increasing across Lloyd iterations") {
    val t = model.objective
    assert(t.size === 5) // seed + 4 iterations
    t.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective rose: $t")
    }
    // training genuinely moved: final strictly better than the seed cells
    assert(t.last < t.head)
  }

  test("every vector lands in exactly one of k cells") {
    val a = KMeans.assign(e, model.centroids)
    assert(a.count() === e.count())
    assert(a.select("vec_id").distinct().count() === e.count())
    val cells = a.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(model.centroids.size === 8)
    assert(cells.subsetOf(model.centroids.map(_._1).toSet))
  }

  test("objective stays monotone on NON-unit-norm inputs (spherical update)") {
    import spark.implicits._
    // scale each vector by 1..7: mean-of-raw would over-weight the long
    // ones and can raise the objective; the normalized update must not
    val scaled = e.withColumn("emb",
      expr("transform(emb, x -> x * (1 + vec_id % 7))"))
    val m = KMeans.fit(scaled, k = 8, iters = 4)
    m.objective.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective rose on scaled input: ${m.objective}")
    }
    assert(m.objective.last < m.objective.head)
  }

  test("assignment is the argmax-cosine cell (driver-side cross-check)") {
    import spark.implicits._
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val sample = KMeans.assign(e, model.centroids)
      .filter($"vec_id" % 97 === 0) // a handful of spread-out vectors
      .collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val emb = r.getAs[scala.collection.Seq[Double]]("emb").toSeq
      val best = model.centroids.map { case (c, cent) => (c, cosine(emb, cent)) }
        .maxBy { case (c, cs) => (cs, -c) } // ties → lowest cell id
      assert(r.getAs[Int]("cell") === best._1,
        s"vec ${r.getAs[Long]("vec_id")} assigned ${r.getAs[Int]("cell")}, argmax ${best._1}")
    }
  }
}
