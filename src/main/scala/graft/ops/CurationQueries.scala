package graft.ops

import graft.plans.GroupTopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/**
 * Training-data curation operators: per-bucket document selection (via the
 * custom GroupTopK whole-plan operator), deterministic train/val/test
 * splitting, and benchmark decontamination — the selection/partitioning
 * layer that sits between dedup (DedupQueries) and similarity search
 * (SimilarityQueries) in a corpus pipeline.
 *
 * Scale notes:
 *  - q51 exercises graft.plans.GroupTopK: partial per-partition bounded
 *    heaps → one exchange carrying ≤ (tasks × groups × k) rows → final
 *    heaps. The window `row_number` formulation it replaces shuffles and
 *    sorts the entire corpus.
 *  - q52's split assignment is a pure per-row hash — no shuffle at all;
 *    at 100 TB the split is computed inline wherever the row already is,
 *    which is why hash-splitting (not random sampling) is how production
 *    pipelines carve reproducible train/val/test partitions.
 *  - q53 broadcasts the benchmark shingle set (eval suites are tiny) and
 *    streams the training side through one broadcast semi-structure join +
 *    one aggregate — contamination checking without moving the corpus.
 */
object CurationQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Top-3 longest documents per language, via the custom plan operator.
    // Ordering is total (n_chars DESC, doc_id ASC) so output is exactly
    // what the window formulation yields — which is what the oracle runs.
    "q51_top_docs_per_lang" -> { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"lang", $"n_chars")
      GroupTopK(docs, Seq($"lang"), Seq($"n_chars".desc, $"doc_id".asc), 3)
        .orderBy($"lang", $"n_chars".desc, $"doc_id")
    },

    // Deterministic train/val/test split: bucket by the first hex digit of
    // md5(doc_id) — 0..b → train (12/16), c..d → val (2/16), e..f → test
    // (2/16). Reproducible across engines, runs, and cluster sizes; adding
    // data never reassigns an existing document.
    "q52_train_val_split" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("h", substring(md5($"doc_id".cast("string")), 1, 1))
        .select($"doc_id",
          when($"h" <= "9" || $"h" === "a" || $"h" === "b", "train")
            .when($"h" === "c" || $"h" === "d", "val")
            .otherwise("test").as("split"))
        .orderBy($"doc_id")
    },

    // Benchmark decontamination: training docs (doc_id ≥ 20) that share at
    // least one word-5-gram shingle with the benchmark set (doc_id < 20).
    // n_shared = distinct shingles in common — the evidence a curation run
    // would log before dropping the document.
    "q53_decontamination" -> { (s, dir) =>
      import s.implicits._
      val sh = DedupQueries.shingleRows(s, dir)
      val benchSh = sh.filter($"doc_id" < 20).select($"shingle").distinct()
      sh.filter($"doc_id" >= 20)
        .join(broadcast(benchSh), "shingle")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy($"doc_id")
    }
  )

  private val shingleCte =
    """sh AS (
      |  SELECT doc_id,
      |         unnest(list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t) - 3)])) AS shingle
      |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), ' ') AS t FROM documents) s)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q51_top_docs_per_lang" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 3 ORDER BY lang, n_chars DESC, doc_id""".stripMargin,

    "q52_train_val_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '9'
        |         OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('a', 'b') THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q53_decontamination" ->
      s"""WITH $shingleCte,
         |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20)
         |SELECT doc_id, COUNT(*) AS n_shared
         |FROM sh JOIN bench USING (shingle)
         |WHERE doc_id >= 20
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
