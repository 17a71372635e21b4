package graft

import org.apache.spark.sql.functions._

/** Smoke coverage of the driver contract: every `queries` entry runs on the
  * smallest SF and returns a sane result; every oracle key has a query;
  * `entry` returns rows (the driver's smoke check).
  */
class EntrySpec extends SparkTest {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries run at sf0.001 and are non-empty where expected") {
    val mayBeEmpty = Set("q_minhash_dups", "q_simhash_dups", "q_embedding_dups",
      "q_ngram_jaccard", "q_scan_filter")
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, dir).count()
      assert(n >= 0, name)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
