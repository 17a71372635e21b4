package graft

import org.apache.spark.sql.functions._

/** Scratch decomposition probe for q_minhash_dups (not part of the contract). */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    t("shingles only")(sh.write.format("noop").mode("overwrite").save())
    t("shingles x2")(sh.write.format("noop").mode("overwrite").save())
    val sig = sh.select(col("id"), Dedup.minhash(col("sh"), 33).as("sig"))
    t("sig")(sig.write.format("noop").mode("overwrite").save())
    val bucketed = sig
      .select(col("id"), col("sig"), explode(typedLit((0 until 11).toArray)).as("band"))
      .select(col("id"), col("band"),
        xxhash64(col("band"), concat_ws(",", slice(col("sig"), col("band") * 3 + 1, lit(3))))
          .as("bucket"))
    t("bucketed")(bucketed.write.format("noop").mode("overwrite").save())
    val l = bucketed.select(col("band"), col("bucket"), col("id").as("a"))
    val r = bucketed.select(col("band"), col("bucket"), col("id").as("b"))
    val cand = l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
    t("candidates")(println("  n=" + cand.count()))
    val full = Dedup.minhashDuplicates(docs, col("doc_id"), col("text"),
      bands = 11, rowsPerBand = 3, threshold = 0.8)
    t("full")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
