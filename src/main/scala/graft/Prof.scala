package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.DedupOps._
import graft.Tables.t
object Prof {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def tm[A](n: String)(f: => A): A = { val t0=System.nanoTime; val r=f; println(f"PROF $n ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    // warm
    t(s,d,"documents").count()
    val sig = t(s, d, "documents").select(col("doc_id"),
      graft.expressions.TextHashes.minhash_signature(col("text"), 32, 3).as("sig"))
      .filter(size(col("sig")) > 0)
    tm("sig"){ sig.write.format("noop").mode("overwrite").save() }
    val banded = sig.select(col("doc_id"), explode(lshBands(col("sig"),32,4)).as("b")).persist()
    tm("banded"){ banded.count() }
    val cand = banded.as("a").join(banded.as("b"),
      col("a.b")===col("b.b") && col("a.doc_id")<col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct().persist()
    tm("cand"){ println("cand="+cand.count()) }
    val candIds = cand.select(explode(array(col("doc_a"),col("doc_b"))).as("doc_id")).distinct()
    def shOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), array_distinct(shingles3(split(col("text")," "))).as("sh"))
      .filter(size(col("sh"))>0)
    val candDocs = shOf(t(s,d,"documents").join(broadcast(candIds), Seq("doc_id"), "left_semi"))
    tm("candDocs"){ candDocs.write.format("noop").mode("overwrite").save() }
    val shA = candDocs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val shB = candDocs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val out = cand.join(shA,"doc_a").join(shB,"doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"),col("sh_b"))))
      .withColumn("jaccard", round(col("inter")/(size(col("sh_a"))+size(col("sh_b"))-col("inter")),4))
      .filter(col("jaccard")>=0.5).select("doc_a","doc_b","jaccard")
    tm("verify"){ out.write.format("noop").mode("overwrite").save() }
    s.stop()
  }
}
