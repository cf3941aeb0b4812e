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
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def tm[A](n: String)(f: => A): A = { val t0=System.nanoTime; val r=f; println(f"PROF $n ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    val sh = t(s,d,"documents").select(col("doc_id"), array_distinct(shingles3(split(col("text")," "))).as("sh")).filter(size(col("sh"))>0)
    tm("shingles.count"){ println("docs=" + sh.count()) }
    val hashes = sh.withColumn("hashes", transform(col("sh"), x => xxhash64(x))).select("doc_id","hashes")
    tm("hashes"){ hashes.write.format("noop").mode("overwrite").save() }
    val sig = hashes.select(col("doc_id"), minhashSignatureFromHashes(col("hashes"),32).as("sig"))
    tm("signatures"){ sig.write.format("noop").mode("overwrite").save() }
    val banded = sig.select(col("doc_id"), explode(lshBands(col("sig"),32,4)).as("b")).persist()
    tm("banded.count"){ println("banded=" + banded.count()) }
    tm("bucket stats"){
      banded.groupBy("b").count().agg(max("count"),avg("count"),count(lit(1))).show()
    }
    val cand = banded.as("a").join(banded.as("b"),
      col("a.b")===col("b.b") && col("a.doc_id")<col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    tm("cand.count"){ println("cand=" + cand.count()) }
    s.stop()
  }
}
