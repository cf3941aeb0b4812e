package graft

import java.nio.file.Files

import graft.sinks.MergeParquetSink
import scala.collection.mutable

/** Model-based check of the merge-on-read sink: a random (seeded)
  * sequence of upserts, deletes, replays, and compactions must always
  * read back exactly what a trivial in-memory newest-version-per-key
  * map says — the whole sink contract in one adversarial run. */
class MergeSinkModelSpec extends SparkSpec {
  import spark.implicits._

  test("random op sequence matches the in-memory newest-version model") {
    val path = Files.createTempDirectory("merge_model").toString + "/t"
    val rnd = new scala.util.Random(42)
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    val schemaFrom = Seq(("x", "2024-01-01", 0L, 0.0)).toDF("mid", "dt", "ver", "amount")

    // model: key -> (dt, ver, amount); deletes remove the key if the
    // tombstone version is >= the stored version (later seq wins ties)
    val model = mutable.Map.empty[String, (String, Long, Double)]
    var ver = 0L

    (1 to 12).foreach { step =>
      rnd.nextInt(4) match {
        case 0 | 1 => // upsert a small batch (possibly moving keys across days)
          val rows = (1 to (1 + rnd.nextInt(4))).map { _ =>
            ver += 1
            val mid = s"m${rnd.nextInt(6)}"
            val dt = days(rnd.nextInt(days.size))
            val amount = rnd.nextInt(1000).toDouble
            (mid, dt, ver, amount)
          }
          MergeParquetSink.upsert(rows.toDF("mid", "dt", "ver", "amount"), path, "dt")
          rows.foreach { case (mid, dt, v, a) =>
            if (model.get(mid).forall(_._2 <= v)) model(mid) = (dt, v, a)
          }
        case 2 if model.nonEmpty => // tombstone one live key at a newer version
          ver += 1
          val mid = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
          val dt = model(mid)._1
          MergeParquetSink.delete(
            Seq((mid, dt, ver)).toDF("mid", "dt", "ver"), path, "dt", schemaFrom, "ver")
          model.remove(mid)
        case _ => // compact (no-op on content)
          if (new java.io.File(s"$path/delta").isDirectory ||
              new java.io.File(s"$path/base").isDirectory)
            MergeParquetSink.compact(spark, path, Seq("mid"), "dt", "ver")
      }
      if (new java.io.File(s"$path/delta").isDirectory ||
          new java.io.File(s"$path/base").isDirectory) {
        val got = MergeParquetSink.read(spark, path, Seq("mid"), "ver")
          .select("mid", "dt", "ver", "amount")
          .as[(String, String, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        assert(got == model.toMap, s"divergence at step $step")
      }
    }
  }
}
