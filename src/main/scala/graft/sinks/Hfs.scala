package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Storage access through the Hadoop FileSystem API resolved per path
  * scheme, so the merge sink and the stored ANN/LSH index layouts behave
  * identically on `file:`, `hdfs://` and `s3a://` paths. (The previous
  * `java.io.File` listings silently returned empty on any non-local
  * scheme — stale reads instead of errors.) */
object Hfs {

  def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  /** Names of child directories of `path` starting with `prefix`; empty
    * if `path` does not exist. */
  def childDirs(spark: SparkSession, path: String, prefix: String): Seq[String] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
  }

  def deleteRecursive(spark: SparkSession, path: String): Unit = {
    val (f, p) = fs(spark, path)
    if (f.exists(p)) { f.delete(p, true): Unit }
  }

  /** Rename within one filesystem — atomic on HDFS and local FS (the
    * object-store caveat applies on s3a). */
  def rename(spark: SparkSession, from: String, to: String): Unit = {
    val (f, p) = fs(spark, from)
    if (!f.rename(p, new Path(to)))
      throw new java.io.IOException(s"rename $from -> $to failed")
  }

  /** (length, modification time) of a file — freshness fingerprints for
    * stored-index cache tags. */
  def stat(spark: SparkSession, path: String): (Long, Long) = {
    val (f, p) = fs(spark, path)
    val st = f.getFileStatus(p)
    (st.getLen, st.getModificationTime)
  }

  /** Overwrite a tiny marker file (single-block create; readers see the
    * old or the new content, never a torn mix, on HDFS/local). */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val (f, p) = fs(spark, path)
    val out = f.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def readString(spark: SparkSession, path: String): Option[String] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
      finally in.close()
    }
  }
}
