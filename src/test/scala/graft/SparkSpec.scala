package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"

  /** Recursive *.parquet census under `path` — shared by the layout /
    * compaction file-count assertions.
    */
  def parquetFiles(path: String): Seq[java.io.File] = {
    val d = new java.io.File(path)
    if (!d.exists) Nil
    else d.listFiles.toSeq.flatMap {
      case f if f.isDirectory => parquetFiles(f.getPath)
      case f if f.getName.endsWith(".parquet") => Seq(f)
      case _ => Nil
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalogImplementation", "in-memory")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
