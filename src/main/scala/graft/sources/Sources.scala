package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.2 rows 1–3): parquet/CSV/JSON readers
  * and writers with explicit schemas.
  *
  * Scale rules baked in:
  *  - always pass an explicit schema to CSV/JSON (schema inference is a
  *    full extra pass over 100 TB);
  *  - readers return plain DataFrames so Catalyst pushdown/pruning applies;
  *  - writers support partition columns (directory pruning at read time)
  *    and a repartition hint to control output file count.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil, numFiles: Int = 0): Unit = {
    val d = if (numFiles > 0) df.repartition(numFiles) else df
    val w = d.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC: the other columnar format with predicate pushdown + column
    * pruning (same DataSource V2 scan machinery as parquet — filters reach
    * the reader, asserted in SourcesAndUdfSpec).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil, numFiles: Int = 0): Unit = {
    val d = if (numFiles > 0) df.repartition(numFiles) else df
    val w = d.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Whole-file binary read (multimodal ingest: images/audio land as one
    * row per file with path, length, and the raw bytes) — the standard
    * entry point for a decode stage over opaque payloads.
    */
  def readBinaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
}
