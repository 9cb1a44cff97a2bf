package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Partition-pruned output tables — the write-side layout discipline
  * that makes 100 TB readable: data is written `partitionBy` the scan
  * keys (typically a date bucket + a categorical), so downstream
  * queries touch only matching directories (`PartitionFilters` in the
  * scan, verified in PartitionedTableSpec).
  *
  * `sortWithinPartitions` on the remaining filter column keeps row
  * groups clustered so min/max statistics prune pages within files.
  */
final class PartitionedTableSink(
    tablePath: String,
    partitionCols: Seq[String],
    sortCols: Seq[String] = Nil) extends Serializable {

  /** Batch/foreachBatch writer: dynamic partition overwrite, so a
    * replayed batch rewrites only the partitions it touches. */
  def write(df: DataFrame, batchId: Long = 0L): Unit = {
    val sorted =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(col): _*)
      else df
    sorted.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(tablePath)
  }

  def read(spark: SparkSession): DataFrame = spark.read.parquet(tablePath)
}
