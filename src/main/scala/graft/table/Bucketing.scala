package graft.table

import org.apache.spark.sql.DataFrame

/** Storage bucketing: co-locate future equi joins at write time.
  *
  * Two tables bucketed by the same column into the same bucket count join
  * with ZERO shuffle exchange — the 100 TB co-located join path for repeated
  * cell-keyed joins (pages↔polygons↔tiles), and the local-catalog analog of
  * writing the Iceberg table bucket-partitioned by cell
  * (north_rule "partitioning handled explicitly"). One shuffle is paid once
  * at write; every later join on the bucket column is exchange-free.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, name: String, bucketCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(name)
}
