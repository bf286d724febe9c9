package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` seam a V1 streaming Source needs: a batch's
  * DataFrame must carry `isStreaming = true` on its leaf relation (the
  * MicroBatchExecution contract), and the only constructors for that —
  * `Dataset.ofRows` + `LogicalRelation(isStreaming = true)` — are
  * sql-private. This shim lives inside `org.apache.spark.sql` exactly
  * the way FileStreamSource builds its own batches
  * (FileStreamSource.getBatch: DataSource.resolveRelation →
  * LogicalRelation(…, isStreaming = true)); nothing else in the repo
  * touches private API. */
object StreamShim {

  /** A streaming-tagged parquet relation over an explicit file list
    * (checkFilesExist = false: manifest-listed files are authoritative,
    * exactly like FileStreamSource's log-listed batches). */
  def streamingParquet(spark: SparkSession, files: Seq[String],
                       schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    val ds = DataSource(cs, className = "parquet", paths = files,
      userSpecifiedSchema = Some(schema))
    Dataset.ofRows(cs,
      LogicalRelation(ds.resolveRelation(checkFilesExist = false),
        isStreaming = true))
  }

  /** An empty streaming-tagged relation (a micro-batch in which every
    * candidate version was skipped still must return a batch). */
  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    val attrs = schema.fields.toIndexedSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable, f.metadata)())
    Dataset.ofRows(cs, LocalRelation(attrs, Nil, isStreaming = true))
  }
}
