package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path for the reference's TSV export contract
  * (k-means.sh:4,45 — `TSVWithNames`, nulls as a single space), with the
  * full two-phase commit protocol the V1 `DataFrameWriter.csv` path hides:
  *
  *   - every task writes its partition to a STAGING file named by
  *     (partition, task attempt) — speculative or retried attempts collide
  *     on neither names nor content;
  *   - each task's `commit()` returns the staged name as its commit
  *     message; `abort()` deletes the attempt's file;
  *   - the driver's job `commit(messages)` publishes EXACTLY the files
  *     named in the messages by renaming them into the destination and
  *     writing `_SUCCESS`; job `abort()` removes the staging dir, leaving
  *     the destination untouched — a failed job publishes NOTHING.
  *
  * Paths go through the Hadoop FileSystem API, so the same protocol holds
  * on HDFS/object-store-with-rename; on S3-like stores swap the rename
  * publish for a manifest commit (the usual trade, noted here rather than
  * hidden). Each file carries its own header row, the TSVWithNames shape.
  *
  * Usage: `df.write.format("graft-tsv").option("path", dir).save()` (or
  * `.save(dir)`); append mode only (the export is a log, not a table).
  */
class TsvSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"
  // write-only source: nothing to infer, the written schema arrives via
  // LogicalWriteInfo
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tsv requires option 'path'"))
    TsvTable(path, schema)
  }
}

case class TsvTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"tsv($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = TsvBatchWrite(path, info.schema())
      }
    }
}

case class TsvBatchWrite(path: String, schema: StructType) extends BatchWrite {
  // one id per WRITE JOB: repeated appends into the same destination can
  // never collide on staged or published names
  private val jobId = java.util.UUID.randomUUID().toString.take(8)
  private def staging = s"${path}_staging/$jobId"
  private def fs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(new org.apache.hadoop.conf.Configuration())

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    TsvWriterFactory(staging, schema, jobId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dest = new org.apache.hadoop.fs.Path(path)
    val f = fs(dest)
    f.mkdirs(dest)
    messages.foreach { case TsvCommitMessage(staged) =>
      val s = new org.apache.hadoop.fs.Path(staged)
      f.rename(s, new org.apache.hadoop.fs.Path(dest, s.getName))
    }
    f.create(new org.apache.hadoop.fs.Path(dest, "_SUCCESS"), true).close()
    cleanupStaging(f)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging(fs(new org.apache.hadoop.fs.Path(staging)))

  /** Remove this job's staging subdir, then the shared staging parent if
    * (and only if) no concurrent job still stages under it.
    */
  private def cleanupStaging(f: org.apache.hadoop.fs.FileSystem): Unit = {
    f.delete(new org.apache.hadoop.fs.Path(staging), true)
    val parent = new org.apache.hadoop.fs.Path(path + "_staging")
    try {
      if (f.exists(parent) && f.listStatus(parent).isEmpty)
        f.delete(parent, false)
    } catch { case _: java.io.IOException => () } // concurrent writer won the race
  }
}

case class TsvWriterFactory(staging: String, schema: StructType, jobId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TsvDataWriter(staging, schema, jobId, partitionId, taskId)
}

case class TsvCommitMessage(stagedPath: String) extends WriterCommitMessage

class TsvDataWriter(staging: String, schema: StructType, jobId: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val staged = new org.apache.hadoop.fs.Path(
    s"$staging/part-$partitionId-$jobId-$taskId.tsv")
  private val fs =
    staged.getFileSystem(new org.apache.hadoop.conf.Configuration())
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(staged, true), java.nio.charset.StandardCharsets.UTF_8))
  out.write(schema.fieldNames.mkString("\t")); out.write("\n")

  override def write(record: InternalRow): Unit = {
    val cells = schema.fields.indices.map { i =>
      if (record.isNullAt(i)) " " // the reference's null representation
      else record.get(i, schema.fields(i).dataType).toString
    }
    out.write(cells.mkString("\t")); out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    TsvCommitMessage(staged.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(staged, false)
  }

  override def close(): Unit = ()
}
