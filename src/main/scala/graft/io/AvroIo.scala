package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on the avro + avro-mapred
  * jars Spark already ships (there is no spark-avro module on this
  * classpath, so the engine provides its own interop surface — Avro is the
  * lingua franca of Kafka/log-pipeline handoffs an ingestion engine must
  * read).
  *
  * Scale shape: the read path goes through `AvroInputFormat`, which splits
  * container files on their sync markers — a single 10 GB Avro file fans
  * out across executors like parquet does, instead of pinning to one task
  * the way a naive whole-file `binaryFiles` reader would. Records convert
  * to `Row`s inside the same stage (no driver collect, nothing
  * non-serializable crosses a shuffle; the writer/reader schema travels as
  * its JSON string and is parsed once per task).
  *
  * Supported column types: LONG, INT, DOUBLE, STRING, BOOLEAN — each
  * nullable via the standard `["null", T]` union. That covers every
  * relational surface this engine exchanges; nested records are out of
  * scope (the reference's interop is flat tables).
  */
object AvroIo {

  /** Map a flat Catalyst schema to an Avro record schema (nullable unions). */
  def toAvroSchema(schema: StructType, name: String = "row"): Schema = {
    def prim(dt: DataType): Schema.Type = dt match {
      case LongType    => Schema.Type.LONG
      case IntegerType => Schema.Type.INT
      case DoubleType  => Schema.Type.DOUBLE
      case StringType  => Schema.Type.STRING
      case BooleanType => Schema.Type.BOOLEAN
      case other => throw new IllegalArgumentException(
        s"AvroIo supports flat LONG/INT/DOUBLE/STRING/BOOLEAN columns, got $other")
    }
    val fields = schema.fields.map { f =>
      val t = Schema.createUnion(List(
        Schema.create(Schema.Type.NULL), Schema.create(prim(f.dataType))).asJava)
      new Schema.Field(f.name, t, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Write one Avro container file per partition under `dir`
    * (`part-NNNNN.avro`). Fixture/interop writer: it writes directly
    * (no commit protocol), so treat the target as write-once — the
    * production-grade transactional sink in this engine is the parquet
    * VersionStore; this exists to produce hand-off files and test inputs. */
  def write(df: DataFrame, dir: String): Unit = {
    val schemaJson = toAvroSchema(df.schema).toString
    val sparkSchema = df.schema
    val conf = new org.apache.hadoop.conf.Configuration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val serConf = new SerializableWritable(conf)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fs = FileSystem.get(new java.net.URI(dir), serConf.value)
      val out = fs.create(new Path(dir, f"part-$idx%05d.avro"), true)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, out)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, if (row.isNullAt(i)) null else row.get(i))
        }
        writer.append(rec)
        n += 1
      }
      writer.close()
      Iterator(n)
    }.count(): Unit
  }

  /** Read every Avro container file under `dir` into a DataFrame, with
    * sync-marker splitting. The schema comes from the first file's header
    * (one bounded driver-side open, like the CSV header sniff). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val fs = FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    val first = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).minBy(_.getName)
    val stream = new DataFileStream(fs.open(first),
      new GenericDatumReader[GenericRecord]())
    val avroSchema = try stream.getSchema finally stream.close()
    val sparkSchema = toSparkSchema(avroSchema)
    val schemaJson = avroSchema.toString

    val rdd = spark.sparkContext.hadoopFile(
        s"$dir/*.avro",
        classOf[AvroInputFormat[GenericRecord]],
        classOf[AvroWrapper[GenericRecord]],
        classOf[NullWritable])
      .mapPartitions { recs =>
        val schema = new Schema.Parser().parse(schemaJson)
        val names = schema.getFields.asScala.map(_.name).toArray
        recs.map { case (wrapper, _) =>
          val r = wrapper.datum()
          Row.fromSeq(names.toIndexedSeq.map { n =>
            r.get(n) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case v => v
            }
          })
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Inverse of [[toAvroSchema]] for the supported flat shapes. */
  def toSparkSchema(schema: Schema): StructType = {
    def dt(s: Schema): DataType = s.getType match {
      case Schema.Type.UNION =>
        dt(s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get)
      case Schema.Type.LONG    => LongType
      case Schema.Type.INT     => IntegerType
      case Schema.Type.DOUBLE  => DoubleType
      case Schema.Type.STRING  => StringType
      case Schema.Type.BOOLEAN => BooleanType
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
    StructType(schema.getFields.asScala.map(f =>
      StructField(f.name, dt(f.schema), nullable = true)).toArray)
  }

  /** Minimal serializable Hadoop-conf carrier (the standard Spark idiom —
    * Configuration itself is not serializable). */
  private class SerializableWritable(@transient var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = {
      if (conf == null) conf = new org.apache.hadoop.conf.Configuration()
      conf
    }
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }
}
