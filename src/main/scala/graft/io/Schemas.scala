package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A testdata table arrived with a shape the adapter does not know how to
  * normalize. Named error so a future regen fails loudly with the table,
  * column, and offending type in the message — not as N crashed queries. */
final class GraftSchemaException(msg: String) extends RuntimeException(msg)

/**
 * Schema-adapter layer for the driver-generated testdata tables
 * (TESTDATA.md). The 2026-08-13 regen changed `events.ts` from parquet
 * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and every read site that assumed
 * the old shape crashed (VERDICT r7 "What's wrong #1"). This layer is the
 * r7 ask #6: each table declares the columns the engine depends on plus
 * the type variants it knows how to normalize; anything else raises a
 * named GraftSchemaException instead of a downstream DATATYPE_MISMATCH.
 *
 * Normalization target for `events.ts`: session-timezone TimestampType
 * (sessions run UTC), microsecond precision — the same value DuckDB sees
 * reading the file natively, so oracle epoch arithmetic stays exact.
 */
object Schemas {

  /** Columns the engine reads per table → acceptable arrival types.
    * Types not listed here are adapted (events.ts) or rejected. */
  private val required: Map[String, Seq[(String, DataType => Boolean)]] = {
    val integral: DataType => Boolean = {
      case ByteType | ShortType | IntegerType | LongType => true; case _ => false
    }
    val fractional: DataType => Boolean = {
      case FloatType | DoubleType | _: DecimalType => true; case _ => false
    }
    val string: DataType => Boolean = _ == StringType
    // o_orderdate / l_shipdate ship as parquet timestamp[us] (Spark:
    // TIMESTAMP_NTZ) in the current testdata; every date query and its
    // DuckDB oracle read that shape, so it is validated as-is rather than
    // rewritten. DateType also accepted (a date-typed regen reads
    // identically on both sides under the UTC session).
    val date: DataType => Boolean = {
      case DateType | TimestampType | TimestampNTZType => true; case _ => false
    }
    val tsLike: DataType => Boolean = {
      case LongType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    val floatArray: DataType => Boolean = {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    Map(
      "region"   -> Seq("r_regionkey" -> integral, "r_name" -> string),
      "nation"   -> Seq("n_nationkey" -> integral, "n_regionkey" -> integral, "n_name" -> string),
      "customer" -> Seq("c_custkey" -> integral, "c_nationkey" -> integral, "c_acctbal" -> fractional),
      "supplier" -> Seq("s_suppkey" -> integral, "s_nationkey" -> integral),
      "part"     -> Seq("p_partkey" -> integral, "p_retailprice" -> fractional),
      "orders"   -> Seq("o_orderkey" -> integral, "o_custkey" -> integral,
                        "o_totalprice" -> fractional, "o_orderdate" -> date),
      "lineitem" -> Seq("l_orderkey" -> integral, "l_partkey" -> integral,
                        "l_quantity" -> fractional, "l_extendedprice" -> fractional,
                        "l_discount" -> fractional, "l_shipdate" -> date),
      "events"   -> Seq("event_id" -> integral, "ts" -> tsLike, "user_id" -> integral,
                        "event_type" -> string, "value" -> fractional, "props" -> string),
      "documents" -> Seq("doc_id" -> integral, "text" -> string, "lang" -> string,
                         "source" -> string, "n_chars" -> integral),
      "embeddings" -> Seq("vec_id" -> integral, "embedding" -> floatArray, "label" -> integral)
    )
  }

  /** Validate arrival schema, then normalize known variants. */
  def adapt(name: String, df: DataFrame): DataFrame = {
    required.get(name).foreach { cols =>
      cols.foreach { case (c, ok) =>
        val f = df.schema.fields.find(_.name == c).getOrElse(
          throw new GraftSchemaException(
            s"testdata table '$name': required column '$c' missing " +
              s"(arrived: ${df.schema.fieldNames.mkString(", ")})"))
        if (!ok(f.dataType))
          throw new GraftSchemaException(
            s"testdata table '$name': column '$c' arrived as ${f.dataType.sql}, " +
              "which no adapter rule covers — add a normalization rule in " +
              "graft.io.Schemas before any query reads it")
      }
    }
    if (name == "events") adaptEventsTs(df) else df
  }

  /** Normalize `events.ts` to session-TZ TimestampType (micros):
    *  - LongType: the pre-regen parquet TIMESTAMP(NANOS) shape, surfaced as
    *    raw nanos via spark.sql.legacy.parquet.nanosAsLong — truncate to
    *    micros (DuckDB's epoch() on TIMESTAMP_NS agrees).
    *  - TimestampNTZType: the post-regen TIMESTAMP(MICROS, isAdjustedToUTC
    *    =false) shape — the wall clock IS the UTC instant; with the session
    *    TZ pinned to UTC the cast is value-identity.
    *  - TimestampType: already the target. */
  def adaptEventsTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType    => df
    case other => throw new GraftSchemaException(
      s"testdata table 'events': column 'ts' arrived as ${other.sql} — " +
        "add a normalization rule in graft.io.Schemas.adaptEventsTs")
  }
}
