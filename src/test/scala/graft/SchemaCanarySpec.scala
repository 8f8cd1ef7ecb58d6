package graft

import org.apache.spark.sql.types._

/** Testdata schema-drift canary.
  *
  * The driver regenerates /root/testdata between rounds and has
  * already shipped two different physical encodings of `events.ts`
  * (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)), which silently broke 9
  * queries at bind time in round 9. This spec pins the NORMALIZED
  * schema every operator actually sees (i.e. after Tables' loaders
  * run), so the next regen drift fails ONE test with ONE message
  * naming the table and column instead of 9 scattered bind errors.
  *
  * Timestamp-family columns accept any of {TIMESTAMP, TIMESTAMP_NTZ,
  * DATE}: Tables pins inferTimestampNTZ=false so they read as plain
  * TIMESTAMP today, but all downstream date math (`to_date`,
  * date_trunc) tolerates the family — only a change OUT of the family
  * (e.g. to STRING or LONG) is a real break worth failing on.
  */
class SchemaCanarySpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private val TsFamily: Set[DataType] =
    Set(TimestampType, TimestampNTZType, DateType)

  /** expected type per column; None = any timestamp-family type */
  private val expected: Map[String, Seq[(String, Option[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Some(IntegerType), "r_name" -> Some(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Some(IntegerType), "n_name" -> Some(StringType),
      "n_regionkey" -> Some(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Some(LongType), "c_name" -> Some(StringType),
      "c_nationkey" -> Some(IntegerType), "c_acctbal" -> Some(DoubleType),
      "c_mktsegment" -> Some(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Some(LongType), "s_name" -> Some(StringType),
      "s_nationkey" -> Some(IntegerType), "s_acctbal" -> Some(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Some(LongType), "p_name" -> Some(StringType),
      "p_brand" -> Some(StringType), "p_type" -> Some(StringType),
      "p_size" -> Some(IntegerType), "p_retailprice" -> Some(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Some(LongType), "o_custkey" -> Some(LongType),
      "o_orderstatus" -> Some(StringType), "o_totalprice" -> Some(DoubleType),
      "o_orderdate" -> None, "o_orderpriority" -> Some(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Some(LongType), "l_partkey" -> Some(LongType),
      "l_suppkey" -> Some(LongType), "l_linenumber" -> Some(IntegerType),
      "l_quantity" -> Some(DoubleType), "l_extendedprice" -> Some(DoubleType),
      "l_discount" -> Some(DoubleType), "l_tax" -> Some(DoubleType),
      "l_returnflag" -> Some(StringType), "l_linestatus" -> Some(StringType),
      "l_shipdate" -> None),
    // events is asserted POST-normalization: Tables.events folds every
    // physical ts encoding to the canonical nanos-since-epoch long
    "events" -> Seq(
      "event_id" -> Some(LongType), "ts" -> Some(LongType),
      "user_id" -> Some(LongType), "event_type" -> Some(StringType),
      "value" -> Some(DoubleType), "props" -> Some(StringType)),
    "documents" -> Seq(
      "doc_id" -> Some(LongType), "text" -> Some(StringType),
      "lang" -> Some(StringType), "source" -> Some(StringType),
      "n_chars" -> Some(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Some(LongType),
      "embedding" -> Some(ArrayType(FloatType, containsNull = true)),
      "label" -> Some(IntegerType)))

  test("all 10 testdata tables read with the schemas operators assume") {
    val problems = Tables.names.flatMap { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      val actual = df.schema.map(f => f.name -> f.dataType)
      val exp = expected(t)
      if (actual.map(_._1) != exp.map(_._1))
        Seq(s"$t: columns changed — expected ${exp.map(_._1).mkString(",")}" +
          s" but read ${actual.map(_._1).mkString(",")}")
      else actual.zip(exp).flatMap {
        case ((name, at), (_, Some(et))) if at != et =>
          Some(s"$t.$name: expected ${et.simpleString}, read " +
            s"${at.simpleString}")
        case ((name, at), (_, None)) if !TsFamily(at) =>
          Some(s"$t.$name: expected a timestamp/date type, read " +
            s"${at.simpleString}")
        case _ => None
      }
    }
    assert(problems.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT — the driver regenerated /root/testdata " +
        s"with a different encoding. Fix the Tables loader normalization " +
        s"(Tables.scala) for:\n  ${problems.mkString("\n  ")}")
  }
}
