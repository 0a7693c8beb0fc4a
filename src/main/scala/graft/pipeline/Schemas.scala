package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit schemas-at-scan — the engine never infers types from data,
  * mirroring the reference's dtype-dict discipline
  * (pb_etl/tasks.py:21-43; SURVEY.md §1.2-1.3).
  */
object Schemas {

  /** Training attributes: 19 columns incl. the TARGET label
    * (reference `attr_type`, pb_etl/tasks.py:21-41). */
  val attr: StructType = StructType(Seq(
    StructField("TRANSACTION_ID", LongType),
    StructField("TLD", StringType),
    StructField("REN", LongType),
    StructField("REGISTRAR_NAME", StringType),
    StructField("GL_CODE_NAME", StringType),
    StructField("COUNTRY", StringType),
    StructField("DOMAIN_LENGTH", LongType),
    StructField("HISTORY", StringType),
    StructField("TRANSFERS", LongType),
    StructField("TERM_LENGTH", StringType),
    StructField("RES30", LongType),
    StructField("RESTORES", LongType),
    StructField("REREG", StringType),
    StructField("QTILE", StringType),
    StructField("HD", StringType),
    StructField("NS_V0", DoubleType),
    StructField("NS_V1", DoubleType),
    StructField("NS_V2", DoubleType),
    StructField("TARGET", LongType),
  ))

  /** Forecast attributes: same minus TARGET. The reference reuses the
    * 19-col dtype dict for the 18-col test file (superset-schema
    * tolerance, pb_etl/tasks.py:224-227); in Spark a schema is positional
    * at CSV scan, so the test set gets its own StructType
    * (SURVEY.md §7.4.4). */
  val attrTest: StructType = StructType(attr.fields.filterNot(_.name == "TARGET"))

  /** Traffic score (reference `ts_type`, pb_etl/tasks.py:43). */
  val tscore: StructType = StructType(Seq(
    StructField("TRANSACTION_ID", LongType),
    StructField("TRAFFIC_SCORE", DoubleType),
  ))

  /** Backtest actuals (pb_etl/tasks.py:414-416). */
  val results: StructType = StructType(Seq(
    StructField("TRANSACTION_ID", LongType),
    StructField("TARGET", LongType),
  ))

  /** Column roles (pb_etl/tasks.py:46-61). */
  val attrNorm: Seq[String] =
    Seq("REN", "DOMAIN_LENGTH", "TRANSFERS", "RESTORES", "TRAFFIC_SCORE")
  val catCol: Seq[String] = Seq("TLD", "REGISTRAR_NAME", "GL_CODE_NAME",
    "COUNTRY", "HISTORY", "TERM_LENGTH", "RES30", "REREG", "QTILE", "HD")
  val numCol: Seq[String] = attrNorm ++ Seq("NS_V0", "NS_V1", "NS_V2")
}
