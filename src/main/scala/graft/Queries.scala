package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query surface — every scan / projection / filter / join /
  * aggregate / sort / window / set-op semantic the reference executes
  * (SURVEY.md §2.1-2.6), re-expressed over the driver test tables.
  *
  * Reference citations (relative to /root/reference/):
  *  - left equi-joins on a single key: pb_etl/tasks.py:168-181,218-230,409-423
  *  - per-column max aggregation:      pb_etl/tasks.py:198-203
  *  - global count / mean:             pb_etl/tasks.py:438,443
  *  - per-column distinct:             pb_etl/tasks.py:281
  *  - column-subset projection:        pb_etl/tasks.py:200
  *  - scalar normalization (x/max):    pb_etl/tasks.py:235-244
  *
  * Design rules for oracle parity (the driver hash-compares against
  * DuckDB): deterministic ORDER BY on a unique key in every query,
  * explicit rounding on any float that is the result of arithmetic
  * (summation order differs between engines at the last ulp), aliases
  * identical between the DataFrame code and the oracle SQL.
  *
  * Scale rules: dimension sides of joins are broadcast; aggregations are
  * partial+final hash aggregates (Catalyst default); all filters and
  * projections sit directly on the parquet scan so pushdown applies.
  */
object Queries extends QueriesRelational
  with QueriesAnalytics with QueriesDistributions
