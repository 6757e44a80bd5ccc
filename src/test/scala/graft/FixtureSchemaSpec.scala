package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** Guard against fixture drift: `/root/testdata` has been regenerated
  * mid-build with changed physical encodings (round 6: `events.ts` moved
  * from INT64-nanos to timestamp[us], silently crashing 57 gates). This
  * spec pins the LOADER-NORMALIZED schema of every table at every SF so the
  * next drift fails one named test instead of half the correctness gates.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val sfDirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(sf => s"/root/testdata/$sf")
      .filter(d => new java.io.File(d).isDirectory)

  test("testdata dirs exist") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* fixture dirs found")
  }

  /** name → required (column → normalized type). Extra columns are allowed
    * (additive fixture growth is fine); missing or retyped ones are not. */
  private def req(pairs: (String, DataType)*): Map[String, DataType] = pairs.toMap

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> req("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> req("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> req("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType),
    "supplier" -> req("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType),
    "part" -> req("p_partkey" -> LongType, "p_name" -> StringType),
    "orders" -> req("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType),
    "lineitem" -> req("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "documents" -> req("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> req("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (dir <- sfDirs; (table, cols) <- expected.toSeq.sortBy(_._1))
    test(s"$table schema at ${dir.split('/').last}") {
      val schema = Tables.load(spark, dir, table).schema
      val actual = schema.fields.map(f => f.name -> f.dataType).toMap
      for ((name, dt) <- cols) {
        assert(actual.contains(name), s"$table missing column $name (has ${schema.fieldNames.mkString(",")})")
        // nullable ArrayType containsNull varies by writer — compare erased
        val got = actual(name) match {
          case ArrayType(e, _) => ArrayType(e)
          case other => other
        }
        assert(got == dt, s"$table.$name is ${actual(name)}, expected $dt")
      }
    }

  // events is the table that actually drifted: whatever the physical
  // encoding (INT64-nanos or timestamp[us]/NTZ), the loader must normalize
  // ts to session-UTC TimestampType with microsecond values DuckDB agrees on
  for (dir <- sfDirs)
    test(s"events.ts normalized to TimestampType at ${dir.split('/').last}") {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"events.ts is ${ev.schema("ts").dataType}")
      for (c <- Seq("event_id" -> LongType, "user_id" -> LongType,
          "event_type" -> StringType, "value" -> DoubleType))
        assert(ev.schema(c._1).dataType == c._2, s"events.${c._1} is ${ev.schema(c._1).dataType}")
      // analysis + execution both survive: the r6 break threw at analysis
      assert(ev.limit(1).count() == 1)
    }
}
