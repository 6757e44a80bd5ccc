package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.ReferenceSchemas

/** Column-level parity audit of the StructType registry against the
  * reference DDL (`migrations/2022-04-27-111623_initial/up.sql`): every
  * table the reference creates must be declared with the same column set,
  * and each column's Spark type must be the SURVEY §1.2 mapping of its
  * Postgres type. Parses the DDL at test time so DDL drift in a future
  * reference refresh fails a named test instead of silently diverging.
  */
class SchemaParitySpec extends AnyFunSuite {

  private val upSqlPath =
    "/root/reference/migrations/2022-04-27-111623_initial/up.sql"

  private def stripComments(sql: String): String =
    sql.linesIterator.map { l =>
      val i = l.indexOf("--")
      if (i >= 0) l.substring(0, i) else l
    }.mkString("\n")

  /** table → ordered (column, pgType) pairs, with `INHERITS (txs)` children
    * expanded to parent ∪ own columns (own re-declarations win, as in PG). */
  private lazy val ddlTables: Map[String, Seq[(String, String)]] = {
    val sql = stripComments(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(upSqlPath)), "UTF-8"))
    val create = """(?s)CREATE TABLE IF NOT EXISTS\s+(\w+)\s*\((.*?)\)\s*(INHERITS\s*\(\s*txs\s*\))?\s*;""".r
    // the lazy `(.*?)\)` stops at the FIRST `)` that is followed by
    // `INHERITS`/`;` at depth 0 — good enough here because the DDL's only
    // nested parens are in constraint/type suffixes, which we re-balance:
    def splitTopLevel(body: String): Seq[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      body.foreach {
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c =>
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          cur += c
      }
      if (cur.nonEmpty) out += cur.toString
      out.toSeq.map(_.trim).filter(_.nonEmpty)
    }
    val skip = Set("constraint", "primary", "foreign", "unique", "check")
    val raw: Map[String, (Seq[(String, String)], Boolean)] = create.findAllMatchIn(sql).map { m =>
      val name = m.group(1)
      // re-balance: the lazy match may have stopped inside nested parens —
      // extend the body until parens balance
      var body = m.group(2)
      var extra = m.source.toString.substring(m.end(2))
      while (body.count(_ == '(') > body.count(_ == ')') && extra.nonEmpty) {
        val i = extra.indexOf(')')
        body += extra.substring(0, i + 1)
        extra = extra.substring(i + 1)
      }
      val cols = splitTopLevel(body).flatMap { entry =>
        val toks = entry.split("\\s+").toSeq
        if (toks.isEmpty || skip(toks.head.toLowerCase)) None
        else {
          // multi-word types: "character varying(…)", "timestamp with[out] time zone"
          val t = toks.tail.map(_.toLowerCase)
          val pg =
            if (t.headOption.contains("character")) "varchar"
            else if (t.headOption.contains("timestamp")) "timestamp"
            else if (t.headOption.contains("double")) "double"
            else t.headOption.getOrElse("")
          Some(toks.head.toLowerCase -> pg.replaceAll("\\(.*", ""))
        }
      }
      val inherits = m.group(3) != null
      name -> (cols, inherits)
    }.toMap
    raw.map { case (name, (own, inherits)) =>
      val cols =
        if (!inherits) own
        else {
          val parent = raw("txs")._1
          val ownNames = own.map(_._1).toSet
          parent.filterNot(c => ownNames(c._1)) ++ own
        }
      name -> cols
    }
  }

  /** SURVEY §1.2 Postgres→Spark mapping; returns whether `dt` is an
    * acceptable Spark rendering of `pgType`. */
  private def typeOk(pgType: String, dt: DataType): Boolean = pgType match {
    case "bigint" | "int8" => dt == LongType
    case "integer" | "int4" | "int" | "serial" => dt == IntegerType
    case "smallint" | "int2" => dt == ShortType
    case "varchar" | "text" | "jsonb" => dt == StringType
    case "text[]" => dt.isInstanceOf[ArrayType] &&
      dt.asInstanceOf[ArrayType].elementType == StringType
    case "bool" | "boolean" => dt == BooleanType
    case "timestamptz" | "timestamp" => dt == TimestampType
    case "numeric" | "decimal" => dt.isInstanceOf[DecimalType]
    case "bytea" => dt == BinaryType
    case other => fail(s"unmapped Postgres type '$other'")
  }

  test("up.sql parses into the expected table inventory") {
    assume(new java.io.File(upSqlPath).isFile, "reference DDL not present")
    assert(ddlTables.keySet == ReferenceSchemas.tables.keySet,
      s"DDL-only: ${ddlTables.keySet -- ReferenceSchemas.tables.keySet}; " +
        s"registry-only: ${ReferenceSchemas.tables.keySet -- ddlTables.keySet}")
  }

  for (name <- ReferenceSchemas.tables.keys.toSeq.sorted)
    test(s"$name columns and types match the reference DDL") {
      assume(new java.io.File(upSqlPath).isFile, "reference DDL not present")
      val ddl = ddlTables.getOrElse(name, fail(s"$name missing from up.sql"))
      val struct = ReferenceSchemas.tables(name)
      val structByName = struct.fields.map(f => f.name -> f.dataType).toMap
      assert(ddl.map(_._1).toSet == structByName.keySet,
        s"$name DDL-only cols: ${ddl.map(_._1).toSet -- structByName.keySet}; " +
          s"registry-only: ${structByName.keySet -- ddl.map(_._1).toSet}")
      for ((col, pg) <- ddl)
        assert(typeOk(pg, structByName(col)),
          s"$name.$col: Postgres '$pg' vs Spark ${structByName(col)}")
    }
}
