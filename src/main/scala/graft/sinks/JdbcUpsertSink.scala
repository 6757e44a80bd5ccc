package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** JDBC upsert sink — the `ON CONFLICT` contract of the reference's Postgres
  * writes (S5/S6; `pg.rs:143-398`, `841-872`), for mirroring this engine's
  * tables into a Postgres-compatible store from `foreachBatch`.
  *
  * `DataFrameWriter.jdbc` has no ON CONFLICT, so the sink renders chunked
  * multi-row statements itself, with the reference's exact parameter-ceiling
  * chunking: `(65535 / ncols) / 10 * 10` rows per statement (`pg.rs:31-32`).
  * Statement generation is pure (unit-testable without a database); the
  * executor side is a plain `foreachPartition` handed a JDBC connection
  * factory.
  */
object JdbcUpsertSink {

  val MaxBindParams = 65535

  /** Reference chunk sizing (`pg.rs:852`). */
  def chunkRows(ncols: Int): Int = (MaxBindParams / ncols) / 10 * 10

  /** `INSERT INTO t (cols) VALUES (...),(...) ON CONFLICT (keys) DO UPDATE
    * SET c = excluded.c, ...` ≙ `pg.rs:721-730`. */
  def upsertSql(table: String, cols: Seq[String], keys: Seq[String], rows: Int): String = {
    require(rows > 0 && rows <= chunkRows(cols.size), s"chunk must be 1..${chunkRows(cols.size)}")
    val tuple = cols.map(_ => "?").mkString("(", ", ", ")")
    val updates = cols.filterNot(keys.contains).map(c => s"$c = excluded.$c").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES ${Seq.fill(rows)(tuple).mkString(", ")} " +
      s"ON CONFLICT (${keys.mkString(", ")}) DO UPDATE SET $updates"
  }

  /** `ON CONFLICT DO NOTHING` variant ≙ `pg.rs:176-184`. */
  def insertIgnoreSql(table: String, cols: Seq[String], keys: Seq[String], rows: Int): String = {
    require(rows > 0 && rows <= chunkRows(cols.size), s"chunk must be 1..${chunkRows(cols.size)}")
    val tuple = cols.map(_ => "?").mkString("(", ", ", ")")
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES ${Seq.fill(rows)(tuple).mkString(", ")} " +
      s"ON CONFLICT (${keys.mkString(", ")}) DO NOTHING"
  }

  /** Write a micro-batch with upsert semantics: one transaction per
    * partition, statements chunked at the reference ceiling. The connection
    * factory keeps the sink testable (and driverless in this environment).
    *
    * `renderSql` is a DIALECT SEAM: by default the Postgres ON CONFLICT
    * statements above; the embedded-Derby integration test (SinksSpec)
    * supplies standard-SQL renderers so the EXECUTOR plumbing — one
    * connection + transaction per partition, the chunk loop, multi-row
    * positional binding — runs against a real JDBC engine in this sandbox,
    * where no Postgres exists (the ON CONFLICT text itself stays pinned by
    * the statement-generation specs). `chunkSizeOverride` lets that test
    * force many chunks per partition without a 65k-param fixture; it can
    * only LOWER the ceiling, never exceed it. */
  def writeUpsert(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      connectionFactory: () => java.sql.Connection,
      doNothing: Boolean = false,
      chunkSizeOverride: Option[Int] = None,
      renderSql: Option[(Seq[String], Seq[String], Int, Boolean) => String] = None): Unit = {
    val cols = df.columns.toSeq
    val chunk = chunkSizeOverride.getOrElse(chunkRows(cols.size))
    require(chunk > 0 && chunk <= chunkRows(cols.size),
      s"chunk override must be 1..${chunkRows(cols.size)}: $chunk")
    df.foreachPartition { (rows: Iterator[Row]) =>
      val conn = connectionFactory()
      try {
        conn.setAutoCommit(false)
        rows.grouped(chunk).foreach { batch =>
          val sql = renderSql match {
            case Some(render) => render(cols, keys, batch.size, doNothing)
            case None =>
              if (doNothing) insertIgnoreSql(table, cols, keys, batch.size)
              else upsertSql(table, cols, keys, batch.size)
          }
          val st = conn.prepareStatement(sql)
          var i = 1
          batch.foreach { r =>
            (0 until cols.size).foreach { c => st.setObject(i, r.get(c)); i += 1 }
          }
          st.executeUpdate()
          st.close()
        }
        conn.commit()
      } finally conn.close()
    }
  }
}
