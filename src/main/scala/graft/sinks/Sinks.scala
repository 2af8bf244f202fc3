package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

import java.sql.DriverManager

/** Sink abstractions for the streaming pipeline.
  *
  * The reference appends every update-mode re-emission to Postgres,
  * duplicating (customer, day) keys across micro-batches
  * (/root/reference/src/main/scala/com/example/kafka/CustomerSpendingAnalysis.scala:149-180;
  * SURVEY.md §4.3-1). This engine's JDBC sink is an idempotent upsert:
  * `INSERT ... ON CONFLICT (keys) DO UPDATE`, executed per partition with
  * statement batching, so replays and update-mode re-emissions converge to
  * the same table state. Uses plain java.sql so it compiles offline; the
  * actual driver jar is provided at runtime in a real deployment.
  */
object Sinks {

  final case class Jdbc(
      url: String,
      table: String,
      user: String,
      password: String,
      driver: Option[String] = None)

  /** Idempotent upsert of `df` into `jdbc.table` keyed on `keyCols`.
    *
    * Executed with `foreachPartition`: each executor partition opens one
    * connection and batches `batchSize` rows per round trip. The dataframe
    * should be small relative to the DB (a rolled-up aggregate); this is a
    * per-micro-batch sink, not a bulk loader.
    */
  // Identifiers are interpolated into SQL text (placeholders can't bind
  // them), so they must be plain identifiers — rejects injection if the
  // Jdbc config ever becomes user-supplied. Table may be schema-qualified.
  private val Ident = "[A-Za-z_][A-Za-z0-9_]*".r
  private def requireIdent(kind: String, s: String, allowQualified: Boolean = false): String = {
    val parts = if (allowQualified) s.split('.').toSeq else Seq(s)
    require(parts.nonEmpty && parts.forall(p => Ident.matches(p)),
      s"$kind is not a valid SQL identifier: '$s'")
    s
  }

  /** The upsert statement (PostgreSQL ON CONFLICT dialect). Identifiers are
    * validated (letters/digits/underscore; table may be schema-qualified). */
  def upsertSql(table: String, keyCols: Seq[String], valueCols: Seq[String]): String = {
    requireIdent("table", table, allowQualified = true)
    (keyCols ++ valueCols).foreach(requireIdent("column", _))
    val cols = keyCols ++ valueCols
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.mkString(", ")}) DO UPDATE SET " +
      valueCols.map(c => s"$c = EXCLUDED.$c").mkString(", ")
  }

  def upsert(
      df: DataFrame,
      jdbc: Jdbc,
      keyCols: Seq[String],
      valueCols: Seq[String],
      batchSize: Int = 500): Unit = {
    val cols = keyCols ++ valueCols
    val sql = upsertSql(jdbc.table, keyCols, valueCols)
    val (url, user, password, driver) = (jdbc.url, jdbc.user, jdbc.password, jdbc.driver)
    val projected = df.selectExpr(cols: _*)
    projected.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        driver.foreach(Class.forName)
        val conn = DriverManager.getConnection(url, user, password)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            var pending = 0
            rows.foreach { r =>
              var i = 0
              while (i < cols.length) { ps.setObject(i + 1, r.get(i)); i += 1 }
              ps.addBatch()
              pending += 1
              if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
            }
            if (pending > 0) ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } finally conn.close()
      }
    }
  }
}
