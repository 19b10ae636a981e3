package graft.io

import org.apache.spark.sql.DataFrame

/**
 * Postgres/JDBC loader surface (reference internal/io/postgres.go).
 * No POSTGRES driver jar ships in this environment, but the loader
 * semantics the reference defines are database-agnostic and are
 * exercised for real against embedded Derby (on Spark's own
 * classpath) in JdbcDerbySpec — binding order, batching, transaction
 * isolation, bulk write, scan, and a playbook e2e. Only the Postgres
 * wire dialect itself awaits a driver jar:
 *
 *  - COPY-role bulk load -> Spark's JDBC batch writer (postgres.go:266-314)
 *  - custom-SQL per-record load with $1..$N placeholders bound in
 *    ALPHABETICAL order of the record's field names, batched per
 *    transaction by `batchSize` (postgres.go:318-532; placeholder-order
 *    doc playbook_development_guide.md:140,188)
 *  - preload/postload command lists, each in its own transaction
 *    (postgres.go:213-262)
 */
object Jdbc {

  /** Bulk load (the COPY role): Spark JDBC writer with batching. */
  def bulkLoad(df: DataFrame, url: String, table: String,
               batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode("append")
      .save()

  /** Driver-side SQL command list, each command in its own transaction
    * (preload/postload semantics). */
  def runCommands(url: String, commands: Seq[String]): Unit = {
    if (commands.isEmpty) return
    val conn = java.sql.DriverManager.getConnection(url)
    try commands.foreach { sql =>
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try { st.execute(sql); conn.commit() }
      catch { case e: Throwable => conn.rollback(); throw e }
      finally st.close()
    } finally conn.close()
  }

  /**
   * Custom-SQL load: run `command` once per record with $1..$N bound to
   * the record's values in alphabetical field order, `batchSize`
   * records per transaction. Executes on the EXECUTORS (foreachPartition
   * + PreparedStatement batch), one connection per partition.
   */
  def customSqlLoad(df: DataFrame, url: String, command: String,
                    batchSize: Int = 100): Unit = {
    val fields = df.columns.sorted // $1..$N binding order (postgres.go doc)
    val jdbcSql = {
      // $N -> ? with positions recorded so values bind correctly
      val re = "\\$([0-9]+)".r
      val order = re.findAllMatchIn(command).map(_.group(1).toInt).toSeq
      (re.replaceAllIn(command, "?"), order)
    }
    val (sql, positions) = jdbcSql
    val ordered = df.select(fields.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    ordered.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var inBatch = 0
          it.foreach { row =>
            positions.zipWithIndex.foreach { case (dollar, i) =>
              ps.setObject(i + 1, row.get(dollar - 1))
            }
            ps.addBatch()
            inBatch += 1
            if (inBatch >= batchSize) {
              ps.executeBatch(); conn.commit(); inBatch = 0
            }
          }
          if (inBatch > 0) { ps.executeBatch(); conn.commit() }
          ps.close()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }
}
