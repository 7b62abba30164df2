package graft.tools

/** Scratch runner: dump a handful of SparkEntry queries by name in
  * `Verify`'s layout (result parquet per query + `oracle_sql.json`),
  * so `tools/selfcheck.py <sfdir> <out>` replays the DuckDB compare on
  * JUST those queries while iterating on an oracle.
  * (`runMain graft.tools.QDump <sfdir> <out> <name>[,<name>…]`; not
  * part of the driver contract.)
  */
object QDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, out, namesCsv) = args
    val names = namesCsv.split(",").toSeq
    val spark = ToolSession.local(8)
    names.foreach { q =>
      graft.SparkEntry.queries(q)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$q")
      println(s"[qdump] wrote $out/$q")
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view
      .filterKeys(names.contains).toMap
      .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
