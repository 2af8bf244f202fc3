package graft.app

/** Minimal HOCON-subset configuration reader.
  *
  * The reference falls back to `application.conf` via typesafe-config when
  * no CLI args are given
  * (/root/reference/src/main/scala/com/example/kafka/CustomerSpendingAnalysis.scala:196-210,
  * /root/reference/src/main/resources/application.conf). That dependency is
  * not resolvable in this zero-egress build, so this reader covers the
  * subset the reference's config file actually uses — nested blocks,
  * `key = value` / `key: value` pairs, quoted or bare values, `#`/`//`
  * comments — flattened to dotted keys (`kafka.bootstrap.servers`).
  */
object AppConfig {

  /** Parse HOCON-subset text into flattened dotted keys. */
  def parse(text: String): Map[String, String] = {
    val out = scala.collection.mutable.Map[String, String]()
    val prefix = scala.collection.mutable.Stack[String]()
    def strip(v: String): String = {
      val t = v.trim
      if (t.length >= 2 && t.head == '"' && t.last == '"') t.substring(1, t.length - 1)
      else t
    }
    val Block = """^([\w.\-]+)\s*\{\s*$""".r
    val Pair = """^([\w.\-]+)\s*[=:]\s*(.+)$""".r
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith("//")) line match {
        case Block(name) => prefix.push(name)
        case "}" => if (prefix.nonEmpty) prefix.pop()
        case Pair(key, value) =>
          out((prefix.toSeq.reverse :+ key).mkString(".")) = strip(value)
        case _ => () // unsupported construct: ignore rather than fail
      }
    }
    out.toMap
  }

  /** Load + parse a classpath resource; None when absent. */
  def fromResource(name: String = "application.conf"): Option[Map[String, String]] = {
    val in = Thread.currentThread().getContextClassLoader.getResourceAsStream(name)
    if (in == null) None
    else try Some(parse(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)))
    finally in.close()
  }
}
