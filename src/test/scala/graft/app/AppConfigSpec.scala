package graft.app

import graft.sinks.Sinks
import graft.streaming.SpendingPipeline.{Sink, Source}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's config fallback: args win, else application.conf
  * (kafka bootstrap + jdbc url/user/password) drives the canonical
  * Kafka -> daily spend -> JDBC upsert pipeline. */
class AppConfigSpec extends AnyFunSuite {

  test("HOCON-subset parser flattens nested blocks to dotted keys") {
    val parsed = AppConfig.parse(
      """# comment
        |kafka {
        |  bootstrap.servers = "localhost:9092"
        |}
        |// another comment
        |db {
        |  url: jdbc:postgresql://h:5432/p
        |  user = "u"
        |}
        |top = bare value
        |""".stripMargin)
    assert(parsed == Map(
      "kafka.bootstrap.servers" -> "localhost:9092",
      "db.url" -> "jdbc:postgresql://h:5432/p",
      "db.user" -> "u",
      "top" -> "bare value"))
  }

  test("no args: application.conf resource resolves to Kafka -> JDBC upsert") {
    val (source, sink) = Main.resolve(Nil, AppConfig.fromResource())
    assert(source == Source.Kafka("testhost:9092", Main.FallbackTopic,
      maxOffsetsPerTrigger = Some(100000L)))
    sink match {
      case Sink.JdbcUpsert(Sinks.Jdbc(url, table, user, pass, _), keys) =>
        assert(url == "jdbc:postgresql://testhost:5432/testdb")
        assert(table == Main.FallbackTable)
        assert(user == "testuser" && pass == "testpass")
        assert(keys == Seq("customer_id", "transaction_date"))
      case other => fail(s"expected JdbcUpsert, got $other")
    }
  }

  test("args always win over the config resource") {
    val (source, sink) = Main.resolve(
      Seq("synthetic", "100", "console"), AppConfig.fromResource())
    assert(source == Source.Synthetic(100L))
    assert(sink == Sink.Console())
  }

  test("no args and no config is an explicit error; missing keys are named") {
    val e = intercept[RuntimeException](Main.resolve(Nil, None))
    assert(e.getMessage.contains("application.conf"))
    val e2 = intercept[RuntimeException](
      Main.resolve(Nil, Some(Map("kafka.bootstrap.servers" -> "h:9092"))))
    assert(e2.getMessage.contains("db.url"))
  }
}
