package graft.core

import graft.RefFixtures
import org.scalatest.funsuite.AnyFunSuite

/** Config parsing parity with the reference's `parse_metadata`
  * (reference dogsheep_beta/utils.py:104-112): JSON first, YAML
  * fallback, BadMetadataError otherwise.
  */
class ConfigSpec extends AnyFunSuite {

  test("parses the reference dogs.db YAML fixture") {
    val rules = RefFixtures.dogsRules
    assert(rules.size == 1)
    val r = rules.head
    assert(r.db == "dogs.db" && r.docType == "dogs")
    assert(r.typeTag == "dogs.db/dogs")
    assert(r.sql.contains("case name when 'Cleo' then 1 else 2 end as category"))
    assert(r.sql.trim.startsWith("select"))
  }

  test("parses the reference plugin YAML fixture (2 dbs, display_sql)") {
    val rules = RefFixtures.pluginRules
    assert(rules.map(_.typeTag).toSet ==
      Set("emails.db/emails", "github.db/commits"))
    val commits = rules.find(_.db == "github.db").get
    assert(commits.displaySql.get.contains(":q as their_query"))
    assert(commits.display.get.contains("{{ display.repo_name }}"))
    assert(commits.sql.contains("'Commit to ' || commits.repo_name as title"))
  }

  test("JSON config accepted (tried before YAML, utils.py:106-108)") {
    val rules = Config.parseMetadata(
      """{"db1.db": {"t1": {"sql": "select 1 as key", "display": "<b>x</b>"}}}""")
    assert(rules == Seq(IndexRule("db1.db", "t1", "select 1 as key",
      None, Some("<b>x</b>"))))
  }

  test("invalid document raises BadMetadataError") {
    intercept[BadMetadataError](Config.parseMetadata("] this is { nothing"))
  }

  test("MiniYaml: flow and block sequences parse as Seq values") {
    val m = MiniYaml.parse(
      """plain: value
        |flow: [a, b, 'c, d', [x, y]]
        |empty_flow: []
        |block:
        |  - one
        |  - "two three"
        |  - [i, j]
        |maps:
        |  - name: alpha
        |    sql: select 1
        |  - name: beta
        |nested:
        |  inner:
        |    - deep
        |""".stripMargin)
    assert(m("plain") == "value")
    assert(m("flow") == Seq("a", "b", "c, d", Seq("x", "y")))
    assert(m("empty_flow") == Seq.empty)
    assert(m("block") == Seq("one", "two three", Seq("i", "j")))
    assert(m("maps") == Seq(
      Map("name" -> "alpha", "sql" -> "select 1"),
      Map("name" -> "beta")))
    assert(m("nested").asInstanceOf[Map[String, Any]]("inner") == Seq("deep"))
  }

  test("MiniYaml: anchors, aliases, and merge keys (yaml.safe_load surface)") {
    val m = MiniYaml.parse(
      """base: &defaults
        |    timeout: 30
        |    retries: 2
        |svc:
        |    <<: *defaults
        |    retries: 5
        |copy: *defaults
        |greeting: &g hello
        |again: *g
        |list:
        |    - &first one
        |    - *first
        |    - two
        |flow: [*g, plain]
        |""".stripMargin)
    val base = m("base").asInstanceOf[Map[String, Any]]
    assert(base == Map("timeout" -> "30", "retries" -> "2"))
    // merge supplies defaults; explicit keys win
    assert(m("svc").asInstanceOf[Map[String, Any]] ==
      Map("timeout" -> "30", "retries" -> "5"))
    assert(m("copy") == base)
    assert(m("greeting") == "hello" && m("again") == "hello")
    assert(m("list") == Seq("one", "one", "two"))
    assert(m("flow") == Seq("hello", "plain"))
    // quoted scalars that merely LOOK like anchors/aliases stay literal
    val lit = MiniYaml.parse("a: '&x'\nb: \"*y\"\n")
    assert(lit == Map("a" -> "&x", "b" -> "*y"))
  }

  test("MiniYaml: unknown alias and non-mapping merge fail loudly") {
    intercept[BadMetadataError](MiniYaml.parse("a: *nope\n"))
    intercept[BadMetadataError](
      MiniYaml.parse("x: &s scalar\ny:\n    <<: *s\n"))
  }

  test("list value where a rule mapping is required still raises BadMetadataError") {
    // PyYAML parses this fine; the RULES contract then rejects it — same
    // split as the reference (parse succeeds, schema validation fails)
    intercept[BadMetadataError](Config.parseMetadata(
      """db1.db:
        |  - not
        |  - a
        |  - mapping
        |""".stripMargin))
  }

  test("rule missing sql raises BadMetadataError") {
    intercept[BadMetadataError](
      Config.parseMetadata("""{"d": {"t": {"display": "x"}}}"""))
  }
}
