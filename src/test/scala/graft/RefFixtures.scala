package graft

import graft.core.{Config, IndexRule}
import org.apache.spark.sql.SparkSession

/** The reference test fixtures, reproduced byte-for-byte
  * (reference tests/test_cli.py:24-61, tests/test_plugin.py:250-358;
  * see FIXTURES.md).
  */
object RefFixtures {

  /** dogs.db fixture (tests/test_cli.py). */
  def registerDogs(spark: SparkSession): Unit = {
    import spark.implicits._
    Seq(
      (1, "Cleo", "running", 5, "2020-08-22 04:41:33"),
      (2, "Pancakes", "chasing", 4, "2020-08-17 11:35:42")
    ).toDF("id", "name", "likes", "age", "created")
      .createOrReplaceTempView("dogs")
  }

  val dogsYaml: String =
    """
      |dogs.db:
      |    dogs:
      |        sql: |-
      |            select
      |                id as key,
      |                name as title,
      |                created as timestamp,
      |                case name when 'Cleo' then 1 else 2 end as category,
      |                likes as search_1
      |            from dogs
      |""".stripMargin

  def dogsRules: Seq[IndexRule] = Config.parseMetadata(dogsYaml)

  /** emails.db + github.db fixture (tests/test_plugin.py). */
  def registerPlugin(spark: SparkSession): Unit = {
    import spark.implicits._
    Seq(
      ("a5b39c5049b28997528bb0eca52730ab6febabeaba54cfcba0ab5d70e7207523",
        "Another commit to things", "dogsheep/dogsheep-beta", "2020-08-01T00:05:02"),
      ("5becbf70d64951e2910314ef5227d19b11c25b0c9586934941366da8997e57cb",
        "Added some tests", "dogsheep/dogsheep-beta", "2020-08-02T12:35:48")
    ).toDF("sha", "message", "repo_name", "committer_date")
      .createOrReplaceTempView("commits")
    Seq(
      (1, "Hey there #dogfest", "An email about things", "blah@example.com", "2020-08-01T00:05:02"),
      (2, "What's going on", "Another email about things", "blah@example.com", "2020-08-02T00:05:02")
    ).toDF("id", "subject", "body", "from_", "date")
      .createOrReplaceTempView("emails")
  }

  val pluginYaml: String =
    """
      |emails.db:
      |    emails:
      |        display_sql: |-
      |            select * from emails where id = :key
      |        display: |-
      |            <p>Email from {{ display.from_ }}, subject {{ display.subject }}
      |        sql: |-
      |            select
      |                id as key,
      |                subject as title,
      |                date as timestamp,
      |                0 as is_public,
      |                body as search_1
      |            from
      |                emails
      |github.db:
      |    commits:
      |        display_sql: |-
      |            select
      |                commits.sha,
      |                commits.message,
      |                commits.committer_date,
      |                commits.repo_name,
      |                :q as their_query
      |            from commits where sha = :key
      |        display: |-
      |            <p>Commit to {{ display.repo_name }} on {{ display.committer_date }}</p>
      |            <p>{{ display.message }} - {{ display.sha }}</p>
      |            <p>User searched for: "{{ display.their_query }}"</p>
      |        sql: |-
      |            select
      |                sha as key,
      |                'Commit to ' || commits.repo_name as title,
      |                committer_date as timestamp,
      |                1 as category,
      |                1 as is_public,
      |                message as search_1
      |            from
      |                commits
      |""".stripMargin

  def pluginRules: Seq[IndexRule] = Config.parseMetadata(pluginYaml)
}
