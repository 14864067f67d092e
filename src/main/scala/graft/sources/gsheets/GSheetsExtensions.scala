package graft.sources.gsheets

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** SQL-text parity with the reference's replacement scan
  * (`src/gsheets_extension.cpp:29-46`): `FROM '<docs.google.com URL>'`
  * works directly in DuckDB; Spark's analog is an injected resolution
  * rule that turns an unresolved relation whose (back-quoted) name is a
  * Sheets URL into the gsheets DSV2 relation.
  *
  * {{{
  *   spark = SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.sources.gsheets.GSheetsExtensions")
  *     .config("spark.gsheets.token", token)     // connector defaults
  *     .getOrCreate()
  *   spark.sql("SELECT * FROM `https://docs.google.com/spreadsheets/d/<id>/edit`")
  * }}}
  *
  * Credentials and connector options come from `spark.gsheets.*` session
  * conf entries (SURVEY §1.4), since bare SQL text carries no options
  * map. The relation is aliased by the URL basename, matching the
  * reference's `ReadSheetReplacement` alias rule
  * (`src/gsheets_extension.cpp:35-45`).
  */
class GSheetsExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectResolutionRule(session => new GSheetsUrlResolution(session))
}

object GSheetsUrlResolution {
  /** The reference's prefix check (`src/gsheets_extension.cpp:31-34`). */
  val UrlPrefix = "https://docs.google.com/spreadsheets/d/"

  /** DuckDB aliases the scan by URL basename minus extension; the
    * equivalent here: last path segment, query/fragment stripped.
    */
  def basename(url: String): String = {
    val noQuery = url.takeWhile(c => c != '?' && c != '#')
    val seg = noQuery.stripSuffix("/").split('/').last
    val dot = seg.lastIndexOf('.')
    if (dot > 0) seg.take(dot) else seg
  }
}

final class GSheetsUrlResolution(session: SparkSession)
  extends Rule[LogicalPlan] {

  import GSheetsUrlResolution._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation
          if !u.isStreaming && u.multipartIdentifier.size == 1 &&
            u.multipartIdentifier.head.startsWith(UrlPrefix) =>
        resolve(u.multipartIdentifier.head, u.options)
    }

  private def resolve(url: String,
      tableOptions: CaseInsensitiveStringMap): LogicalPlan = {
    val confOpts = session.conf.getAll.collect {
      case (k, v) if k.startsWith("spark.gsheets.") =>
        k.stripPrefix("spark.gsheets.") -> v
    }
    val opts = confOpts ++ tableOptions.asScala ++ Map("path" -> url)
    val map = new CaseInsensitiveStringMap(opts.asJava)
    val provider = new GSheetsDataSource
    val schema = provider.inferSchema(map)
    val table = provider.getTable(schema, Array.empty, map.asCaseSensitiveMap())
    SubqueryAlias(basename(url),
      DataSourceV2Relation.create(table, None, None, map))
  }
}
