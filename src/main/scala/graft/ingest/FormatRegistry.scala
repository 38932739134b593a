package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.lit

/** S6 — the ingest-format registry (web.py:20–39: the URL path segment
  * resolves to a format class). Each entry converts a payload
  * DataFrame to the nested snapshot/user shapes; unknown names mirror
  * the reference's 404 path by returning None for the caller to map to
  * an error envelope (api.Api.errorEnvelope).
  */
object FormatRegistry {

  /** A format converts payloads → (submission rows, user rows); either
    * side may be empty. */
  case class Format(
      name: String,
      convert: (DataFrame, String, Column, Column) => FaexportFormats.WebIngestResponse)

  private def submissionsOnly(
      f: (DataFrame, String, Column, Column) => DataFrame)(
      df: DataFrame, payloadCol: String, contributor: Column, at: Column) =
    FaexportFormats.WebIngestResponse(
      f(df, payloadCol, contributor, at),
      df.sparkSession.emptyDataFrame)

  private def usersOnly(
      f: (DataFrame, String, Column, Column) => DataFrame)(
      df: DataFrame, payloadCol: String, contributor: Column, at: Column) =
    FaexportFormats.WebIngestResponse(
      df.sparkSession.emptyDataFrame,
      f(df, payloadCol, contributor, at))

  /** The four web formats of the reference registry (web.py:24–29). */
  val all: Map[String, Format] = Seq(
    Format("submission", submissionsOnly((df, c, contrib, at) =>
      Formats.webSubmission(df, c, contrib, at))),
    Format("user", usersOnly((df, c, contrib, at) =>
      Formats.webUser(df, c, contrib, at))),
    Format("faexport_submission",
      (df, c, contrib, at) => FaexportFormats.faexportSubmission(df, c, contrib, at)),
    Format("faexport_user",
      (df, c, contrib, at) => FaexportFormats.faexportUser(df, c, contrib, at))
  ).map(f => f.name -> f).toMap

  def lookup(name: String): Option[Format] = all.get(name)
}
