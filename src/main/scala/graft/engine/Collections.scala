package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collection scoping: named multi-account groupings resolved to
  * source-ID sets (reference store schema.sql:374-389, store/collection.go,
  * cmd/msgvault/cmd/account_scope.go:1-130). The resolved scope feeds
  * [[graft.model.MessageFilter.sourceIds]] — which takes precedence over a
  * single `sourceId`, so a collection OVERRIDES single-source scoping
  * exactly as the reference's appendSourceFilter does
  * (source_filter.go:1-37), and an EMPTY collection matches nothing
  * (tri-state `Some(Nil)`), never "everything".
  *
  * Resolution is a driver-side point lookup over the account/collection
  * dimension tables (bounded by the number of configured accounts — the
  * reference does the same as SQLite point queries); the resolver collects
  * them once and answers lookups from maps.
  */
object Collections {

  sealed trait Scope {
    /** Feed straight into MessageFilter/AggregateOptions.sourceIds. */
    def sourceIds: Option[Seq[Long]]
    def displayName: String
  }
  final case class SourceScope(id: Long, identifier: String) extends Scope {
    def sourceIds: Option[Seq[Long]] = Some(Seq(id))
    def displayName: String = identifier
  }
  final case class CollectionScope(name: String, ids: Seq[Long]) extends Scope {
    def sourceIds: Option[Seq[Long]] = Some(ids)
    def displayName: String = name
  }

  final case class Resolver(
      private val srcByKey: Map[String, Seq[(Long, String)]],
      private val collByName: Map[String, Seq[Long]]) {

    /** `--account` semantics (account_scope.go:51-99): resolve a source by
      * identifier or display name; ambiguity and collection names are
      * errors with the reference's hints.
      */
    def resolveAccount(input: String): Either[String, Option[Scope]] =
      if (input.isEmpty) Right(None)
      else srcByKey.getOrElse(input, Nil) match {
        case Seq((id, ident)) => Right(Some(SourceScope(id, ident)))
        case Nil if collByName.contains(input) =>
          Left(s""""$input" is a collection, not an account; use --collection $input""")
        case Nil => Left(s"no account found for \"$input\"")
        case many => Left(
          s"""ambiguous account "$input" matches multiple sources: ${
            many.map { case (id, ident) => s"$ident (id=$id)" }.mkString(", ")}""")
      }

    /** `--collection` semantics (account_scope.go:101-130): resolve a
      * collection by name; account identifiers are errors with a hint.
      */
    def resolveCollection(input: String): Either[String, Option[Scope]] =
      if (input.isEmpty) Right(None)
      else collByName.get(input) match {
        case Some(ids) => Right(Some(CollectionScope(input, ids)))
        case None if srcByKey.contains(input) =>
          Left(s""""$input" is an account, not a collection; use --account $input""")
        case None => Left(s"collection \"$input\" not found")
      }
  }

  /** Build a resolver from the dimension frames: `sources(id, identifier
    * [, display_name])`, `collections(id, name)`,
    * `collection_sources(collection_id, source_id)`.
    */
  def resolver(sources: DataFrame, collections: DataFrame,
      collectionSources: DataFrame): Resolver = {
    val hasDisplay = sources.columns.contains("display_name")
    val srcRows = sources.select(col("id").cast("long"), col("identifier"),
        if (hasDisplay) col("display_name") else lit(null).cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    val srcByKey = srcRows
      .flatMap { case (id, ident, disp) =>
        (Seq(ident) ++ disp.filter(_.nonEmpty)).map(_ -> ((id, ident)))
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct.toSeq }
    val members = collectionSources
      .select(col("collection_id").cast("long"), col("source_id").cast("long"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rows) => cid -> rows.map(_.getLong(1)).sorted.toSeq }
    val collByName = collections
      .select(col("id").cast("long"), col("name")).collect()
      .map(r => r.getString(1) -> members.getOrElse(r.getLong(0), Nil))
      .toMap
    Resolver(srcByKey, collByName)
  }
}
